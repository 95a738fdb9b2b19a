"""The fused per-frame engine step — the whole reference hot loop
(bp.py:21-30: read→infer→sample→filter→spectrum→peaks) after the capture
boundary, as ONE pure jitted function:

    step(params, state, frame_rgb, timestamp) -> (state, StepOutputs)

All signal state (reference SignalStore's seven ring-buffer groups,
signal_processor.py:75-84) lives in a fixed-shape NaN-masked pytree carried
through the step; inference tracking state rides along.  The reference's
``copy.deepcopy(self.store)`` snapshot isolation (signal_processor.py:313)
is free here — functional outputs ARE snapshots.

Multi-stream scaling: ``vmap``/shard the step over a leading stream axis
(parallel/streams.py).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bp_from_video_tpu.config import EngineConfig, ModelType
from bp_from_video_tpu.models import runner as runner_mod
from bp_from_video_tpu.models.runner import InferenceRunner, ModelResults, TrackState
from bp_from_video_tpu.ops import chain, correlate, roi as roi_ops, spectrum
from bp_from_video_tpu.ops import signal as sig

Array = jax.Array


class SignalState(NamedTuple):
    """Device rings (reference SignalStore's stateful groups: sg_roi, sg_raw,
    sg_bpm, sg_ptt; sg_proc/spec/corr are recomputed every frame)."""

    roi_x: Array   # [Nr]
    roi_y: Array   # [S, Nr, 6]
    raw_x: Array   # [N]
    raw_y: Array   # [S, N]
    bpm_x: Array   # [Np]
    bpm_y: Array   # [S, Np]
    ptt_x: Array   # [Np]
    ptt_y: Array   # [P, Np]


class EngineState(NamedTuple):
    signals: SignalState
    track: TrackState


class StepOutputs(NamedTuple):
    """Everything the display/driver layer consumes per frame — the fused
    analog of (InferenceResults, deep-copied SignalStore)."""

    models: ModelResults
    rois: Array          # [S, 6] temporally-filtered integral ROIs
    raw_x: Array         # [N]
    raw_y: Array         # [S, N]
    proc_x: Array        # [S, N]
    proc_y: Array        # [S, N]
    spec_x: Array        # [S, N]
    spec_y: Array        # [S, N]
    corr_x: Array        # [P, 2N-1]
    corr_y: Array        # [P, 2N-1]
    bpm: Array           # [S] rounded means over the peak ring (NaN-safe)
    ptt: Array           # [P]
    curr_fs: Array       # instantaneous fs (from raw ring tail)
    mean_fs: Array       # mean fs of the bpm ring (drawer.py:133)
    proc_range: Array    # [4] joint (min_x, max_x, min_y, max_y) for plots
    spec_range: Array    # [4]
    corr_range: Array    # [4]


class Engine:
    """Builds the fused step for a static EngineConfig.

    Public surface mirrors the reference stages' constructor knobs
    (SignalProcessor signal_processor.py:89-109 + InferenceRunner
    inference_runner.py:58-65) collapsed into one config.
    """

    def __init__(self, config: EngineConfig, asset_dir: str | None = None):
        self.config = config
        self.runner = InferenceRunner(
            config.inference, config.frame_height, config.frame_width,
            asset_dir=asset_dir,
            dtype=jnp.bfloat16 if config.compute_dtype == "bfloat16"
            else jnp.float32)
        self.params = self.runner.params
        self._pairs = list(itertools.combinations(
            range(config.signal.num_signals), 2))

    # -- state ----------------------------------------------------------------

    def init_signal_state(self) -> SignalState:
        c = self.config.signal
        s, p = c.num_signals, max(c.num_pairs, 1)
        nr, n, np_ = c.roi_max_samples, c.signal_max_samples, c.peak_max_samples
        nan = jnp.nan
        return SignalState(
            roi_x=jnp.full((nr,), nan, jnp.float32),
            roi_y=jnp.full((s, nr, 6), nan, jnp.float32),
            raw_x=jnp.full((n,), nan, jnp.float32),
            raw_y=jnp.full((s, n), nan, jnp.float32),
            bpm_x=jnp.full((np_,), nan, jnp.float32),
            bpm_y=jnp.full((s, np_), nan, jnp.float32),
            ptt_x=jnp.full((np_,), nan, jnp.float32),
            ptt_y=jnp.full((p, np_), nan, jnp.float32))

    def init_state(self) -> EngineState:
        return EngineState(self.init_signal_state(), self.runner.init_state())

    # -- the fused step ---------------------------------------------------------

    def step(self, params, state: EngineState, frame_rgb: Array,
             timestamp: Array) -> tuple[EngineState, StepOutputs]:
        # 1. Inference (reference bp.py:24 -> inference_runner.predict).
        track, models = self.runner.predict(params, state.track, frame_rgb)
        # 2-11. Signal processing (reference bp.py:25 -> signal_processor).
        signals, out = self.signal_step(state.signals, models, frame_rgb,
                                        timestamp)
        return EngineState(signals, track), out

    def roi_stage(self, st: SignalState, models: ModelResults,
                  timestamp: Array) -> tuple[Array, Array, Array]:
        """Steps 2-3: ROI geometry + temporal-filter ring (reference
        signal_processor.py:303-305).  Returns (roi_x, roi_y, rois)."""
        cfg = self.config.signal
        by_model = {ModelType.FACE_LANDMARKER: models.face_landmarker,
                    ModelType.HAND_LANDMARKER: models.hand_landmarker}
        rois_now = roi_ops.calc_rois(cfg.roi_configs, by_model)
        # Stale-batch suppression: per-stream timestamps strictly increase
        # (wall clock / POS_FRAMES), so a timestamp equal to the ring tail
        # IS the feeder's latest-wins re-send of an already-pushed frame —
        # the ring must not advance (sig.push_if docstring).
        fresh = jnp.isfinite(timestamp) & (timestamp != st.roi_x[-1])
        roi_x, roi_y = sig.push_if(fresh, st.roi_x,
                                   jnp.swapaxes(st.roi_y, 0, 1),
                                   timestamp, rois_now)
        roi_y = jnp.swapaxes(roi_y, 0, 1)
        rois = jax.vmap(lambda y: sig.masked_mean(y, as_int=True))(roi_y)
        return roi_x, roi_y, rois

    def signal_step(self, st: SignalState, models: ModelResults,
                    frame_rgb: Array, timestamp: Array
                    ) -> tuple[SignalState, StepOutputs]:
        """The DSP half of the step, taking inference results as input — the
        exact analog of reference SignalProcessor.process
        (signal_processor.py:302-313); separable for stage-isolation tests
        and the pipelined driver."""
        cfg = self.config.signal

        # 2-3. ROI geometry + ring (reference signal_processor.py:303-305).
        roi_x, roi_y, rois = self.roi_stage(st, models, timestamp)

        # 4. Pixel sampling (reference :306): segmenter-weighted when the
        # segmenter runs (skin-confidence mask, drawer.py:99's channel 3).
        weights = None
        if self.config.inference.person_segmenter:
            weights = runner_mod.skin_confidence(models.seg_conf)
        samples = roi_ops.sample_rois(frame_rgb, rois, cfg.color_channel,
                                      weights)
        return self.signal_post(st, roi_x, roi_y, rois, models, samples,
                                timestamp)

    def signal_post(self, st: SignalState, roi_x: Array, roi_y: Array,
                    rois: Array, models: ModelResults, samples: Array,
                    timestamp: Array) -> tuple[SignalState, StepOutputs]:
        """Steps 5-11: rings, DSP chain, spectra, correlation, peaks, plot
        ranges — everything after pixel sampling."""
        # 5. Raw ring push (reference :307), gated off for a stale re-send
        # of the frame already at the ring tail (roi_stage comment).
        fresh = jnp.isfinite(timestamp) & (timestamp != st.raw_x[-1])
        raw_x, raw_y = sig.push_if(fresh, st.raw_x,
                                   jnp.swapaxes(st.raw_y, 0, 1),
                                   timestamp, samples)
        raw_y = jnp.swapaxes(raw_y, 0, 1)
        st = SignalState(roi_x, roi_y, raw_x, raw_y,
                         st.bpm_x, st.bpm_y, st.ptt_x, st.ptt_y)
        return self.signal_analyze(st, rois, models, timestamp, fresh)

    def signal_analyze(self, st: SignalState, rois: Array,
                       models: ModelResults, timestamp: Array,
                       fresh: Array) -> tuple[SignalState, StepOutputs]:
        """Steps 6-11 on ALREADY-PUSHED rings: DSP chain, spectra,
        correlation, peak rings, HUD stats, plot ranges.  Split from
        :meth:`signal_post` so the lagged micro-batch step can push F raw
        samples and analyze the window once (batch_step_lagged)."""
        cfg = self.config.signal
        roi_x, roi_y = st.roi_x, st.roi_y
        raw_x, raw_y = st.raw_x, st.raw_y

        # 6. DSP chain (reference :308).
        proc_x, proc_y = jax.vmap(
            lambda y: chain.process_signal(cfg, raw_x, y))(raw_y)

        # 7. Spectra (reference :309).
        spec_x, spec_y = jax.vmap(
            lambda x, y: spectrum.transform_signal(cfg, x, y))(proc_x, proc_y)

        # 8. BPM peaks -> ring (reference :310). NOTE: the peak window is the
        # spectrum's auto data range, not [min_freq, max_freq] — the
        # SignalGroup constructor clobbers set_range (see sig.peak_auto).
        bpm_now = jax.vmap(
            lambda x, y: sig.peak_auto(x, y)[0] * 60.0)(spec_x, spec_y)
        bpm_x, bpm_y = sig.push_if(fresh, st.bpm_x,
                                   jnp.swapaxes(st.bpm_y, 0, 1),
                                   timestamp, bpm_now)
        bpm_y = jnp.swapaxes(bpm_y, 0, 1)

        # 9. Pairwise correlation -> PTT ring (reference :311-312).
        n = cfg.signal_max_samples
        p_cnt = max(cfg.num_pairs, 1)
        if self._pairs:
            corr_out = [correlate.correlate_pair(proc_x[a], proc_y[a], proc_y[b])
                        for a, b in self._pairs]
            corr_x = jnp.stack([c[0] for c in corr_out])
            corr_y = jnp.stack([c[1] for c in corr_out])
            # Same auto-range quirk as BPM: all lags, not [min_lag, max_lag].
            ptt_now = jax.vmap(
                lambda x, y: sig.peak_auto(x, y)[0] * 1000.0)(corr_x, corr_y)
        else:
            corr_x = jnp.full((p_cnt, 2 * n - 1), jnp.nan, jnp.float32)
            corr_y = jnp.full((p_cnt, 2 * n - 1), jnp.nan, jnp.float32)
            ptt_now = jnp.full((p_cnt,), jnp.nan, jnp.float32)
        ptt_x, ptt_y = sig.push_if(fresh, st.ptt_x,
                                   jnp.swapaxes(st.ptt_y, 0, 1),
                                   timestamp, ptt_now)
        ptt_y = jnp.swapaxes(ptt_y, 0, 1)

        # 10. HUD statistics (reference drawer.py:127-150 consumes these).
        bpm_mean = jax.vmap(lambda y: sig.masked_mean(y, as_int=True))(bpm_y)
        ptt_mean = jax.vmap(lambda y: sig.masked_mean(y, as_int=True))(ptt_y)
        mean_fs = sig.mean_fs(bpm_x)
        dx = raw_x[-1] - raw_x[-2]
        curr_fs = 1.0 / dx

        # 11. Plot ranges (reference drawer.py:233-235 via group ranges).
        def group_rng(xs, ys):
            prs = [sig.auto_range(xs[i], ys[i]) for i in range(xs.shape[0])]
            lo_x, hi_x = sig.group_range(jnp.stack([p[0] for p in prs]),
                                         jnp.stack([p[1] for p in prs]))
            lo_y, hi_y = sig.group_range(jnp.stack([p[2] for p in prs]),
                                         jnp.stack([p[3] for p in prs]))
            return jnp.stack([lo_x, hi_x, lo_y, hi_y])

        # All three plot ranges are auto data ranges — the group constructor
        # clobbers the per-signal set_range calls (see sig.peak_auto).
        proc_range = group_rng(proc_x, proc_y)
        spec_range = group_rng(spec_x, spec_y)
        corr_range = group_rng(corr_x, corr_y)

        new_signals = SignalState(roi_x, roi_y, raw_x, raw_y,
                                  bpm_x, bpm_y, ptt_x, ptt_y)
        out = StepOutputs(models, rois, raw_x, raw_y, proc_x, proc_y,
                          spec_x, spec_y, corr_x, corr_y,
                          bpm_mean, ptt_mean, curr_fs, mean_fs,
                          proc_range, spec_range, corr_range)
        return new_signals, out

    def batch_step(self, params, state: EngineState, frames_rgb: Array,
                   timestamps: Array) -> tuple[EngineState, StepOutputs]:
        """Stream-batched step with detectors gated at BATCH level.

        Equivalent to ``vmap(step)`` over a leading stream axis, except the
        face/palm detectors sit behind one scalar ``lax.cond`` over
        ``all(tracking)`` (runner.predict_batch): a per-stream cond under
        vmap lowers to select and runs both branches every frame, losing
        MediaPipe VIDEO mode's detect-once-then-track saving — the batch
        gate restores it (detectors are fully skipped in steady state)."""
        track, models = self.runner.predict_batch(params, state.track,
                                                  frames_rgb)
        # ROI geometry per stream, then sampling at BATCH level (the Pallas
        # reduce kernel when enabled: one VMEM frame pass for all ROIs).
        roi_x, roi_y, rois = jax.vmap(self.roi_stage)(state.signals, models,
                                                      timestamps)
        weights = None
        if self.config.inference.person_segmenter:
            weights = runner_mod.skin_confidence(models.seg_conf)
        samples = roi_ops.sample_rois_batch(
            frames_rgb, rois, self.config.signal.color_channel, weights,
            use_pallas=self.config.inference.use_pallas,
            interpret=self.config.inference.pallas_interpret)
        signals, out = jax.vmap(self.signal_post)(
            state.signals, roi_x, roi_y, rois, models, samples, timestamps)
        return EngineState(signals, track), out

    def batch_step_lagged(self, params, state: EngineState,
                          frames_rgb: Array, timestamps: Array
                          ) -> tuple[EngineState, StepOutputs]:
        """Lagged-rect temporal micro-batch: F frames per stream in ONE
        dispatch (frames [F, S, ...], timestamps [F, S]).

        The multistream wall at small S is per-frame fixed cost, not net
        FLOPs (round-5 ablation: nets are ~batch-insensitive per stream,
        the non-net floor is ~4x worse per stream at S=8 than S=64).
        This operating point amortizes it: all F frames are cropped with
        the tracking rects from BEFORE the window (MediaPipe VIDEO mode
        already crops frame t with the rect from t-1; here the lag grows
        to at most F), the nets run once at batch F*S, F raw samples are
        pushed into the rings, and the window analysis (DSP -> spectra ->
        correlation -> peak rings) runs ONCE per step — so displayed
        vitals update every F frames instead of every frame, a documented
        fidelity-vs-throughput trade swept like hybrid rotation was.
        Tracking state advances from the LAST frame; a stream that loses
        tracking re-acquires with up to F frames of extra latency."""
        f_n, s_n = timestamps.shape
        flat = frames_rgb.reshape((f_n * s_n,) + frames_rgb.shape[2:])
        tiled = jax.tree.map(
            lambda a: jnp.tile(a, (f_n,) + (1,) * (a.ndim - 1)),
            state.track)
        track_flat, models_flat = self.runner.predict_batch(params, tiled,
                                                            flat)
        new_track = jax.tree.map(lambda a: a[(f_n - 1) * s_n:], track_flat)
        models_f = jax.tree.map(
            lambda a: a.reshape((f_n, s_n) + a.shape[1:]), models_flat)

        weights_f = None
        if self.config.inference.person_segmenter:
            weights_f = jax.tree.map(
                lambda a: a.reshape((f_n, s_n) + a.shape[1:]),
                runner_mod.skin_confidence(models_flat.seg_conf))

        def push_one(sig_st, inp):
            models_1, frames_1, ts_1, w_1 = inp
            if not self.config.inference.person_segmenter:
                w_1 = None
            roi_x, roi_y, rois = jax.vmap(self.roi_stage)(sig_st, models_1,
                                                          ts_1)
            samples = roi_ops.sample_rois_batch(
                frames_1, rois, self.config.signal.color_channel, w_1,
                use_pallas=self.config.inference.use_pallas,
                interpret=self.config.inference.pallas_interpret)

            def raw_push(st1, roi_x1, roi_y1, samples1, ts1):
                fresh = jnp.isfinite(ts1) & (ts1 != st1.raw_x[-1])
                raw_x, raw_y = sig.push_if(fresh, st1.raw_x,
                                           jnp.swapaxes(st1.raw_y, 0, 1),
                                           ts1, samples1)
                return SignalState(roi_x1, roi_y1, raw_x,
                                   jnp.swapaxes(raw_y, 0, 1),
                                   st1.bpm_x, st1.bpm_y,
                                   st1.ptt_x, st1.ptt_y)
            sig_st = jax.vmap(raw_push)(sig_st, roi_x, roi_y, samples,
                                        ts_1)
            return sig_st, rois

        wf = (weights_f if weights_f is not None
              else jnp.zeros((f_n,), jnp.float32))
        sig_st, rois_hist = jax.lax.scan(
            push_one, state.signals,
            (models_f, frames_rgb, timestamps, wf))

        ts_last = timestamps[-1]
        models_last = jax.tree.map(lambda a: a[-1], models_f)
        fresh_last = jnp.isfinite(ts_last) & jax.vmap(
            lambda st1, t1: t1 != st1.bpm_x[-1])(sig_st, ts_last)
        signals, out = jax.vmap(self.signal_analyze)(
            sig_st, rois_hist[-1], models_last, ts_last, fresh_last)
        return EngineState(signals, new_track), out

    def jit_step(self):
        return jax.jit(self.step)
