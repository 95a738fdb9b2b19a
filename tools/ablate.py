"""Ablation timing of the fused step (dev tool): bench.py's scan-with-state
measurement methodology, with components knocked out, to attribute the frame
budget.  (Looping on fixed inputs is useless here — the axon runtime dedupes
identical executions; every variant below carries state through a scan so
inputs vary per step, exactly like bench.py.)

Usage:  python tools/ablate.py [variant ...]
Variants: full infer signal dsp spectrum corr nets crops
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _asset_dir, _enable_compile_cache


def net_batch(eng, ms, key, x):
    """One landmark net over a batch of crops EXACTLY as predict_batch
    runs it: fused Pallas stem+trunk when configured, else the
    batch_flexible compiled graph, else vmapped batch-1 calls.  (The old
    vmapped-batch-1-always harness both crashed the PALLAS_BN chain at
    small S and mis-attributed — it never priced the production path.)

    x: packed crops [..., 4C, sz/2, sz/2] when the runner takes packed
    inputs for ``key``, else [..., 3, sz, sz]; leading dims collapse."""
    import jax
    import jax.numpy as jnp
    r = eng.runner
    if r._use_fused_stem(key):
        stems = r._fused_stem_batch(key, ms.params[key], x)
        return r._fused_trunk_batch(key, ms.params[key], stems)
    flat = x.reshape((-1,) + x.shape[-3:])
    if key + "_batch" in r._fns:
        lm, pres, _ = r._fns[key + "_batch"](ms.params[key], flat)
    else:
        lm, pres, _ = jax.vmap(
            lambda xx: r._fns[key](ms.params[key], xx[None]))(flat)
    # Callers only reduce these (jnp.mean) — exact shapes don't matter.
    return lm, pres


def scan_time(label, step, carry0, clip_len, streams, reps=3):
    """Time `jax.lax.scan(step, carry0, arange)` like bench.py does."""
    @jax.jit
    def run(carry, i0):
        return jax.lax.scan(step, carry,
                            i0 + jnp.arange(clip_len, dtype=jnp.float32))

    carry, _ = run(carry0, jnp.float32(0.0))
    jax.block_until_ready(carry)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        carry, out = run(carry, jnp.float32((r + 1) * clip_len))
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per_frame = best / (clip_len * streams)
    print(f"{label:28s} {best*1e3/clip_len:8.3f} ms/step "
          f"{1.0/per_frame:10,.0f} fps", flush=True)
    return best


def main():
    if os.environ.get("BENCH_PLATFORM"):
        # CPU smoke runs: the sitecustomize pins jax_platforms to the
        # remote TPU at interpreter start; an explicit update wins
        # (same contract as bench.py).
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    else:
        from bp_from_video_tpu.utils.tunnel import wait_for_tpu
        if not wait_for_tpu():
            print("ablate: remote-TPU tunnel unreachable "
                  "(set BENCH_PLATFORM=cpu for a CPU smoke run)",
                  file=sys.stderr, flush=True)
            sys.exit(3)
    _enable_compile_cache()
    if jax.default_backend() == "tpu":
        # Honest timing requires the sync-dispatch latch (utils/axon.py):
        # the axon client's initial fast path fakes block_until_ready.
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        print(f"ablate: sync-dispatch latch took "
              f"{force_sync_dispatch():.1f} s", file=sys.stderr, flush=True)
    from bp_from_video_tpu.config import EngineConfig, InferenceConfig
    from bp_from_video_tpu.models.runner import TrackState
    from bp_from_video_tpu.parallel import MultiStreamEngine
    from bp_from_video_tpu.runtime.engine import EngineState

    variants = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "full", "infer", "feed", "crops", "signal", "dsp", "spectrum",
        "corr"]

    streams = int(os.environ.get("BENCH_STREAMS", "64"))
    clip_len = int(os.environ.get("BENCH_CLIP", "16"))
    h, w = (int(x) for x in
            os.environ.get("ABL_HW", "480,640").split(","))
    dt = 1.0 / 30.0
    on_tpu = jax.default_backend() == "tpu"
    preset = os.environ.get("ABL_PRESET") or None
    cfg = EngineConfig(frame_height=h, frame_width=w, num_streams=streams,
                       compute_dtype="bfloat16",
                       inference=InferenceConfig(
                           use_pallas=on_tpu,
                           fuse_dw_pw=bool(int(os.environ.get("BENCH_FUSE", "0"))),
                           pack_s2d=int(os.environ.get("BENCH_S2D", "0")),
                           fused_stem=on_tpu and bool(int(
                               os.environ.get("BENCH_FSTEM", os.environ.get("BENCH_FTRUNK", "1")))),
                           fused_trunk=on_tpu and bool(int(
                               os.environ.get("BENCH_FTRUNK", "1"))),
                           fused_bn_min_hw=int(
                               os.environ.get("BENCH_BN_MINHW", "96"))))
    if preset:
        # Ablate one of the BASELINE preset configurations instead of the
        # flagship (ABL_PRESET=segmenter_fir etc.; same construction as
        # bench.py BENCH_ALL so compiles hit the same cache entries).
        from bench import build_config
        cfg, _ = build_config(preset, streams, h, w, on_tpu)
    ms = MultiStreamEngine(cfg, asset_dir=_asset_dir())
    eng = ms.engine

    n_buf = 4
    frame_buf = jax.jit(lambda k: jax.random.randint(
        k, (n_buf, streams, 3, h, w), 0, 256, jnp.uint8))(jax.random.key(7))

    def frames_at(i):
        return jax.lax.dynamic_index_in_dim(
            frame_buf, jnp.mod(i.astype(jnp.int32), n_buf), keepdims=False)

    def hold_tracking(tr):
        return tr._replace(face_tracking=jnp.ones_like(tr.face_tracking),
                           hand_tracking=jnp.ones_like(tr.hand_tracking))

    state0 = ms.init_states()

    # Fixed model results for signal-only variants (shapes from one predict).
    _, models0 = jax.jit(eng.runner.predict_batch)(
        ms.params, hold_tracking(state0.track), frames_at(jnp.float32(0)))
    jax.block_until_ready(models0)

    for v in variants:
        if v.startswith("seg") and "seg_size" not in eng.runner._fns:
            print(f"{v}: segmenter not in config (use ABL_PRESET=segmenter_fir)")
            continue

        if v == "full":
            def step(carry, i):
                st = carry
                ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
                st2, out = eng.batch_step(
                    ms.params, EngineState(st.signals,
                                           hold_tracking(st.track)),
                    frames_at(i), ts)
                return st2, out.bpm
            scan_time("full step", step, state0, clip_len, streams)

        elif v == "render":
            # Full step + the on-device display rasterization bench.py's
            # multistream preset times (overlay compose + 3-graph plot per
            # stream); diff vs 'full' attributes the render cost.
            from bp_from_video_tpu.render.drawer import Drawer
            drawer = Drawer(cfg, show=False)

            def step(carry, i):
                st = carry
                ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
                frames = frames_at(i)
                st2, out = eng.batch_step(
                    ms.params, EngineState(st.signals,
                                           hold_tracking(st.track)),
                    frames, ts)
                nhwc = jnp.transpose(frames, (0, 2, 3, 1))
                fimg, pimg, packed = jax.vmap(drawer._compose_fn)(nhwc, out)
                extra = (jnp.sum(fimg, dtype=jnp.float32)
                         + jnp.sum(pimg, dtype=jnp.float32)
                         + jnp.sum(jnp.nan_to_num(packed)))
                return st2, out.bpm + 0.0 * extra
            scan_time("full step + render", step, state0, clip_len, streams)

        elif v == "rendcols":
            # Plot cost split: per-trace column interpolation only
            # (_trace_cols: compact sorts + searchsorted + gathers), no
            # [H, W] stroke build, no composite.  rendcols ≈ rendplot ⇒ the
            # cost is the column math; rendcols ≈ full ⇒ it's the raster.
            from bp_from_video_tpu.render import plotter

            def cols_only(out1):
                acc = jnp.float32(0.0)
                groups = [(out1.proc_x, out1.proc_y, out1.proc_range),
                          (out1.spec_x, out1.spec_y, out1.spec_range),
                          (out1.corr_x, out1.corr_y, out1.corr_range)]
                for gl, (xs, ys, rng4) in zip(
                        plotter.graph_layouts(cfg.draw), groups):
                    mnx, mxx, _, _ = plotter._resolve_range(
                        rng4, cfg.draw.graph_default_range)
                    for s in range(xs.shape[0]):
                        vals, ok = plotter._trace_cols(xs[s], ys[s], mnx,
                                                       mxx, gl.width)
                        acc += (jnp.nansum(vals)
                                + jnp.sum(ok.astype(jnp.float32)))
                return acc

            def step(carry, i):
                st = carry
                ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
                st2, out = eng.batch_step(
                    ms.params, EngineState(st.signals,
                                           hold_tracking(st.track)),
                    frames_at(i), ts)
                extra = jnp.sum(jax.vmap(cols_only)(out))
                return st2, out.bpm + 0.0 * extra
            scan_time("full step + rendcols", step, state0, clip_len,
                      streams)

        elif v in ("rendover", "rendplot"):
            # Split the render cost: overlay compose only ('rendover') vs
            # 3-graph plot rasterization only ('rendplot'), each per stream
            # on top of the full step — diff vs 'full' attributes each half.
            from bp_from_video_tpu.render import overlay, plotter
            from bp_from_video_tpu.render.drawer import Drawer
            drawer = Drawer(cfg, show=False)

            def compose_overlay_only(nhwc1, out1):
                seg = None
                if cfg.inference.person_segmenter:
                    from bp_from_video_tpu.models.runner import skin_confidence
                    seg = skin_confidence(out1.models.seg_conf)
                layers = [(out1.models.face_landmarker.bbox,
                           out1.models.face_landmarker.points, (0, 255, 0)),
                          (out1.models.hand_landmarker.bbox,
                           out1.models.hand_landmarker.points, (255, 0, 0))]
                return overlay.compose_overlay(nhwc1, layers, out1.rois,
                                               drawer.sig_colors, seg, 0.75)

            def compose_plot_only(out1):
                groups = [(out1.proc_x, out1.proc_y, out1.proc_range),
                          (out1.spec_x, out1.spec_y, out1.spec_range),
                          (out1.corr_x, out1.corr_y, out1.corr_range)]
                img, _ = plotter.rasterize_plots(cfg.draw, groups,
                                                 drawer.sig_colors)
                return img

            which = v

            def step(carry, i):
                st = carry
                ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
                frames = frames_at(i)
                st2, out = eng.batch_step(
                    ms.params, EngineState(st.signals,
                                           hold_tracking(st.track)),
                    frames, ts)
                if which == "rendover":
                    nhwc = jnp.transpose(frames, (0, 2, 3, 1))
                    img = jax.vmap(compose_overlay_only)(nhwc, out)
                else:
                    img = jax.vmap(compose_plot_only)(out)
                extra = jnp.sum(img, dtype=jnp.float32)
                return st2, out.bpm + 0.0 * extra
            scan_time(f"full step + {which}", step, state0, clip_len,
                      streams)

        elif v == "rendnotext":
            # The FULL compose (overlay + plots + HUD pack) with
            # device_text OFF: diff vs 'render' isolates the on-device
            # glyph text's true in-context cost (subtracting rendover +
            # rendplot from 'render' over-attributes — fusion interactions
            # and the packed HUD block land in the residual).
            import dataclasses as _dc

            from bp_from_video_tpu.render.drawer import Drawer
            cfg_nt = _dc.replace(cfg, draw=_dc.replace(
                cfg.draw, device_text=False))
            drawer = Drawer(cfg_nt, show=False)

            def step(carry, i):
                st = carry
                ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
                frames = frames_at(i)
                st2, out = eng.batch_step(
                    ms.params, EngineState(st.signals,
                                           hold_tracking(st.track)),
                    frames, ts)
                nhwc = jnp.transpose(frames, (0, 2, 3, 1))
                fimg, pimg, packed = jax.vmap(drawer._compose_fn)(nhwc, out)
                extra = (jnp.sum(fimg, dtype=jnp.float32)
                         + jnp.sum(pimg, dtype=jnp.float32)
                         + jnp.sum(jnp.nan_to_num(packed)))
                return st2, out.bpm + 0.0 * extra
            scan_time("full step + render(no text)", step, state0,
                      clip_len, streams)

        elif v == "infer":
            def step(carry, i):
                track = carry
                track2, models = eng.runner.predict_batch(
                    ms.params, hold_tracking(track), frames_at(i))
                # consume a small summary so nothing is DCE'd
                summary = (jnp.nansum(models.face_landmarker.points)
                           + jnp.nansum(models.hand_landmarker.points))
                return track2, summary
            scan_time("inference only", step, state0.track, clip_len, streams)

        elif v == "nonet":
            # Full step with the landmark NETS stubbed out (crop mean ->
            # landmark grid): everything else — crops, gating, ROI, DSP,
            # spectra, correlation, scan glue — runs in context.  The
            # difference to 'full' is the nets' true in-context cost; the
            # absolute value is the step's non-net floor.
            saved = {k: eng.runner._fns[k] for k in ("flm_lm", "hand_lm")
                     if k in eng.runner._fns}
            # The fused-stem/trunk path bypasses _fns[key] entirely —
            # force it off so the stubs actually replace the nets
            # (otherwise 'nonet' silently re-times the full step).
            saved_fused = eng.runner._use_fused_stem
            eng.runner._use_fused_stem = lambda key: False

            def stub(nl):
                def f(p, x):
                    m = jnp.mean(x.astype(jnp.float32))
                    lm = (jnp.ones((1, 3 * nl), jnp.float32) * (m + 100.0))
                    return lm, jax.nn.sigmoid(m)[None, None] * 0 + 0.9, m[None, None]
                return f
            eng.runner._fns["flm_lm"] = stub(478)
            eng.runner._fns["hand_lm"] = stub(21)

            def step(carry, i):
                st = carry
                ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
                st2, out = eng.batch_step(
                    ms.params, EngineState(st.signals,
                                           hold_tracking(st.track)),
                    frames_at(i), ts)
                return st2, out.bpm
            scan_time("full step, nets stubbed", step, state0, clip_len,
                      streams)
            eng.runner._fns.update(saved)
            eng.runner._use_fused_stem = saved_fused

        elif v == "signal":
            def step(carry, i):
                signals = carry
                ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
                # signal_step is the single-stream API: NHWC frames.
                nhwc = jnp.transpose(frames_at(i), (0, 2, 3, 1))
                signals2, out = jax.vmap(eng.signal_step)(
                    signals, models0, nhwc, ts)
                return signals2, out.bpm
            scan_time("signal path only", step, state0.signals, clip_len,
                      streams)

        elif v == "dsp":
            # Samples are synthesized from the ring tail (NOT from the frame
            # buffer): feeding frames_at(i) here charged a full-frame pass to
            # the DSP label and misattributed ~3 ms of frame traffic to a
            # ~0.05 ms chain (round-2 finding; see the 'feed' variant for the
            # frame-ring tax itself).
            from bp_from_video_tpu.ops import chain, signal as sig
            def step(carry, i):
                raw_x, raw_y = carry  # [N], [S, ns, N]
                ts = (i + 1.0) * dt
                new = jnp.tanh(jnp.nan_to_num(raw_y[..., -1]) * 0.9) + ts
                raw_x2 = jnp.concatenate([raw_x[1:], ts[None]])
                raw_y2 = jnp.concatenate([raw_y[..., 1:], new[..., None]],
                                         axis=-1)
                proc = jax.vmap(jax.vmap(
                    lambda y: chain.process_signal(cfg.signal, raw_x2, y)))(
                        raw_y2)
                return (raw_x2, raw_y2), jnp.nansum(proc[1])
            n = cfg.signal.signal_max_samples
            ns = cfg.signal.num_signals
            carry0 = (jnp.full((n,), jnp.nan, jnp.float32),
                      jnp.full((streams, ns, n), jnp.nan, jnp.float32))
            scan_time("dsp chain only", step, carry0, clip_len, streams)

        elif v == "dspm":
            # Per-METHOD chain attribution: the 'dsp' harness with the
            # preset's processing chain replaced by ABL_METHODS (comma
            # list of SignalProcessingMethod values, e.g.
            # ABL_METHODS=interp_cubic,filter_fir; empty = ring carry
            # floor).  Same synthesized-ring scan, so numbers are
            # directly comparable to the 'dsp' row.
            import dataclasses
            from bp_from_video_tpu.config import SignalProcessingMethod
            from bp_from_video_tpu.ops import chain
            names = [m for m in os.environ.get("ABL_METHODS", "").split(",")
                     if m]
            scfg = dataclasses.replace(
                cfg.signal, processing_methods=tuple(
                    SignalProcessingMethod(m) for m in names))
            def step(carry, i):
                raw_x, raw_y = carry  # [N], [S, ns, N]
                ts = (i + 1.0) * dt
                new = jnp.tanh(jnp.nan_to_num(raw_y[..., -1]) * 0.9) + ts
                raw_x2 = jnp.concatenate([raw_x[1:], ts[None]])
                raw_y2 = jnp.concatenate([raw_y[..., 1:], new[..., None]],
                                         axis=-1)
                proc = jax.vmap(jax.vmap(
                    lambda y: chain.process_signal(scfg, raw_x2, y)))(
                        raw_y2)
                return (raw_x2, raw_y2), jnp.nansum(proc[1])
            n = cfg.signal.signal_max_samples
            ns = cfg.signal.num_signals
            carry0 = (jnp.full((n,), jnp.nan, jnp.float32),
                      jnp.full((streams, ns, n), jnp.nan, jnp.float32))
            scan_time(f"dsp[{','.join(names) or 'none'}]", step, carry0,
                      clip_len, streams)

        elif v == "feed":
            # The frame-ring tax by itself: dynamic-index one [S, 3, H, W]
            # uint8 frame out of the rotating buffer and reduce it — the
            # per-step frame-feed + one full u8 read that every
            # frame-consuming variant above pays implicitly.
            def step(carry, i):
                f = frames_at(i)
                return carry + 1e-12 * jnp.sum(f, dtype=jnp.float32), carry
            scan_time("frame feed + 1 full read", step, jnp.float32(0.0),
                      clip_len, streams)

        elif v == "spectrum":
            from bp_from_video_tpu.ops import spectrum as spec
            def step(carry, i):
                raw_x, raw_y = carry
                ts = (i + 1.0) * dt
                # Synthetic feed — see the 'dsp' variant comment.
                new = jnp.tanh(jnp.nan_to_num(raw_y[..., -1]) * 0.9) + ts
                raw_x2 = jnp.concatenate([raw_x[1:], ts[None]])
                raw_y2 = jnp.concatenate([raw_y[..., 1:], new[..., None]],
                                         axis=-1)
                sp = jax.vmap(jax.vmap(
                    lambda y: spec.transform_signal(cfg.signal, raw_x2, y)))(
                        raw_y2)
                return (raw_x2, raw_y2), jnp.nansum(sp[1])
            n = cfg.signal.signal_max_samples
            ns = cfg.signal.num_signals
            carry0 = (jnp.full((n,), jnp.nan, jnp.float32),
                      jnp.full((streams, ns, n), jnp.nan, jnp.float32))
            scan_time("spectrum only", step, carry0, clip_len, streams)

        elif v == "corr":
            from bp_from_video_tpu.ops import correlate
            def step(carry, i):
                raw_x, raw_y = carry
                ts = (i + 1.0) * dt
                # Synthetic feed — see the 'dsp' variant comment.
                new = jnp.tanh(jnp.nan_to_num(raw_y[..., -1]) * 0.9) + ts
                raw_x2 = jnp.concatenate([raw_x[1:], ts[None]])
                raw_y2 = jnp.concatenate([raw_y[..., 1:], new[..., None]],
                                         axis=-1)
                co = jax.vmap(
                    lambda x, ys: correlate.correlate_pair(x, ys[0], ys[1]),
                    in_axes=(None, 0))(raw_x2, raw_y2)
                return (raw_x2, raw_y2), jnp.nansum(co[1])
            n = cfg.signal.signal_max_samples
            carry0 = (jnp.full((n,), jnp.nan, jnp.float32),
                      jnp.full((streams, 2, n), jnp.nan, jnp.float32))
            scan_time("correlation only", step, carry0, clip_len, streams)

        elif v == "flm":
            def step(carry, i):
                x256 = carry
                lm, pres = net_batch(eng, ms, "flm_lm", x256)
                x256_2 = x256 + 0.001 * jnp.mean(lm).astype(x256.dtype)
                return x256_2, jnp.mean(lm)
            shape = ((streams, 12, 128, 128)
                     if eng.runner._packed_in.get("flm_lm")
                     else (streams, 3, 256, 256))
            carry0 = jnp.zeros(shape, jnp.bfloat16)
            scan_time("face mesh net only", step, carry0, clip_len, streams)

        elif v == "hand":
            def step(carry, i):
                x224 = carry
                hl, hp = net_batch(eng, ms, "hand_lm", x224)
                x224_2 = x224 + 0.001 * jnp.mean(hl).astype(x224.dtype)
                return x224_2, jnp.mean(hl)
            shape = ((streams, 2, 12, 112, 112)
                     if eng.runner._packed_in.get("hand_lm")
                     else (streams, 2, 3, 224, 224))
            carry0 = jnp.zeros(shape, jnp.bfloat16)
            scan_time("hand nets only (2/stream)", step, carry0, clip_len,
                      streams)

        elif v == "nets":
            # Landmark nets on pre-cropped inputs, varying via carry.
            def step(carry, i):
                x256, x224 = carry
                lm, pres = net_batch(eng, ms, "flm_lm", x256)
                hl, hp = net_batch(eng, ms, "hand_lm", x224)
                x256_2 = x256 + 0.001 * jnp.mean(lm).astype(x256.dtype)
                x224_2 = x224 + 0.001 * jnp.mean(hl).astype(x224.dtype)
                return (x256_2, x224_2), (jnp.mean(lm) + jnp.mean(hl))
            fshape = ((streams, 12, 128, 128)
                      if eng.runner._packed_in.get("flm_lm")
                      else (streams, 3, 256, 256))
            hshape = ((streams, 2, 12, 112, 112)
                      if eng.runner._packed_in.get("hand_lm")
                      else (streams, 2, 3, 224, 224))
            carry0 = (jnp.zeros(fshape, jnp.bfloat16),
                      jnp.zeros(hshape, jnp.bfloat16))
            scan_time("landmark nets only", step, carry0, clip_len, streams)

        elif v == "crops":
            from bp_from_video_tpu.pallas import warp_kernel
            def step(carry, i):
                shift = carry
                rects = jnp.tile(jnp.asarray(
                    [[[320.0, 240.0, 200.0, 200.0]] * 3], jnp.float32),
                    (streams, 1, 1)) + shift
                planar = frames_at(i)  # frame_buf is already [S, 3, H, W]
                packs = tuple(2 if eng.runner._packed_in.get(k) else 1
                              for k in ("flm_lm", "hand_lm", "hand_lm"))
                outs = warp_kernel.multi_crop(planar, rects, (256, 224, 224),
                                              dtype=jnp.bfloat16, pack=packs)
                return shift + 0.1, sum(jnp.mean(o) for o in outs)
            scan_time("pallas crops only", step, jnp.float32(0.0), clip_len,
                      streams)

        elif v == "noseg":
            # Full step with the segmenter knocked out of the config (and
            # with it the weighted-sampling path) — diff vs 'full' under
            # ABL_PRESET=segmenter_fir attributes the segmenter's true
            # in-context cost.
            import dataclasses as dc
            cfg2 = dc.replace(cfg, inference=dc.replace(
                cfg.inference, person_segmenter=False))
            ms2 = MultiStreamEngine(cfg2, asset_dir=_asset_dir())
            st0 = ms2.init_states()

            def step(carry, i):
                st = carry
                ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
                st2, out = ms2.engine.batch_step(
                    ms2.params, EngineState(st.signals,
                                            hold_tracking(st.track)),
                    frames_at(i), ts)
                return st2, out.bpm
            scan_time("full, segmenter off", step, st0, clip_len, streams)

        elif v in ("rot_cover", "rot_shear", "rot_exact"):
            # Full step under each landmark-crop rotation strategy
            # (config.rotation_mode).  cover keeps the Pallas multi-crop
            # kernel; shear/exact fall back to the vmapped per-stream crop
            # path (shear = cover resample + 3 FFT shears, exact = affine
            # gather) — diff vs 'full' prices rotated-view fidelity.
            import dataclasses as dc
            mode = v.split("_", 1)[1]
            cfg2 = dc.replace(cfg, inference=dc.replace(
                cfg.inference, rotation_mode=mode))
            ms2 = MultiStreamEngine(cfg2, asset_dir=_asset_dir())
            st0 = ms2.init_states()

            def step(carry, i):
                st = carry
                ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
                st2, out = ms2.engine.batch_step(
                    ms2.params, EngineState(st.signals,
                                            hold_tracking(st.track)),
                    frames_at(i), ts)
                return st2, out.bpm
            scan_time(f"full, rotation={mode}", step, st0, clip_len,
                      streams)

        elif v == "segnet":
            # Segmenter net alone at model resolution (no frame resize, no
            # full-res upsample) — carry-varied inputs.
            size = eng.runner._fns["seg_size"]

            def step(carry, i):
                x = carry
                conf = jax.vmap(lambda xx: eng.runner._fns["seg"](
                    ms.params["seg"], xx[None])[0])(x)
                return (x + 0.001 * jnp.mean(conf).astype(x.dtype),
                        jnp.mean(conf))
            carry0 = jnp.zeros((streams, 3, size, size), jnp.bfloat16)
            scan_time("segmenter net only", step, carry0, clip_len, streams)

        elif v == "segfull":
            # The whole per-frame segmenter stage as predict_batch runs it
            # when only the skin channel is live (bench): full-frame resize
            # -> net -> full-res ch3 upsample (planar layout, as runner.py
            # seg_one since the planar rewrite).
            from bp_from_video_tpu.models import warp
            from bp_from_video_tpu.models.runner import SEG_SKIN_CLASS
            size = eng.runner._fns["seg_size"]

            def step(carry, i):
                frames = frames_at(i)

                def seg_one(fr):
                    small = warp.resize_bilinear_planar(
                        fr.astype(eng.runner.dtype), size, size,
                        dtype=eng.runner.dtype, out_dtype=jnp.float32) / 255.0
                    conf = eng.runner._fns["seg"](
                        ms.params["seg"], small[None].astype(eng.runner.dtype))
                    conf_p = (conf[0] if eng.runner._fns["seg_planar"]
                              else jnp.transpose(conf[0], (2, 0, 1)))
                    sk = SEG_SKIN_CLASS
                    return warp.resize_bilinear_planar(
                        conf_p[sk:sk + 1], h, w,
                        dtype=jnp.bfloat16, out_dtype=jnp.float32)[0]
                wts = jax.vmap(seg_one)(frames)
                return carry + 0.0 * jnp.mean(wts), jnp.mean(wts)
            scan_time("seg resize+net+up ch3", step, jnp.float32(0.0),
                      clip_len, streams)

        elif v == "segpost":
            # The PRODUCTION segmenter stage exactly as predict_batch runs
            # it: resize -> net -> SIX-channel full-res upsample -> full-res
            # argmax (runner.py seg_one).  Diff vs 'segfull' (ch3-only)
            # prices the 5 extra upsampled channels + the argmax — the
            # candidate "skin-only outputs" optimization.
            from bp_from_video_tpu.models import warp
            size = eng.runner._fns["seg_size"]

            from bp_from_video_tpu.models.runner import SEG_SKIN_CLASS

            def step(carry, i):
                frames = frames_at(i)

                def seg_one(fr):
                    small = warp.resize_bilinear_planar(
                        fr.astype(eng.runner.dtype), size, size,
                        dtype=eng.runner.dtype, out_dtype=jnp.float32) / 255.0
                    conf = eng.runner._fns["seg"](
                        ms.params["seg"], small[None].astype(eng.runner.dtype))
                    conf_p = (conf[0] if eng.runner._fns["seg_planar"]
                              else jnp.transpose(conf[0], (2, 0, 1)))
                    conf_full = warp.resize_bilinear_planar(
                        conf_p, h, w, dtype=jnp.bfloat16,
                        out_dtype=jnp.float32)
                    return (jnp.argmax(conf_full, axis=0).astype(jnp.int32),
                            conf_full[SEG_SKIN_CLASS])
                cls, wts = jax.vmap(seg_one)(frames)
                return (carry + 0.0 * jnp.mean(wts),
                        jnp.mean(wts) + jnp.sum(cls).astype(jnp.float32))
            scan_time("seg full post (6ch+argmax)", step, jnp.float32(0.0),
                      clip_len, streams)

        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
