"""Headline benchmark: end-to-end fused rPPG throughput, frames/sec/chip.

Measures the flagship configuration — face + hand landmarkers (real TFLite
weights when available), dual ROI, Butterworth chain, Lomb-Scargle spectrum,
pairwise PTT — i.e. the whole reference hot loop (bp.py:21-30) minus host
video decode, batched over streams and scanned over time on one chip.

Measurement state: steady tracking (tracking flags held true each step),
the pipeline's operating point whenever a subject is in frame — landmark
nets, ROI sampling, full DSP/spectra/PTT all run; the detect-then-track
gate keeps the detectors off exactly as in live operation.  Random frames
cannot engage real-weight tracking on their own, which would silently bench
the cold-start path instead.  Frames are PRNG-generated on-device inside
the scan (no host transfer, inputs vary every step).

Baseline: the reference's achieved live pipeline rate, ~25 frames/sec on an
RTX 3060 Ti desktop (reference README.md:44, hardware README.md:54; see
BASELINE.md).  ``vs_baseline`` is the speedup over that.

Prints ONE JSON line:
  {"metric": "rppg_fused_throughput", "value": N, "unit": "frames/sec/chip",
   "vs_baseline": N}

``BENCH_ALL=1`` instead measures the flagship AND every BASELINE preset,
prints one JSON line per configuration (flagship line LAST so the driver's
single-line parse still picks it up), and writes the machine-captured table
to ``BENCH_PRESETS.json`` — headline claims must be artifact-backed, not
README prose (VERDICT.md Weak #6).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

REF_BASELINE_FPS = 25.0  # reference README.md:44


def _asset_dir():
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (here, "/root/reference"):
        if os.path.exists(os.path.join(cand, "models", "face_landmarker.task")):
            return cand
    return None


def _enable_compile_cache():
    """Persistent XLA compilation cache: compile once per shape, reuse across
    processes (the remote-TPU tunnel makes fresh compiles minutes-long).

    CPU smoke runs (``BENCH_PLATFORM`` cpu-like) get their OWN cache dir:
    the shared ``.jax_cache`` holds XLA:CPU AOT artifacts the tunnel
    compiled for a different host machine type, and loading those locally
    produced silently wrong numerics (tests/conftest.py documents the same
    poisoning class)."""
    import jax
    here = os.path.dirname(os.path.abspath(__file__))
    if "cpu" in os.environ.get("BENCH_PLATFORM", ""):
        # Host-keyed: XLA:CPU AOT artifacts from a different machine load
        # with only a warning and run wrong (utils/hostcache.py).
        from bp_from_video_tpu.utils.hostcache import scoped_cpu_cache_dir
        default = scoped_cpu_cache_dir(here, ".jax_cache_bench_cpu")
    else:
        default = os.path.join(here, ".jax_cache")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", default)
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_config(preset: str | None, streams: int, h: int, w: int,
                 on_tpu: bool):
    """The measured EngineConfig (flagship when ``preset`` is None, else one
    of the five BASELINE preset configurations) and its metric name."""
    from bp_from_video_tpu.config import (EngineConfig, InferenceConfig,
                                          preset_configs)
    infer_over = dict(
        use_pallas=on_tpu,
        fuse_dw_pw=bool(int(os.environ.get("BENCH_FUSE", "0"))),
        pack_s2d=int(os.environ.get("BENCH_S2D", "0")),
        # Default ON (measured 7,019 -> 10,867 fps/chip, 2026-08-17):
        # BENCH_FTRUNK=0 reverts to the plain XLA conv pipeline.
        fused_stem=on_tpu and bool(int(os.environ.get("BENCH_FSTEM", os.environ.get("BENCH_FTRUNK", "1")))),
        fused_trunk=on_tpu and bool(int(os.environ.get("BENCH_FTRUNK", "1"))),
        fused_bn_min_hw=int(os.environ.get("BENCH_BN_MINHW", "96")),
        # BENCH_SEGSKIN=1: segmenter emits only the face-skin mask (the
        # channel the pipeline consumes) instead of all 6 full-res masks
        # + full-res argmax (config.InferenceConfig.seg_full_masks).
        seg_full_masks=not bool(int(os.environ.get("BENCH_SEGSKIN", "0"))))
    if os.environ.get("BENCH_ROT"):
        # BENCH_ROT=shear|exact|cover: landmark-crop rotation strategy
        # (config.InferenceConfig.rotation_mode; non-cover modes bypass
        # the Pallas crop/stem/trunk pipeline — they price rotated-view
        # fidelity, see tools/ablate.py rot_* variants).
        infer_over["rotation_mode"] = os.environ["BENCH_ROT"]
    if os.environ.get("BENCH_SHEARSUB"):
        # Per-kind shear sub-batch budget for the hybrid rotation gate
        # (config.InferenceConfig.shear_subbatch).
        infer_over["shear_subbatch"] = int(os.environ["BENCH_SHEARSUB"])
    if preset:
        base = preset_configs()[preset]
        cfg = dataclasses.replace(
            base, frame_height=h, frame_width=w, num_streams=streams,
            compute_dtype="bfloat16",
            inference=dataclasses.replace(base.inference, **infer_over))
        return cfg, f"rppg_fused_throughput_{preset}"
    cfg = EngineConfig(frame_height=h, frame_width=w, num_streams=streams,
                       compute_dtype="bfloat16",
                       inference=InferenceConfig(**infer_over))
    return cfg, "rppg_fused_throughput"


def measure(cfg, metric: str, clip_len: int, reps: int,
            render: bool = False, lost: int | None = None,
            tilt_deg: float | None = None,
            tilt_k: int | None = None,
            micro_batch: int | None = None) -> dict:
    """Compile the fused multi-stream step for ``cfg`` and measure
    steady-state frames/sec/chip over ``reps`` scans of ``clip_len``.

    ``render`` additionally rasterizes display output inside the timed
    step — overlay compose (boxes/points/ROIs/segmenter blend) plus the
    3-graph plot — so "with on-device overlays" claims are measured, not
    assumed (full-image reductions keep the rasterization live against
    XLA slicing/DCE).  ``render=True`` composes EVERY stream (the
    all-windows operating point); ``render="display"`` composes ONE
    stream — the pipelined driver's real live semantics
    (parallel/streams.make_display_step: one displayed window, O(1)
    raster cost in stream count)."""
    import jax
    import jax.numpy as jnp
    from bp_from_video_tpu.models.runner import TrackState
    from bp_from_video_tpu.parallel import MultiStreamEngine
    from bp_from_video_tpu.runtime.engine import EngineState

    streams = cfg.num_streams
    h, w = cfg.frame_height, cfg.frame_width
    dt = 1.0 / 30.0
    ms = MultiStreamEngine(cfg, asset_dir=_asset_dir())

    # Pre-generated rotating frame buffer: frame CONTENT does not change
    # inference cost, and generating 59 MB of random pixels per step inside
    # the timed loop would charge ~10% of the step to synthesis work a real
    # pipeline never does (frames arrive by DMA).
    # PLANAR frames ([S, 3, H, W]) — the layout both Pallas kernels consume;
    # feeding it directly removes the per-step 2*S*H*W*3-byte transpose
    # (capture/feeder upload planar the same way; engine accepts either).
    n_buf = 4
    frame_buf = jax.jit(lambda k: jax.random.randint(
        k, (n_buf, streams, 3, h, w), 0, 256, jnp.uint8))(jax.random.key(7))

    drawer = None
    if render:
        from bp_from_video_tpu.render.drawer import Drawer
        drawer = Drawer(cfg, show=False)

    # ``tilt_deg``: pin every tracked rect to a fixed frame-centered
    # geometry with the given rotation, so angle-gated paths (rotation_mode
    # "hybrid") are priced at a KNOWN operating point — tracked rects on
    # random frames otherwise carry landmark-derived arbitrary rotations
    # that flip the gate unpredictably step to step.  ``tilt_k`` limits
    # the tilt to the first k streams (rest upright) — the
    # one-tilted-subject operating point the shear sub-batch bounds.
    tilt_rect = None
    if tilt_deg is not None:
        import numpy as np
        side = min(h, w) / 3.0
        tilt_rect = jnp.asarray(
            [w / 2.0, h / 2.0, side, side, float(np.deg2rad(tilt_deg))],
            jnp.float32)
        if tilt_k is not None:
            up = tilt_rect.at[4].set(0.0)
            tmask = (jnp.arange(streams) < tilt_k)[:, None]
            tilt_rect = jnp.where(tmask, tilt_rect[None], up[None])  # [S,5]

    f_n = micro_batch or 1

    def body(params, frame_buf, carry, i):
        st, key = carry
        if micro_batch:
            # Lagged-rect micro-batch: F frames per dispatch (frames
            # [F, S, 3, H, W], per-frame timestamps).  ``i`` counts
            # windows; frame j of window i is global frame i*F + j.
            frames = jnp.stack([
                jax.lax.dynamic_index_in_dim(
                    frame_buf,
                    jnp.mod((i.astype(jnp.int32) * f_n + j), n_buf),
                    keepdims=False)
                for j in range(f_n)])
            ts = ((i * f_n + 1.0 + jnp.arange(f_n, dtype=jnp.float32))
                  [:, None] * dt * jnp.ones((1, streams), jnp.float32))
        else:
            frames = jax.lax.dynamic_index_in_dim(
                frame_buf, jnp.mod(i.astype(jnp.int32), n_buf),
                keepdims=False)
            ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
        # Hold steady tracking: the operating point with a subject in frame
        # (random frames cannot engage real-weight tracking by themselves).
        # BENCH_LOST=k forces k streams' tracking OFF every step instead —
        # the mixed-tracking operating point (bounded re-detection
        # sub-batch; VERDICT.md Weak #4 cost claim).
        tr = st.track
        n_lost = (int(os.environ.get("BENCH_LOST", "0"))
                  if lost is None else lost)
        lost_m = jnp.arange(streams) < n_lost
        tr = tr._replace(
            face_tracking=jnp.ones_like(tr.face_tracking) & ~lost_m,
            hand_tracking=(jnp.ones_like(tr.hand_tracking)
                           & ~lost_m[:, None]))
        if tilt_rect is not None:
            hand_r = tilt_rect[:, None, :] if tilt_rect.ndim == 2 \
                else tilt_rect
            tr = tr._replace(
                face_rect=jnp.broadcast_to(tilt_rect, tr.face_rect.shape),
                hand_rects=jnp.broadcast_to(hand_r, tr.hand_rects.shape))
        if micro_batch:
            st, out = ms.engine.batch_step_lagged(
                params, EngineState(st.signals, tr), frames, ts)
            frames = frames[-1]      # display composes the LAST frame
        else:
            st, out = ms.engine.batch_step(
                params, EngineState(st.signals, tr), frames, ts)
        extra = jnp.float32(0.0)
        if drawer is not None and render == "display":
            sel = jax.tree.map(lambda a: a[0], out)
            fimg, pimg, packed = drawer._compose_fn(
                jnp.transpose(frames[0], (1, 2, 0)), sel)
            extra = (jnp.sum(fimg, dtype=jnp.float32)
                     + jnp.sum(pimg, dtype=jnp.float32)
                     + jnp.sum(jnp.nan_to_num(packed)))
        elif drawer is not None:
            nhwc = jnp.transpose(frames, (0, 2, 3, 1))
            fimg, pimg, packed = jax.vmap(drawer._compose_fn)(nhwc, out)
            extra = (jnp.sum(fimg, dtype=jnp.float32)
                     + jnp.sum(pimg, dtype=jnp.float32)
                     + jnp.sum(jnp.nan_to_num(packed)))
        return (st, key), (out.bpm, extra)

    # params and frame_buf are explicit jit ARGUMENTS, not closure
    # captures: captured arrays travel with the remote-compile request
    # through the tunnel (frame_buf alone is ~59 MB at 64 streams — the
    # likely source of the HTTP 413 size ceiling above S=64), while
    # argument shapes cost nothing.
    @jax.jit
    def run(params, frame_buf, st, key, i0):
        (st, key), (bpm, extra) = jax.lax.scan(
            functools.partial(body, params, frame_buf), (st, key),
            i0 + jnp.arange(clip_len, dtype=jnp.float32))
        return st, key, (bpm, extra)

    state = ms.init_states()
    key = jax.random.key(0)
    state, key, _ = run(ms.params, frame_buf, state, key,
                        jnp.float32(0.0))  # warmup/compile
    jax.block_until_ready(state)

    best = 0.0
    for r in range(reps):
        t0 = time.perf_counter()
        state, key, bpm = run(ms.params, frame_buf, state, key,
                              jnp.float32((r + 1) * clip_len))
        jax.block_until_ready(bpm)
        elapsed = time.perf_counter() - t0
        best = max(best, (clip_len * streams * f_n) / elapsed)

    res = {
        "metric": metric,
        "value": round(best, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best / REF_BASELINE_FPS, 2),
        "streams": streams,
        "clip_len": clip_len,
        "frame_hw": [h, w],
    }
    if micro_batch:
        res["micro_batch"] = micro_batch
        res["note"] = ("lagged-rect temporal micro-batch: crops use the "
                       "pre-window tracking rects (lag <= F frames), "
                       "vitals/analysis update once per F frames")
    return res


def measure_hostlive(cfg, metric: str, n_frames: int = 24) -> dict:
    """Host-in-the-loop b=1 live latency, measured the way a live user
    experiences it (VERDICT r2 Weak #4): host numpy frame -> device_put ->
    ONE fused step+HUD dispatch -> packed HUD scalar download, per frame.

    The step and the HUD pack compile into a single executable (one
    dispatch per frame — the latency-optimal driver shape; the overlay /
    plot rasterization is DCE'd since a headless live loop never reads
    it).  Reported components:

    * ``upload_ms``  — device_put of the uint8 frame.  Through the remote
      tunnel this is ~1 MB/s (harness transport, not TPU: a colocated host
      DMAs this in ~0.1 ms).
    * ``step_ms``    — dispatch + device compute, honest sync mode.
    * ``fetch_ms``   — the packed HUD scalar block download (one RTT).
    * value          — median total ms/frame, host clock.

    ``step_ms + fetch_ms`` is the device-resident operating point (frames
    arriving by DMA/feeder), the number comparable to SURVEY §6's
    "live mode < 5 ms" budget."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bp_from_video_tpu.render.drawer import Drawer
    from bp_from_video_tpu.runtime.engine import Engine

    h, w = cfg.frame_height, cfg.frame_width
    eng = Engine(cfg, asset_dir=_asset_dir())
    drawer = Drawer(cfg, show=False)

    def step_hud(params, state, frame, t):
        state, out = eng.step(params, state, frame, t)
        _, _, packed = drawer._compose_fn(frame, out)
        return state, packed

    step_hud = jax.jit(step_hud)

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    state = eng.init_state()
    dt = 1.0 / 30.0

    # Warmup / compile outside the timed loop.
    fd = jax.device_put(jnp.asarray(base))
    state, packed = step_hud(eng.params, state, fd, jnp.float32(dt))
    np.asarray(packed)

    ups, steps_, fetches, totals = [], [], [], []
    for i in range(n_frames):
        frame = np.roll(base, i + 1, axis=1)  # vary content (dedupe trap)
        t0 = time.perf_counter()
        fd = jax.device_put(jnp.asarray(frame))
        jax.block_until_ready(fd)
        t1 = time.perf_counter()
        state, packed = step_hud(eng.params, state, fd,
                                 jnp.float32((i + 2) * dt))
        jax.block_until_ready(packed)
        t2 = time.perf_counter()
        np.asarray(packed)
        t3 = time.perf_counter()
        ups.append(t1 - t0)
        steps_.append(t2 - t1)
        fetches.append(t3 - t2)
        totals.append(t3 - t0)

    med = lambda xs: round(float(np.median(xs)) * 1000.0, 3)
    total = med(totals)
    return {
        "metric": metric,
        "value": total,
        "unit": "ms/frame (batch 1, host-in-the-loop)",
        "vs_baseline": round((1000.0 / total) / REF_BASELINE_FPS, 2),
        "upload_ms": med(ups),
        "step_ms": med(steps_),
        "fetch_ms": med(fetches),
        "device_resident_ms": med([s + f for s, f in zip(steps_, fetches)]),
        "frames": n_frames,
        "frame_hw": [h, w],
    }


def measure_hostlive_pipelined(cfg, metric: str, n_frames: int = 48) -> dict:
    """Live b=1 fps with the pipelined driver's overlap (VERDICT r3 next
    #6): upload(i+1), step(i) and fetch(i-1) run on separate threads with
    depth-1 queues, so the three sequential tunnel RTTs of the serial
    host-live loop collapse toward one RTT per frame at steady state —
    the number that answers "live fps with a display through this
    tunnel".  Reported: steady-state frames/sec (median inter-completion
    period over the pipelined tail)."""
    import queue
    import threading

    import numpy as np
    import jax
    import jax.numpy as jnp
    from bp_from_video_tpu.render.drawer import Drawer
    from bp_from_video_tpu.runtime.engine import Engine

    h, w = cfg.frame_height, cfg.frame_width
    eng = Engine(cfg, asset_dir=_asset_dir())
    drawer = Drawer(cfg, show=False)

    def step_hud(params, state, frame, t):
        state, out = eng.step(params, state, frame, t)
        _, _, packed = drawer._compose_fn(frame, out)
        return state, packed

    step_hud = jax.jit(step_hud)
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dt = 1.0 / 30.0

    state = eng.init_state()
    fd = jax.device_put(jnp.asarray(base))
    state, packed = step_hud(eng.params, state, fd, jnp.float32(dt))
    np.asarray(packed)  # warmup/compile

    q_up: queue.Queue = queue.Queue(maxsize=1)   # depth-1: drop-oldest
    q_out: queue.Queue = queue.Queue(maxsize=1)  # semantics live upstream
    done_t = [0.0] * n_frames
    st_box = [state]

    def uploader():
        for i in range(n_frames):
            frame = np.roll(base, i + 1, axis=1)  # vary (dedupe trap)
            d = jax.device_put(jnp.asarray(frame))
            jax.block_until_ready(d)
            q_up.put((i, d))
        q_up.put(None)

    def stepper():
        while True:
            item = q_up.get()
            if item is None:
                q_out.put(None)
                return
            i, d = item
            st_box[0], pk = step_hud(eng.params, st_box[0], d,
                                     jnp.float32((i + 2) * dt))
            q_out.put((i, pk))

    def fetcher():
        while True:
            item = q_out.get()
            if item is None:
                return
            i, pk = item
            np.asarray(pk)
            done_t[i] = time.perf_counter()

    threads = [threading.Thread(target=f)
               for f in (uploader, stepper, fetcher)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    # Steady state: skip the fill (first 8 frames).
    periods = np.diff(np.asarray(done_t))[8:]
    period_ms = float(np.median(periods)) * 1000.0
    fps = 1000.0 / period_ms
    return {
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/sec (batch 1, pipelined upload/step/fetch)",
        "vs_baseline": round(fps / REF_BASELINE_FPS, 2),
        "median_period_ms": round(period_ms, 3),
        "wall_fps": round((n_frames - 1) / (max(done_t) - t0), 2),
        "frames": n_frames,
        "frame_hw": [h, w],
    }


def measure_lifecycle(cfg, metric: str, clip_len: int, reps: int) -> dict:
    """Realistic tracking lifecycle on device (VERDICT r2 Weak #5 / next
    #7): synthetic faces + REAL face weights, NO forced tracking flags —
    acquisition, steady tracking, loss and re-acquisition all emerge from
    the presence gate and the bounded detector sub-batch, exactly as in
    live operation.

    The scan alternates phases: 64 face steps, then 32 noise steps (the
    subject leaves), repeating.  Face frames cycle through 8 pre-built
    pulsed/shifted variants (content varies every step — the axon dedupe
    trap — with zero in-loop synthesis cost, like frames arriving by DMA).
    Reported alongside throughput: the measured fraction of (stream, step)
    slots tracking during face-phase steps at steady state."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bp_from_video_tpu.parallel import MultiStreamEngine
    from tools.rotsweep import synth_face

    streams = cfg.num_streams
    h, w = cfg.frame_height, cfg.frame_width
    dt = 1.0 / 30.0
    ms = MultiStreamEngine(cfg, asset_dir=_asset_dir())

    # One host-built face frame (the ~1 MB upload happens once): cartoon
    # face the real BlazeFace/face-mesh weights verifiably respond to
    # (tools/rotsweep.synth_face), centered on a neutral canvas.
    face = synth_face(h=min(h, 256), w=min(w, 256),
                      cx=min(w, 256) // 2, cy=min(h, 256) // 2,
                      s=min(h, 256) // 3)
    canvas = np.full((h, w, 3), 110, np.uint8)
    y0, x0 = (h - face.shape[0]) // 2, (w - face.shape[1]) // 2
    canvas[y0:y0 + face.shape[0], x0:x0 + face.shape[1]] = face
    base = jax.device_put(jnp.asarray(canvas.transpose(2, 0, 1)))  # [3,h,w]

    # 8 face variants (green-channel pulse + 1-px shifts) and 2 noise
    # frames, built ON DEVICE once.
    n_face, n_noise = 8, 2

    @jax.jit
    def build_bufs(base, key):
        def variant(i):
            g = base[1].astype(jnp.int16) + (
                9.0 * jnp.sin(2.0 * jnp.pi * i / n_face)).astype(jnp.int16)
            f = base.at[1].set(jnp.clip(g, 0, 255).astype(jnp.uint8))
            return jnp.roll(f, i % 3 - 1, axis=-1)
        face_buf = jnp.stack([variant(i) for i in range(n_face)])
        noise_buf = jax.random.randint(
            key, (n_noise, streams, 3, h, w), 0, 256, jnp.uint8)
        return face_buf, noise_buf

    face_buf, noise_buf = build_bufs(base, jax.random.key(11))

    def body(params, face_buf, noise_buf, carry, i):
        st, _ = carry
        ii = i.astype(jnp.int32)
        phase_face = jnp.mod(ii, 96) < 64
        face_f = jnp.broadcast_to(
            jax.lax.dynamic_index_in_dim(face_buf, jnp.mod(ii, n_face),
                                         keepdims=False)[None],
            (streams, 3, h, w))
        noise_f = jax.lax.dynamic_index_in_dim(
            noise_buf, jnp.mod(ii, n_noise), keepdims=False)
        frames = jnp.where(phase_face, face_f, noise_f)
        ts = (i + 1.0) * dt * jnp.ones((streams,), jnp.float32)
        st, out = ms.engine.batch_step(params, st, frames, ts)
        frac = jnp.mean(st.track.face_tracking.astype(jnp.float32))
        return (st, jnp.float32(0.0)), (frac, phase_face)

    @jax.jit
    def run(params, face_buf, noise_buf, st, i0):
        carry, (frac, pf) = jax.lax.scan(
            functools.partial(body, params, face_buf, noise_buf),
            (st, jnp.float32(0.0)),
            i0 + jnp.arange(clip_len, dtype=jnp.float32))
        return carry[0], frac, pf

    state = ms.init_states()
    state, frac, pf = run(ms.params, face_buf, noise_buf, state,
                          jnp.float32(0.0))  # warmup/compile
    jax.block_until_ready(frac)

    best, frac_np, pf_np, i0_last = 0.0, None, None, 0
    for r in range(reps):
        t0 = time.perf_counter()
        i0_last = (r + 1) * clip_len
        state, frac, pf = run(ms.params, face_buf, noise_buf, state,
                              jnp.float32(i0_last))
        jax.block_until_ready(frac)
        elapsed = time.perf_counter() - t0
        best = max(best, (clip_len * streams) / elapsed)
        frac_np, pf_np = np.asarray(frac), np.asarray(pf, bool)

    # Steady-state face-phase tracked fraction: skip the first 16 steps of
    # each face phase (re-acquisition ramp: the detector sub-batch serves 8
    # streams/step).  Phase position is a function of the GLOBAL step index
    # i0 + idx — the recorded scan started at i0_last, which need not be a
    # multiple of the 96-step phase period.
    steady = pf_np.copy()
    idx = i0_last + np.arange(len(pf_np))
    steady &= (idx % 96) >= 16
    return {
        "metric": metric,
        "value": round(best, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best / REF_BASELINE_FPS, 2),
        "streams": streams,
        "clip_len": clip_len,
        "frame_hw": [h, w],
        "track_frac_face_steady": round(float(frac_np[steady].mean()), 3)
        if steady.any() else None,
        "track_frac_noise": round(float(frac_np[~pf_np].mean()), 3)
        if (~pf_np).any() else None,
    }


def _emit(result: dict) -> None:
    print(json.dumps({k: result[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


def main():
    quick = "--quick" in sys.argv
    if not os.environ.get("BENCH_PLATFORM"):
        # TPU run: the tunnel goes dark for stretches, and a dark tunnel
        # hangs backend init forever.  Probe it (subprocess, bounded,
        # retried — see utils/tunnel.py) BEFORE initializing, so the
        # bench either runs for real after a recovery or fails honestly
        # instead of wedging until an external timeout.
        from bp_from_video_tpu.utils.tunnel import wait_for_tpu
        if not wait_for_tpu():
            print("bench.py: remote-TPU tunnel unreachable within "
                  "BPTPU_TUNNEL_WAIT; refusing to emit a number "
                  "(set BENCH_PLATFORM=cpu for a CPU smoke run)",
                  file=sys.stderr, flush=True)
            sys.exit(3)
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        # CPU smoke-testing: the environment's sitecustomize pins
        # jax_platforms to the remote TPU at interpreter start, overriding
        # the JAX_PLATFORMS env var; an explicit config update wins.
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    _enable_compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # The axon client starts in an async fast path whose
        # block_until_ready is FAKE (returns before execution) — timings
        # taken there are garbage.  One tiny D2H latches honest synchronous
        # dispatch for the whole process (one-time multi-minute stall;
        # utils/axon.py).  Round-2 benches got this implicitly because
        # fused-trunk construction performed a D2H; construction is now
        # D2H-free, so the latch is explicit.
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        print(f"bench.py: sync-dispatch latch took "
              f"{force_sync_dispatch():.1f} s", file=sys.stderr, flush=True)

    streams = int(os.environ.get("BENCH_STREAMS", "8" if quick else "64"))
    # Long scan: each executable dispatch through the remote-TPU tunnel costs
    # ~40-50 ms regardless of work, so short clips under-report steady-state
    # throughput (clip 256 amortizes it to 0.18 ms/step vs 0.47 at 96).
    clip_len = int(os.environ.get("BENCH_CLIP", "8" if quick else "256"))
    reps = int(os.environ.get("BENCH_REPS", "2" if quick else "3"))
    h, w = (128, 160) if quick else (480, 640)

    if os.environ.get("BENCH_ALL"):
        # Every BASELINE preset first, flagship LAST (the driver parses the
        # final line).  The multistream preset keeps its 8-stream target
        # shape (BASELINE.md: 8 x 200 FPS, all four models).
        specs = [(p, 8 if p == "multistream" else streams)
                 for p in ("butter_welch_face", "dual_roi_ls",
                           "segmenter_fir", "ptt_filtered", "multistream")]
        specs.append(("multistream_disp", 8))
        specs.append(("multistream_mb4", 8))
        specs.append(("live", 1))
        specs.append(("hostlive", 1))
        specs.append(("hostlive_pipe", 1))
        specs.append(("lost1", streams))
        specs.append(("lifecycle", streams))
        specs.append(("hybrid_up", streams))
        specs.append(("hybrid_tilt25", streams))
        specs.append(("hybrid_tilt25_k1", streams))
        specs.append(("segskin", streams))
        specs.append((None, streams))
        results = []
        for preset, s in specs:
            # The tunnel's remote-compile endpoint rejects requests over a
            # size limit (HTTP 413) — sometimes transiently, and
            # deterministically for the biggest programs (segmenter_fir's
            # full-res masks at 64 streams).  Retry same-size once for the
            # transient case, then halve the stream count until the
            # program fits; fps/chip is throughput-normalized either way
            # and the JSON records the streams actually used.
            res = None
            live = preset == "live"
            lost1 = preset == "lost1"
            mb = (int(preset.rsplit("mb", 1)[1])
                  if preset and preset.startswith("multistream_mb")
                  else None)
            special = preset in ("live", "lost1", "hostlive",
                                 "hostlive_pipe", "lifecycle",
                                 "hybrid_up", "hybrid_tilt25",
                                 "hybrid_tilt25_k1", "segskin",
                                 "multistream_disp") or mb is not None
            single = preset in ("live", "hostlive", "hostlive_pipe")
            for attempt, s_try in enumerate((s, s, max(s // 2, 8),
                                             max(s // 4, 8)) if not single
                                            else (1, 1)):
                cfg, metric = build_config(
                    "butter_welch_face" if preset == "lifecycle"
                    else "segmenter_fir" if preset == "segskin"
                    else "multistream" if (preset == "multistream_disp"
                                           or mb is not None)
                    else (None if special else preset), s_try, h, w, on_tpu)
                if live:
                    metric = "rppg_live_step_latency"
                elif preset == "hostlive":
                    metric = "rppg_live_latency_host"
                elif preset == "hostlive_pipe":
                    metric = "rppg_live_pipelined_fps"
                elif preset == "lifecycle":
                    # Acquisition -> steady -> loss -> re-acquisition with
                    # real face weights and NO forced tracking flags
                    # (VERDICT r2 next #7); face-only preset so every
                    # tracked state is reachable from the synthetic scene.
                    metric = "rppg_lifecycle_throughput"
                elif preset == "multistream_disp":
                    # The pipelined driver's live semantics: all four
                    # models for every stream, display composition for
                    # the ONE shown window (make_display_step) — the
                    # honest row for "multi-stream live with a display"
                    # next to the all-streams-rendered multistream row.
                    metric = "rppg_fused_throughput_multistream_disp"
                elif preset == "segskin":
                    # The segmenter preset's skin-only output mode
                    # (seg_full_masks=False: one model-res skin mask, the
                    # channel the pipeline consumes, instead of 6 full-res
                    # masks + full-res argmax) — the honest trade-off row
                    # next to the reference-parity mode (VERDICT r2 Weak
                    # #2 / next #3).
                    cfg = dataclasses.replace(cfg, inference=dataclasses.replace(
                        cfg.inference, seg_full_masks=False))
                    metric = "rppg_fused_throughput_segskin"
                elif preset in ("hybrid_up", "hybrid_tilt25",
                                "hybrid_tilt25_k1"):
                    # The angle-gated rotation mode at pinned operating
                    # points: upright (gate -> Pallas cover fast path; must
                    # sit within ~10% of the flagship), 25° tilt on ALL
                    # streams (whole-batch shear fallback), and 25° tilt on
                    # ONE stream of S (the bounded shear sub-batch serves
                    # just that crop — VERDICT r3 Weak #5's operating
                    # point, priced ≥ ~9k fps).
                    cfg = dataclasses.replace(cfg, inference=dataclasses.replace(
                        cfg.inference, rotation_mode="hybrid"))
                    metric = f"rppg_fused_throughput_{preset}"
                elif mb is not None:
                    # The lagged-rect temporal micro-batch operating point
                    # on the multistream preset (round-5 wall mitigation):
                    # F frames per dispatch, one displayed window.
                    metric = f"rppg_fused_throughput_{preset}"
                elif lost1:
                    # Mixed-tracking operating point: 1 of S streams loses
                    # tracking every step, so the bounded re-detection
                    # sub-batch runs alongside steady tracking (the
                    # "1-of-64 lost track costs <15%" claim, VERDICT Weak #4).
                    metric = "rppg_fused_throughput_lost1"
                try:
                    if preset == "hostlive":
                        res = measure_hostlive(cfg, metric)
                        # b=1 latency swings with tunnel load; a dedicated
                        # solo capture (BENCH_PRESET=hostlive writes
                        # BENCH_HOSTLIVE_SOLO.json) is the defensible
                        # number — keep it as the row value and carry this
                        # in-BENCH_ALL measurement as the annotated
                        # contended field (VERDICT r3 Weak #2 inverted).
                        solo_path = os.path.join(
                            os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_HOSTLIVE_SOLO.json")
                        if on_tpu and os.path.exists(solo_path):
                            with open(solo_path) as f:
                                solo = json.load(f)
                            # Age from the IN-FILE capture timestamp: the
                            # file is git-tracked, so mtime resets to
                            # checkout time on a fresh clone and would
                            # wave ancient captures through.  A legacy
                            # file WITHOUT the timestamp is rejected for
                            # the same reason (mtime is meaningless).
                            cap_t = solo.pop("captured_at_unix", None)
                            age_h = (float("inf") if cap_t is None
                                     else (time.time() - cap_t) / 3600)
                            # Merge only a CONSISTENT solo capture: same
                            # frame shape and recent (a stale file from an
                            # older code revision must not masquerade as
                            # this run's number).
                            if (solo.get("frame_hw") == res.get("frame_hw")
                                    and age_h <= 7 * 24):
                                solo["contended_inline_ms"] = res["value"]
                                solo["solo_file_age_hours"] = round(age_h, 1)
                                solo["note"] = (
                                    "value = dedicated solo capture; "
                                    "contended_inline_ms = same row "
                                    "measured mid-BENCH_ALL with the "
                                    "tunnel loaded")
                                res = solo
                            else:
                                print(f"hostlive: solo capture ignored "
                                      f"(frame_hw {solo.get('frame_hw')} vs "
                                      f"{res.get('frame_hw')}, age "
                                      f"{age_h:.1f} h)", file=sys.stderr,
                                      flush=True)
                    elif preset == "hostlive_pipe":
                        res = measure_hostlive_pipelined(cfg, metric)
                    elif preset == "lifecycle":
                        res = measure_lifecycle(cfg, metric, clip_len, reps)
                    else:
                        res = measure(
                            cfg, metric, clip_len, reps,
                            render=("display" if (preset == "multistream_disp"
                                                  or mb is not None)
                                    else preset == "multistream"),
                            micro_batch=mb,
                            lost=1 if lost1 else None,
                            tilt_deg=(0.0 if preset == "hybrid_up" else
                                      25.0 if preset in ("hybrid_tilt25",
                                                         "hybrid_tilt25_k1")
                                      else None),
                            tilt_k=(1 if preset == "hybrid_tilt25_k1"
                                    else None))
                    if live:
                        # Flagship step at batch 1 (SURVEY §7 "b=1 live"):
                        # on-device ms/frame amortized over the scan (the
                        # tunnel's ~45 ms dispatch is a harness artifact
                        # real deployments don't pay; the scan carries
                        # state frame to frame like a live feeder loop).
                        res = {"metric": metric,
                               "value": round(1000.0 / res["value"], 3),
                               "unit": "ms/frame (batch 1, scan-amortized)",
                               "vs_baseline": round(
                                   res["value"] / REF_BASELINE_FPS, 2),
                               "streams": 1, "clip_len": clip_len,
                               "frame_hw": [h, w]}
                    break
                except Exception as e:  # noqa: BLE001 - record and move on
                    print(f"{metric}: attempt {attempt + 1} "
                          f"(streams={s_try}) failed: {e}",
                          file=sys.stderr, flush=True)
            if res is None:
                results.append({"metric": metric, "error": "compile/run "
                                "failed after 4 attempts", "streams": s})
                continue
            _emit(res)
            results.append(res)
        # BENCH_PRESETS.json is the machine-captured TPU artifact that backs
        # BASELINE.md's headline table; a CPU smoke run must never clobber it
        # (that happened once — the artifact silently became a 10 fps CPU
        # table while BASELINE.md still cited the 10k fps numbers).
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_PRESETS.json" if on_tpu
                           else "BENCH_PRESETS_cpu.json")
        with open(out, "w") as f:
            json.dump({"hardware": jax.devices()[0].device_kind,
                       "backend": jax.default_backend(),
                       "results": results}, f, indent=1)
        return

    preset = os.environ.get("BENCH_PRESET") or None
    if preset == "hostlive":
        cfg, _ = build_config(None, 1, h, w, on_tpu)
        res = measure_hostlive(cfg, "rppg_live_latency_host")
        _emit(res)
        if on_tpu:
            # The dedicated solo capture IS the defensible artifact; the
            # next BENCH_ALL merges it into BENCH_PRESETS.json (with an
            # in-file capture timestamp — mtime lies on fresh checkouts).
            solo_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_HOSTLIVE_SOLO.json")
            with open(solo_path, "w") as f:
                json.dump(dict(res, captured_at_unix=time.time()), f,
                          indent=1)
        return
    if preset == "hostlive_pipe":
        cfg, _ = build_config(None, 1, h, w, on_tpu)
        _emit(measure_hostlive_pipelined(cfg, "rppg_live_pipelined_fps"))
        return
    if preset == "lifecycle":
        cfg, _ = build_config("butter_welch_face", streams, h, w, on_tpu)
        _emit(measure_lifecycle(cfg, "rppg_lifecycle_throughput",
                                clip_len, reps))
        return
    if preset in ("hybrid_up", "hybrid_tilt25", "hybrid_tilt25_k1"):
        cfg, _ = build_config(None, streams, h, w, on_tpu)
        cfg = dataclasses.replace(cfg, inference=dataclasses.replace(
            cfg.inference, rotation_mode="hybrid"))
        _emit(measure(cfg, f"rppg_fused_throughput_{preset}", clip_len,
                      reps, tilt_deg=0.0 if preset == "hybrid_up" else 25.0,
                      tilt_k=1 if preset == "hybrid_tilt25_k1" else None))
        return
    if preset == "segskin":
        cfg, _ = build_config("segmenter_fir", streams, h, w, on_tpu)
        cfg = dataclasses.replace(cfg, inference=dataclasses.replace(
            cfg.inference, seg_full_masks=False))
        _emit(measure(cfg, "rppg_fused_throughput_segskin", clip_len, reps))
        return
    if preset == "lost1":
        cfg, _ = build_config(None, streams, h, w, on_tpu)
        _emit(measure(cfg, "rppg_fused_throughput_lost1", clip_len, reps,
                      lost=1))
        return
    if preset == "multistream_disp":
        cfg, _ = build_config("multistream", streams, h, w, on_tpu)
        _emit(measure(cfg, "rppg_fused_throughput_multistream_disp",
                      clip_len, reps, render="display"))
        return
    if preset and preset.startswith("multistream_mb"):
        f_n = int(preset.rsplit("mb", 1)[1])
        cfg, _ = build_config("multistream", streams, h, w, on_tpu)
        _emit(measure(cfg, f"rppg_fused_throughput_{preset}", clip_len,
                      reps, render="display", micro_batch=f_n))
        return
    cfg, metric = build_config(preset, streams, h, w, on_tpu)
    # BENCH_MB=F: measure this config through the lagged-rect micro-batch
    # step (fixed per-step costs amortize over F frames — the round-5
    # multistream-wall mitigation, also a flagship operating point).
    mb_env = int(os.environ.get("BENCH_MB", "0")) or None
    if mb_env:
        metric = f"{metric}_mb{mb_env}"
    _emit(measure(cfg, metric, clip_len, reps,
                  render=(preset == "multistream"
                          or bool(int(os.environ.get("BENCH_RENDER", "0")))),
                  micro_batch=mb_env))


if __name__ == "__main__":
    main()
