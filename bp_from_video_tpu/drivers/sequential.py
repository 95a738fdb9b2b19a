"""Sequential driver (reference bp.py): capture → fused device step →
display, one frame at a time, until EOF/'q'.

The reference's four stage calls (bp.py:23-26) become: one host capture
read, ONE jitted device call covering inference + all DSP (the engine
step), and one display call.  Camera keyboard control is preserved
(bp.py:27).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bp_from_video_tpu.config import CaptureConfig, EngineConfig
from bp_from_video_tpu.exceptions import CaptureError
from bp_from_video_tpu.render.drawer import Drawer
from bp_from_video_tpu.runtime.capture import VideoReader
from bp_from_video_tpu.runtime.engine import Engine
from bp_from_video_tpu.utils.profiling import profiler


def run(config: EngineConfig | None = None,
        capture: CaptureConfig | None = None, *,
        asset_dir: str | None = None, show: bool = True,
        max_frames: int | None = None, print_profile: bool = True,
        recorder=None, bp_predictor=None):
    """The reference main loop (bp.py:9-37). Returns the last StepOutputs."""
    import dataclasses

    config = config or EngineConfig()
    capture = capture or CaptureConfig()

    # Latch honest synchronous dispatch BEFORE capture starts (no-op
    # off-TPU): the axon client's first D2H stalls minutes (utils/axon.py),
    # and the drawer downloads HUD scalars every frame — better to pay the
    # stall here than freeze on the first displayed frame.
    from bp_from_video_tpu.utils.axon import force_sync_dispatch
    force_sync_dispatch()

    reader = VideoReader(capture.path, capture.target_res,
                         crop_portrait=capture.crop_portrait,
                         flip_horizontally=capture.flip_horizontally,
                         calibration_time=capture.calibration_time)
    # Probe one frame to size the engine to the actual stream.
    fd = reader.read_frame()
    h, w = fd.frame.shape[:2]
    if (h, w) != (config.frame_height, config.frame_width):
        config = dataclasses.replace(config, frame_height=h, frame_width=w)

    engine = Engine(config, asset_dir=asset_dir)
    drawer = Drawer(config, show=show, bp_predictor=bp_predictor)

    # ONE device dispatch per frame: BGR->RGB, the fused engine step AND
    # the display composition compile into a single executable.  Separate
    # step/compose dispatches each cost a full round trip on a remote
    # device (measured ~30 ms each through the dev tunnel,
    # BENCH_PRESETS.json rppg_live_latency_host components); fusing them
    # halves host-in-the-loop latency.
    def _device_step(params, state, frame_bgr, t):
        frame = frame_bgr[..., ::-1]
        state, out = engine.step(params, state, frame, t)
        frame_img, plot_img, packed = drawer._compose_fn(frame, out)
        return state, out, frame_img, plot_img, packed

    step = profiler.timeit(jax.jit(_device_step), name="engine_step",
                           fence=True)
    draw = profiler.timeit(drawer.present, name="draw_and_plot")
    read = profiler.timeit(reader.read_frame, name="read_frame")

    state = engine.init_state()
    out = None
    n = 0
    try:
        while True:
            state, out, fimg, pimg, packed = step(
                engine.params, state, jax.device_put(fd.frame),
                jnp.float32(fd.timestamp))
            key = draw(fimg, pimg, packed, fd.calibrating)
            reader.prop_control(key)
            if recorder is not None:
                recorder.add(fd.timestamp, out)
            n += 1
            if max_frames is not None and n >= max_frames:
                break
            fd = read()
    except (CaptureError, KeyboardInterrupt):
        pass
    finally:
        reader.cleanup()
        drawer.cleanup()
        if print_profile:
            profiler.printit()
    return out
