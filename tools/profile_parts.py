"""Time individual inference components on the TPU (dev tool)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _asset_dir, _enable_compile_cache


def timeit(label, fn, *args, n=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt*1e3:8.2f} ms")
    return dt


def main():
    _enable_compile_cache()
    if jax.default_backend() == "tpu":
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        force_sync_dispatch()  # honest timings (utils/axon.py)
    from bp_from_video_tpu.config import EngineConfig
    from bp_from_video_tpu.models import warp, detection
    from bp_from_video_tpu.parallel import MultiStreamEngine

    s = 8
    for i, a in enumerate(sys.argv):
        if a == "--streams":
            s = int(sys.argv[i + 1])
    h, w = 480, 640
    cfg = EngineConfig(frame_height=h, frame_width=w, num_streams=s,
                       compute_dtype="bfloat16")
    ms = MultiStreamEngine(cfg, asset_dir=_asset_dir())
    runner = ms.engine.runner
    params = ms.params

    key = jax.random.key(0)
    frames = jax.random.randint(key, (s, h, w, 3), 0, 256, jnp.uint8
                                ).astype(jnp.float32)
    x256 = jax.random.uniform(key, (s, 1, 3, 256, 256), jnp.bfloat16)
    x224 = jax.random.uniform(key, (s, 2, 3, 224, 224), jnp.bfloat16)
    x192 = jax.random.uniform(key, (s, 1, 3, 192, 192), jnp.bfloat16)
    x128 = jax.random.uniform(key, (s, 1, 3, 128, 128), jnp.bfloat16)

    timeit(f"face mesh net (tflite) [{s},1,256²]",
           jax.vmap(lambda x: runner._fns["flm_lm"](params["flm_lm"], x)), x256)
    timeit(f"flm detector net [{s},1,128²]",
           jax.vmap(lambda x: runner._fns["flm_det"](params["flm_det"], x)), x128)
    timeit(f"palm det net [{s},1,192²]",
           jax.vmap(lambda x: runner._fns["palm_det"](params["palm_det"], x)), x192)
    timeit(f"hand lm net x2 [{s},2,224²]",
           jax.vmap(jax.vmap(lambda x: runner._fns["hand_lm"](
               params["hand_lm"], x[None]))), x224)

    rect = warp.Rect(jnp.float32(320), jnp.float32(240), jnp.float32(200),
                     jnp.float32(200), jnp.float32(0.3))
    arect = warp.axis_aligned_cover(rect)
    timeit(f"crop sep 480x640->256 x{s}",
           jax.vmap(lambda f: warp.crop_rect(f, arect, 256, False)), frames)
    timeit(f"crop sep 480x640->224 x{s}x2",
           jax.vmap(lambda f: jnp.stack(
               [warp.crop_rect(f, arect, 224, False),
                warp.crop_rect(f, arect, 224, False)])), frames)
    timeit(f"letterbox 480x640->128 x{s}",
           jax.vmap(lambda f: warp.letterbox(f, 128).image), frames)
    timeit(f"letterbox 480x640->192 x{s}",
           jax.vmap(lambda f: warp.letterbox(f, 192).image), frames)

    anchors = runner.face_anchors
    reg = jax.random.normal(key, (s, 896, 16))
    log = jax.random.normal(key, (s, 896, 1))
    def dec_nms(r, l):
        raw = detection.decode(detection.FACE_DECODE, r, l, anchors)
        return detection.weighted_nms(detection.FACE_DECODE, raw, 1)
    timeit(f"decode+NMS face x{s}", jax.vmap(dec_nms), reg, log)


if __name__ == "__main__":
    main()
