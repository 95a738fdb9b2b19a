"""TPU probe: Mosaic lowering + correctness + speed of the fused
bottleneck kernel (pallas/block_kernel.bottleneck_s1) at the real
face-mesh shapes, vs the unfused XLA chain.

The face_landmarks_detector trunk repeats 28 stride-1 bottleneck units at
seven (spatial, C, D) operating points; this probes each point once in
bf16 (the engine compute dtype) at stream batch, then scan-times a full
stage (4 chained units) both ways — the axon runtime dedupes repeated
identical executions and charges ~45 ms per dispatch, so only scans over
carried state measure anything real (tools/ablate.py methodology).

Usage: python tools/bnprobe.py            # all shapes, check + time
       BN_SHAPES=0,1 python tools/bnprobe.py   # subset by index
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _enable_compile_cache

# (h, C, D) — from the fused graph dump (tests/test_tflite_compiler.py::
# test_fuse_bottlenecks_matches_unfused): 4 units at each point.
SHAPES = [(128, 16, 8), (64, 32, 16), (32, 64, 32), (16, 128, 64),
          (8, 128, 64), (4, 128, 64), (2, 128, 64)]
BATCH = int(os.environ.get("BN_BATCH", "64"))
CLIP = int(os.environ.get("BN_CLIP", "64"))


def make_params(rng, c, d, dtype):
    f32 = jnp.float32
    return dict(
        w_down=jnp.asarray(rng.normal(0, 0.3, (1, 1, c, d)), f32),
        b_down=jnp.asarray(rng.normal(0, 0.1, (d,)), f32),
        a_mid=jnp.asarray(rng.uniform(0.1, 0.5, (d,)), f32),
        w_dw=jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, d)), f32),
        b_dw=jnp.asarray(rng.normal(0, 0.1, (d,)), f32),
        w_up=jnp.asarray(rng.normal(0, 0.3, (1, 1, d, c)), f32),
        b_up=jnp.asarray(rng.normal(0, 0.1, (c,)), f32),
        a_out=jnp.asarray(rng.uniform(0.1, 0.5, (c,)), f32),
    )


def xla_unit(p, x, dtype):
    dn = ("NCHW", "HWIO", "NCHW")
    f32 = jnp.float32
    z = jax.lax.conv_general_dilated(
        x, p["w_down"].astype(dtype), (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=f32) + p["b_down"].reshape(-1, 1, 1)
    z = jnp.where(z >= 0, z, z * p["a_mid"].reshape(-1, 1, 1)).astype(dtype)
    d = p["w_dw"].shape[3]
    z = jax.lax.conv_general_dilated(
        z, p["w_dw"].astype(dtype), (1, 1), "SAME", feature_group_count=d,
        dimension_numbers=dn,
        preferred_element_type=f32) + p["b_dw"].reshape(-1, 1, 1)
    z = jax.lax.conv_general_dilated(
        z.astype(dtype), p["w_up"].astype(dtype), (1, 1), "VALID",
        dimension_numbers=dn,
        preferred_element_type=f32) + p["b_up"].reshape(-1, 1, 1)
    y = z + x.astype(f32)
    y = jnp.where(y >= 0, y, y * p["a_out"].reshape(-1, 1, 1))
    return y.astype(dtype)


def pallas_unit(bk, p, x, dtype):
    wd, wu = bk.pack_bottleneck_weights(p["w_down"], p["w_dw"], p["w_up"],
                                        dtype=dtype)
    bu = p["b_up"] + p["w_up"][0, 0].T.astype(jnp.float32) @ p["b_dw"]
    return bk.bottleneck_s1(x, x, wd, p["b_down"], p["a_mid"], wu, bu,
                            p["a_out"], last_act="prelu")


def scan_time(step, x0, clip, reps=3):
    def body(c, _):
        return step(c), ()
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=clip)[0])
    y = f(x0)
    y.block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f(y).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts) / clip


def main():
    _enable_compile_cache()
    if jax.default_backend() == "tpu":
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        force_sync_dispatch()  # honest timings (utils/axon.py)
    from bp_from_video_tpu.pallas import block_kernel as bk
    dtype = jnp.bfloat16
    sel = os.environ.get("BN_SHAPES")
    shapes = ([SHAPES[int(i)] for i in sel.split(",")] if sel else SHAPES)
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    for h, c, d in shapes:
        p = make_params(rng, c, d, dtype)
        x = jnp.asarray(rng.standard_normal((BATCH, c, h, h)), dtype)
        want = xla_unit(p, x, dtype)
        t0 = time.perf_counter()
        got = pallas_unit(bk, p, x, dtype)
        got.block_until_ready()
        dt = time.perf_counter() - t0
        w32, g32 = (np.asarray(want, np.float32), np.asarray(got, np.float32))
        scale = np.abs(w32).max() + 1e-6
        err = np.abs(w32 - g32).max() / scale
        print(f"[{h:3d}^2 C{c:3d} D{d:2d}] compile+run {dt:6.1f}s "
              f"rel-err {err:.2e} {'OK' if err < 2e-2 else 'FAIL'}",
              flush=True)
        # Chained stage timing (4 units, like the real trunk stages).
        wd, wu = bk.pack_bottleneck_weights(p["w_down"], p["w_dw"],
                                            p["w_up"], dtype=dtype)
        bu = p["b_up"] + p["w_up"][0, 0].T.astype(jnp.float32) @ p["b_dw"]

        def step_pl(xc):
            y = xc
            for _ in range(4):
                y = bk.bottleneck_s1(y, y, wd, p["b_down"], p["a_mid"],
                                     wu, bu, p["a_out"], last_act="prelu")
            return y

        def step_xla(xc):
            y = xc
            for _ in range(4):
                y = xla_unit(p, y, dtype)
            return y

        wds = jnp.stack([wd] * 4)
        wus = jnp.stack([wu] * 4)
        st = lambda v: jnp.stack([v] * 4)

        def step_chain(xc):
            return bk.bottleneck_chain(xc, wds, st(p["b_down"]),
                                       st(p["a_mid"]), wus, st(bu),
                                       st(p["a_out"]), last_act="prelu")

        t_pl = scan_time(step_pl, x, CLIP)
        t_ch = scan_time(step_chain, x, CLIP)
        t_x = scan_time(step_xla, x, CLIP)
        print(f"    4-unit stage: pallas {t_pl * 1e3:7.3f} ms  "
              f"chain {t_ch * 1e3:7.3f} ms  "
              f"xla {t_x * 1e3:7.3f} ms  chain-speedup {t_x / t_ch:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
