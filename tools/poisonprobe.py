"""Bisect the fused-trunk process poisoning (VERDICT r2 item #1).

Round-2 finding (README "Round-2 session-4 correction"): constructing a
runner with ``fused_trunk=True`` degrades every subsequently compiled
executable in the process — the DSP scan goes 0.006 -> ~2.8 ms/step and
per-dispatch ~0.1 -> ~43 ms.  This probe isolates the ingredient.

Usage:  python tools/poisonprobe.py SCENARIO
Scenarios (each runs in its own fresh process):
  none          baseline — measure, no-op, measure again
  pack          block_kernel weight packing only (device_get + bf16 asarray)
  compose       compose_block_params eager ops only
  prep          block_kernel.prepare_trunk on stand-in landmark params
  compile_bn    tc.compile_tflite(fuse_bn=True, batch_flexible=True) on the
                real face-mesh blob (construction only, nothing called)
  run_block     compile+run dense_s2_block once
  run_bn        compile+run bottleneck_s1 once
  run_chain     compile+run bottleneck_chain once
  runner_standin  InferenceRunner construction, hand stand-in only, fused_trunk
  runner_real   InferenceRunner construction, real face weights, fused_trunk

For each scenario it prints one JSON line with before/after timings of
(a) per-dispatch latency of a PRE-compiled trivial jit,
(b) per-dispatch latency of a POST-scenario newly compiled trivial jit,
(c) a 256-step trivial scan (compiled before and recompiled after).
Distinguishing (a) from (b) tells compile-option latch vs client latch.
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache (same as bench.py): remote-tunnel compiles are
# minutes-long without it.  The poisoning under study is a RUNTIME dispatch
# degradation, reproduced in round 2 with this cache enabled (bench.py), so
# caching does not mask it.
_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_cache = os.path.join(_here, ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _dispatch_ms(fn, x, n=12):
    """Fixed-input per-call latency — DEDUPE-SENSITIVE on axon (the client
    dedupes repeated identical executions; see verify SKILL.md TIMING TRAP).
    Reads ~0.03 ms when dedupe is active, ~40+ ms when every call really
    crosses the tunnel."""
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(statistics.median(ts), 3)


def _dispatch_varied_ms(fn, x, n=8):
    """Varied-input per-call latency — the honest tunnel dispatch cost
    (each call is a distinct execution, never deduped)."""
    ts = []
    for i in range(n):
        xi = jax.block_until_ready(x + float(i + 1))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(xi))
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(statistics.median(ts), 3)


def _scan_ms(fn, x, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(min(ts), 3)


def make_trivial(tag: float):
    # tag makes each compile distinct (avoid jit/persistent-cache reuse)
    @jax.jit
    def f(x):
        return x * 1.0000001 + tag
    return f


def make_scan(tag: float):
    @jax.jit
    def f(x):
        def body(c, _):
            return c * 0.999 + tag * 1e-9, c.sum()
        c, ys = jax.lax.scan(body, x, None, length=256)
        return ys
    return f


def scenario_none():
    pass


def _standin_params():
    from bp_from_video_tpu.models import blaze
    return jax.tree.map(lambda a: a.astype(jnp.float32),
                        blaze.init_blaze_landmark(0, 224, 63))


def scenario_pack():
    from bp_from_video_tpu.pallas import block_kernel
    p = _standin_params()
    w, b = block_kernel.compose_block_params(p["b1"])
    # device_get + transposed-numpy bf16 asarray — the pack path
    block_kernel.pack_block_weights(w, cin=w.shape[2])


def scenario_compose():
    from bp_from_video_tpu.pallas import block_kernel
    p = _standin_params()
    w, b = block_kernel.compose_block_params(p["b1"])
    jax.block_until_ready((w, b))


def scenario_prep():
    from bp_from_video_tpu.pallas import block_kernel
    block_kernel.prepare_trunk(_standin_params())


def _face_blob():
    import zipfile, io
    task = "/root/reference/models/face_landmarker.task"
    with zipfile.ZipFile(task) as z:
        return z.read("face_landmarks_detector.tflite")


def scenario_compile_bn():
    from bp_from_video_tpu.models import tflite_compiler as tc
    fn, params = tc.compile_tflite(
        _face_blob(), jnp.bfloat16, layout="NCHW", planar_inputs=True,
        fuse_bn=True, fuse_bn_min_hw=96, batch_flexible=True)


def scenario_run_block():
    from bp_from_video_tpu.pallas import block_kernel
    p = _standin_params()
    w, b = block_kernel.compose_block_params(p["b1"])
    wmat, wspec = block_kernel.pack_block_weights(w, cin=w.shape[2])
    x = jnp.ones((4, 4 * w.shape[2], 56, 56), jnp.bfloat16)
    y = block_kernel.dense_s2_block(x, wmat, wspec, b, None,
                                    cin=w.shape[2], resid=True)
    jax.block_until_ready(y)


def scenario_kernel_only():
    """dense_s2_block with host-built weights: isolates the BLOCK KERNEL
    from the eager-init storm run_block also performed."""
    from bp_from_video_tpu.pallas import block_kernel
    rng = np.random.default_rng(0)
    cin, cout = 24, 48
    wmat = jnp.asarray(rng.normal(0, 0.05, (cout, 9 * cin)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.05, (cout,)), jnp.float32)
    x = jnp.ones((4, 4 * cin, 56, 56), jnp.bfloat16)
    y = block_kernel.dense_s2_block(x, wmat, "sliced", b, None,
                                    cin=cin, resid=True)
    jax.block_until_ready(y)


def scenario_kernel_expanded():
    """dense_s2_block in the 'expanded' stem flavor (cin=3, resid=False)."""
    from bp_from_video_tpu.pallas import block_kernel
    rng = np.random.default_rng(0)
    cin, cout = 3, 24
    pad = -(-4 * cin // 8) * 8
    wmat = jnp.asarray(rng.normal(0, 0.05, (cout, 4 * pad)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.05, (cout,)), jnp.float32)
    x = jnp.ones((4, 4 * cin, 56, 56), jnp.bfloat16)
    y = block_kernel.dense_s2_block(x, wmat, "expanded", b, None,
                                    cin=cin, resid=False)
    jax.block_until_ready(y)


def scenario_storm():
    """The eager-init storm ALONE (init_blaze_landmark on-device + compose +
    pack, no Pallas kernel call) — run_block's other half."""
    from bp_from_video_tpu.pallas import block_kernel
    p = _standin_params()
    w, b = block_kernel.compose_block_params(p["b1"])
    block_kernel.pack_block_weights(w, cin=w.shape[2])


def _np_block(cin, cout, rng):
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.05, s), jnp.float32)
    return {"dw": {"w": mk(3, 3, 1, cin), "b": mk(cin)},
            "pw": {"w": mk(1, 1, cin, cout), "b": mk(cout)}}


def scenario_prep_cheap():
    """prepare_trunk's exact work (compose eager ops + device_get + bf16
    transposed upload, x4 blocks + stem pack) on host-built params —
    no init storm."""
    from bp_from_video_tpu.pallas import block_kernel
    rng = np.random.default_rng(0)
    params = {"b1": _np_block(24, 48, rng), "b2": _np_block(48, 96, rng),
              "b3": _np_block(96, 96, rng), "b4": _np_block(96, 192, rng),
              "stem": {"w": jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, 24)),
                                        jnp.float32)}}
    arrays, specs = block_kernel.prepare_trunk(params)
    block_kernel.pack_block_weights(params["stem"]["w"], cin=3)
    jax.block_until_ready(arrays)


def scenario_compose_cheap():
    """compose_block_params eager ops only (one block, np-built params)."""
    from bp_from_video_tpu.pallas import block_kernel
    rng = np.random.default_rng(0)
    w, b = block_kernel.compose_block_params(_np_block(24, 48, rng))
    jax.block_until_ready((w, b))


def scenario_upload_t():
    """Transposed-numpy bf16 uploads only (pack_block_weights' output leg)."""
    rng = np.random.default_rng(0)
    for co, k in ((48, 216), (96, 432), (96, 864), (192, 864)):
        rows = rng.normal(0, 0.05, (k, co)).astype(np.float32)
        jax.block_until_ready(jnp.asarray(rows.T, jnp.bfloat16))


def scenario_prep_traced():
    """prep_cheap with per-op timings printed to stderr — find WHICH op
    stalls/poisons."""
    from bp_from_video_tpu.pallas import block_kernel
    rng = np.random.default_rng(0)
    params = {"b1": _np_block(24, 48, rng), "b2": _np_block(48, 96, rng),
              "b3": _np_block(96, 96, rng), "b4": _np_block(96, 192, rng)}
    x = jnp.ones((16, 16), jnp.float32)
    probe = make_trivial(0.33)

    def mark(tag):
        t0 = time.perf_counter()
        jax.block_until_ready(probe(x))
        print(f"  [{tag}] probe_dispatch={1e3*(time.perf_counter()-t0):.2f}ms",
              file=sys.stderr, flush=True)

    mark("start")
    for name in ("b1", "b2", "b3", "b4"):
        t0 = time.perf_counter()
        w, b = block_kernel.compose_block_params(params[name])
        jax.block_until_ready((w, b))
        t1 = time.perf_counter()
        wmat, wspec = block_kernel.pack_block_weights(w, cin=w.shape[2])
        jax.block_until_ready(wmat)
        t2 = time.perf_counter()
        print(f"  {name}: compose={t1-t0:.2f}s pack={t2-t1:.2f}s",
              file=sys.stderr, flush=True)
        mark(name)


def scenario_d2h():
    """Device-to-host transfers alone."""
    for i in range(8):
        x = jnp.full((48, 216), float(i), jnp.float32)
        np.asarray(jax.device_get(x))


def scenario_rng_storm():
    """Eager jax.random ops of distinct shapes (the init storm's op class)."""
    key = jax.random.PRNGKey(0)
    for i in range(24):
        k, key = jax.random.split(key)
        jax.block_until_ready(jax.random.normal(k, (8 + i, 16)))


def scenario_exe_storm():
    """Many DISTINCT compiled executables (client/server executable-count
    pressure), each dispatched once."""
    x = jnp.ones((32, 32), jnp.float32)
    for i in range(80):
        f = jax.jit(lambda v, c=float(i): v * (1.0 + c * 1e-6) + c)
        jax.block_until_ready(f(x))


def scenario_run_bn():
    from bp_from_video_tpu.pallas import block_kernel
    c, d, hw = 64, 16, 32
    k = jax.random.key(1)
    wd = jnp.ones((d, c), jnp.bfloat16) * 0.01
    wu = jnp.ones((c, 9 * d), jnp.bfloat16) * 0.01
    x = jnp.ones((4, c, hw, hw), jnp.bfloat16)
    y = block_kernel.bottleneck_s1(
        x, x, wd, jnp.zeros((d,)), jnp.full((d,), 0.1),
        wu, jnp.zeros((c,)), jnp.full((c,), 0.1))
    jax.block_until_ready(y)


def scenario_run_chain():
    from bp_from_video_tpu.pallas import block_kernel
    c, d, hw, u = 64, 16, 16, 4
    wd = jnp.ones((u, d, c), jnp.bfloat16) * 0.01
    wu = jnp.ones((u, c, 9 * d), jnp.bfloat16) * 0.01
    x = jnp.ones((8, c, hw, hw), jnp.bfloat16)
    y = block_kernel.bottleneck_chain(
        x, wd, jnp.zeros((u, d)), jnp.full((u, d), 0.1),
        wu, jnp.zeros((u, c)), jnp.full((u, c), 0.1))
    jax.block_until_ready(y)


def _runner(asset: bool):
    from bp_from_video_tpu.config import InferenceConfig
    from bp_from_video_tpu.models.runner import InferenceRunner
    cfg = InferenceConfig(
        face_detector=False, face_landmarker=asset,
        hand_landmarker=not asset, person_segmenter=False,
        use_pallas=True, fused_stem=True, fused_trunk=True)
    InferenceRunner(cfg, 480, 640, dtype=jnp.bfloat16,
                    asset_dir="/root/reference" if asset else None)


def scenario_runner_standin():
    _runner(asset=False)


def scenario_runner_real():
    _runner(asset=True)


SCENARIOS = {
    "none": scenario_none,
    "pack": scenario_pack,
    "compose": scenario_compose,
    "prep": scenario_prep,
    "compile_bn": scenario_compile_bn,
    "run_block": scenario_run_block,
    "kernel_only": scenario_kernel_only,
    "kernel_expanded": scenario_kernel_expanded,
    "storm": scenario_storm,
    "prep_cheap": scenario_prep_cheap,
    "compose_cheap": scenario_compose_cheap,
    "prep_traced": scenario_prep_traced,
    "upload_t": scenario_upload_t,
    "d2h": scenario_d2h,
    "rng_storm": scenario_rng_storm,
    "exe_storm": scenario_exe_storm,
    "run_bn": scenario_run_bn,
    "run_chain": scenario_run_chain,
    "runner_standin": scenario_runner_standin,
    "runner_real": scenario_runner_real,
}


def main():
    name = sys.argv[1]
    x = jnp.ones((64, 128), jnp.float32)
    pre_triv = make_trivial(0.25)
    pre_scan = make_scan(0.25)
    before = {
        "dispatch_ms": _dispatch_ms(pre_triv, x),
        "dispatch_varied_ms": _dispatch_varied_ms(pre_triv, x),
        "scan_ms": _scan_ms(pre_scan, x),
    }
    t0 = time.perf_counter()
    SCENARIOS[name]()
    scen_s = round(time.perf_counter() - t0, 2)
    after = {
        # (a) the SAME executables compiled before the scenario
        "dispatch_ms_pre_exe": _dispatch_ms(pre_triv, x),
        "dispatch_varied_ms_pre_exe": _dispatch_varied_ms(pre_triv, x),
        "scan_ms_pre_exe": _scan_ms(pre_scan, x),
        # (b) freshly compiled equivalents
        "dispatch_ms_new_exe": _dispatch_ms(make_trivial(0.75), x),
        "scan_ms_new_exe": _scan_ms(make_scan(0.75), x),
    }
    print(json.dumps({"scenario": name, "scenario_s": scen_s,
                      "before": before, "after": after}), flush=True)


if __name__ == "__main__":
    main()
