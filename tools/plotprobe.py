"""A/B probe: strip-wise vs full-canvas plot rasterization on hardware.

Round 4 rewrote plotter.rasterize_plots to draw each graph on a local
strip (the full-canvas masks paid ~3x their live pixels), but the bench
multistream row moved 2,573 -> 2,374 — inside or outside strip blame?
This probe times BOTH formulations in one process at composite
granularity (vmapped over S streams, realistic ring shapes, carried
scan, honest sync dispatch) so the strip question is settled by a
direct measurement instead of cross-run bench deltas.

Usage: python tools/plotprobe.py          (TPU)
       BENCH_PLATFORM=cpu S=2 REPS=2 python tools/plotprobe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # noqa: E402


def old_rasterize(cfg, groups, sig_colors):
    """The pre-strip (round 3) formulation, verbatim semantics: per-color
    full-canvas union masks + one composite."""
    import jax.numpy as jnp

    from bp_from_video_tpu.render import colors as C
    from bp_from_video_tpu.render import plotter as P
    from bp_from_video_tpu.render.overlay import composite

    w, h = cfg.window_size
    layouts = P.graph_layouts(cfg)
    ticks = []
    grid_m = jnp.zeros((h, w), jnp.float32)
    axes_m = jnp.zeros((h, w), jnp.float32)
    trace_ms = [jnp.zeros((h, w), jnp.float32)
                for _ in range(len(sig_colors))]
    for gl, (xs, ys, rng4) in zip(layouts, groups):
        min_x, max_x, min_y, max_y = P._resolve_range(
            rng4, cfg.graph_default_range)
        vvals, vn = P._vlines(min_x, max_x)
        vcols = (vvals - min_x) / (max_x - min_x) * gl.width + gl.origin_x
        vok = jnp.arange(P.MAX_VLINES) < vn
        grid_m = jnp.maximum(grid_m, P._vline_mask(gl, vcols, vok, h, w))
        axes = P._border(gl, h, w)
        zero_col = -min_x / (max_x - min_x) * gl.width + gl.origin_x
        on_x = (min_x <= 0.0) & (0.0 <= max_x)
        axes = axes + P._vline_mask(gl, zero_col[None], on_x[None], h, w)
        zero_row = max_y / (max_y - min_y) * gl.height + gl.origin_y
        on_y = (min_y <= 0.0) & (0.0 <= max_y)
        axes = axes + P._hline_mask(gl, zero_row, on_y, h, w)
        axes_m = jnp.maximum(axes_m, jnp.clip(axes, 0.0, 1.0))
        for s in range(xs.shape[0]):
            m = P.trace_mask(gl, xs[s], ys[s], min_x, max_x, min_y, max_y,
                             h, w)
            i = s % len(sig_colors)
            trace_ms[i] = jnp.maximum(trace_ms[i], m)
        ticks.append(P.PlotTicks(vcols, vvals, vn,
                                 jnp.stack([min_x, max_x]),
                                 jnp.stack([min_y, max_y])))
    canvas = jnp.full((h, w, 3), 255.0, jnp.float32)
    layers = ([(grid_m, C.LIGHT_GRAY), (axes_m, C.BLACK)]
              + list(zip(trace_ms, sig_colors)))
    canvas = composite(canvas, layers)
    return jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8), ticks


def main():
    if not os.environ.get("BENCH_PLATFORM"):
        from bp_from_video_tpu.utils.tunnel import wait_for_tpu
        if not wait_for_tpu():
            print("plotprobe: tunnel unreachable", file=sys.stderr)
            sys.exit(3)
    import functools

    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    _enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() == "tpu":
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        force_sync_dispatch()

    from bp_from_video_tpu.config import DrawConfig
    from bp_from_video_tpu.render import plotter as P

    s = int(os.environ.get("S", "8"))
    n = 250
    reps = int(os.environ.get("REPS", "4"))
    clip = int(os.environ.get("CLIP", "64"))
    cfg = DrawConfig()
    colors = ((31, 119, 180), (255, 127, 14))

    def groups_at(key):
        ks = jax.random.split(key, 6)
        mk = lambda k, lo, hi: jax.random.uniform(k, (2, n), jnp.float32,
                                                  lo, hi)
        xs = jnp.cumsum(jnp.abs(mk(ks[0], 0.02, 0.05)), axis=1)
        return [(xs, mk(ks[1], -1.0, 1.0),
                 jnp.asarray([0.0, 8.0, -1.0, 1.0])),
                (mk(ks[2], 0.8, 4.0).sort(axis=1), mk(ks[3], 0.0, 1.0),
                 jnp.asarray([0.8, 4.0, 0.0, 1.0])),
                (mk(ks[4], -0.5, 0.5).sort(axis=1), mk(ks[5], -1.0, 1.0),
                 jnp.asarray([-0.5, 0.5, -1.0, 1.0]))]

    def run_one(raster, key):
        groups = groups_at(key)
        img, _ = raster(cfg, groups, colors)
        return jnp.sum(img, dtype=jnp.float32)

    def timed(name, raster):
        @jax.jit
        def scan(keys):
            def body(c, k):
                return c + jax.vmap(functools.partial(run_one, raster))(
                    jax.random.split(k, s)).sum(), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return acc

        keys = jax.random.split(jax.random.key(0), clip)
        jax.block_until_ready(scan(keys))  # compile
        best = np.inf
        for r in range(reps):
            keys = jax.random.split(jax.random.key(r + 1), clip)
            t0 = time.perf_counter()
            jax.block_until_ready(scan(keys))
            best = min(best, (time.perf_counter() - t0) / clip)
        print(f"{name:>14}: {best * 1000:.3f} ms/step ({s} streams)",
              flush=True)
        return best

    t_new = timed("strips", P.rasterize_plots)
    t_old = timed("full-canvas", old_rasterize)
    print(f"strips/full ratio: {t_new / t_old:.3f}", flush=True)


if __name__ == "__main__":
    main()
