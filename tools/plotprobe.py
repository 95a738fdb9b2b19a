"""A/B probe: strip-wise vs full-canvas plot rasterization on hardware.

Round 4 tried drawing each graph on a local strip (the full-canvas
masks pay ~3x their live pixels), and the bench multistream row moved
2,573 -> 2,374.  This probe times BOTH formulations in one process at
composite granularity (vmapped over S streams, realistic ring shapes,
carried scan, honest sync dispatch): measured on the chip, strips are
1.38x SLOWER (1.032 vs 0.748 ms per 8-stream step) though 2.8x faster
on CPU — so the strip rewrite was REVERTED from render/plotter.py and
its implementation lives on only here, as the probe's "strips" arm.

Usage: python tools/plotprobe.py          (TPU)
       BENCH_PLATFORM=cpu S=2 REPS=2 python tools/plotprobe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # noqa: E402


def strip_rasterize(cfg, groups, sig_colors):
    """The round-4 STRIP formulation (kept here verbatim after it was
    reverted from render/plotter.py): each graph rasterized on a local
    [gh+1, gw+1] strip, composited per strip, placed by slice-assign.
    The shipped implementation is the full-canvas one this probe
    measured it against."""
    import jax.numpy as jnp

    from bp_from_video_tpu.render import colors as C
    from bp_from_video_tpu.render import plotter as P
    from bp_from_video_tpu.render.overlay import composite

    w, h = cfg.window_size
    layouts = P.graph_layouts(cfg)
    ticks = []
    strips = []
    for gl, (xs, ys, rng4) in zip(layouts, groups):
        min_x, max_x, min_y, max_y = P._resolve_range(
            rng4, cfg.graph_default_range)
        sh, sw = gl.height + 1, gl.width + 1
        local = P.GraphLayout(0, 0, gl.width, gl.height)
        vvals, vn = P._vlines(min_x, max_x)
        vcols_l = (vvals - min_x) / (max_x - min_x) * gl.width
        vok = jnp.arange(P.MAX_VLINES) < vn
        grid_m = P._vline_mask(local, vcols_l, vok, sh, sw)
        axes = P._border(local, sh, sw)
        zero_col = -min_x / (max_x - min_x) * gl.width
        on_x = (min_x <= 0.0) & (0.0 <= max_x)
        axes = axes + P._vline_mask(local, zero_col[None], on_x[None],
                                    sh, sw)
        zero_row = max_y / (max_y - min_y) * gl.height
        on_y = (min_y <= 0.0) & (0.0 <= max_y)
        axes = axes + P._hline_mask(local, zero_row, on_y, sh, sw)
        axes_m = jnp.clip(axes, 0.0, 1.0)
        trace_ms = [jnp.zeros((sh, sw), jnp.float32)
                    for _ in range(min(len(sig_colors), xs.shape[0]))]
        for s in range(xs.shape[0]):
            m = P.trace_mask(local, xs[s], ys[s], min_x, max_x, min_y,
                             max_y, sh, sw)
            i = s % len(sig_colors)
            trace_ms[i] = jnp.maximum(trace_ms[i], m)
        strip = composite(
            jnp.full((sh, sw, 3), 255.0, jnp.float32),
            [(grid_m, C.LIGHT_GRAY), (axes_m, C.BLACK)]
            + [(m, sig_colors[i]) for i, m in enumerate(trace_ms)])
        strips.append(strip)
        ticks.append(P.PlotTicks(vcols_l + gl.origin_x, vvals, vn,
                                 jnp.stack([min_x, max_x]),
                                 jnp.stack([min_y, max_y])))
    canvas = jnp.full((h, w, 3), 255.0, jnp.float32)
    for gl, strip in zip(layouts, strips):
        canvas = canvas.at[gl.origin_y:gl.origin_y + gl.height + 1,
                           gl.origin_x:gl.origin_x + gl.width + 1].set(
                               strip)
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

    t_full = timed("full-canvas", P.rasterize_plots)   # shipped
    t_strip = timed("strips", strip_rasterize)
    print(f"strips/full ratio: {t_strip / t_full:.3f}", flush=True)


if __name__ == "__main__":
    main()
