"""On-device signal-plot rasterization (reference drawer.py:166-240 rebuilt
as tensor ops).

The reference software-renders three stacked graphs (processed signals,
spectra, correlations) with OpenCV polylines on the host.  Here the whole
canvas — borders, magnitude-scaled gridlines, zero axes, and signal traces —
is rasterized on the TPU as branchless masks; only text (tick/corner labels)
is stamped host-side by the display shell, using the tick positions the
kernel returns.

Trace rasterization: signal x-axes are monotone (time / frequency / lag), so
each polyline is single-valued per canvas column.  Column c's value is the
linear interpolation of the data at that column, and the stroke is the
vertical span between adjacent columns' values — the polyline becomes two
[columns]-wide vector ops instead of per-segment line drawing.  NaN gaps in
the data blank their columns (the reference splits polylines on NaN,
drawer.py:222-226).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bp_from_video_tpu.config import DrawConfig
from bp_from_video_tpu.ops import signal as sig
from bp_from_video_tpu.render import colors as C

Array = jax.Array

MAX_VLINES = 32


class GraphLayout(NamedTuple):
    origin_x: int
    origin_y: int
    width: int
    height: int


def graph_layouts(cfg: DrawConfig) -> list[GraphLayout]:
    """Stacked-graph layout (reference drawer.py:71-76)."""
    w, h = cfg.window_size
    mx, my = cfg.window_margins
    gw = w - 2 * mx
    gh = (h - (cfg.num_plots + 1) * my) // cfg.num_plots
    return [GraphLayout(mx, i * gh + (i + 1) * my, gw, gh)
            for i in range(cfg.num_plots)]


class PlotTicks(NamedTuple):
    """Per-graph tick data for host-side label stamping."""

    vline_px: Array    # [MAX_VLINES] canvas x of each gridline
    vline_val: Array   # [MAX_VLINES] data value of each gridline
    vline_n: Array     # scalar count
    range_x: Array     # [2]
    range_y: Array     # [2]


def _resolve_range(rng4: Array, default: tuple[float, float]
                   ) -> tuple[Array, Array, Array, Array]:
    """Auto range unless non-finite -> default (reference drawer.py:233-235)."""
    d0, d1 = default
    ok_x = jnp.isfinite(rng4[0]) & jnp.isfinite(rng4[1])
    ok_y = jnp.isfinite(rng4[2]) & jnp.isfinite(rng4[3])
    min_x = jnp.where(ok_x, rng4[0], d0)
    max_x = jnp.where(ok_x, rng4[1], d1)
    min_y = jnp.where(ok_y, rng4[2], d0)
    max_y = jnp.where(ok_y, rng4[3], d1)
    span = jnp.maximum(max_x - min_x, 1e-9)
    spany = jnp.maximum(max_y - min_y, 1e-9)
    return min_x, min_x + span, min_y, min_y + spany


def _vlines(min_x: Array, max_x: Array) -> tuple[Array, Array]:
    """Gridline positions with order-of-magnitude spacing (reference
    drawer.py:171-175): values [MAX_VLINES], count."""
    span = jnp.maximum(max_x - min_x, 1e-9)
    order_mag = 10.0 ** jnp.floor(jnp.minimum(jnp.log10(span), 1.0))
    dist = jnp.where(span / (order_mag / 2.0) < 10.0, order_mag / 2.0,
                     order_mag)
    lower = jnp.ceil(min_x / dist) * dist
    upper = jnp.ceil(max_x / dist) * dist
    k = jnp.arange(MAX_VLINES, dtype=jnp.float32)
    vals = lower + k * dist
    n = jnp.clip(jnp.ceil((upper - lower) / dist), 0,
                 MAX_VLINES).astype(jnp.int32)
    return vals, n


def _border(gl: GraphLayout, h: int, w: int) -> Array:
    i = jnp.arange(h, dtype=jnp.float32)[:, None]
    j = jnp.arange(w, dtype=jnp.float32)[None, :]
    in_x = (j >= gl.origin_x) & (j <= gl.origin_x + gl.width)
    in_y = (i >= gl.origin_y) & (i <= gl.origin_y + gl.height)
    on_x = (j == gl.origin_x) | (j == gl.origin_x + gl.width)
    on_y = (i == gl.origin_y) | (i == gl.origin_y + gl.height)
    return ((in_x & in_y) & (on_x | on_y)).astype(jnp.float32)


def _vline_mask(gl: GraphLayout, cols: Array, valid: Array, h: int, w: int
                ) -> Array:
    """Vertical lines spanning the graph at canvas columns ``cols``."""
    i = jnp.arange(h, dtype=jnp.float32)[:, None]
    j = jnp.arange(w, dtype=jnp.float32)[None, :]
    col_hit = jnp.any(
        (j[None] == jnp.round(cols)[:, None, None]) & valid[:, None, None],
        axis=0)
    in_y = (i >= gl.origin_y) & (i <= gl.origin_y + gl.height)
    return (col_hit & in_y).astype(jnp.float32)


def _hline_mask(gl: GraphLayout, row: Array, on: Array, h: int, w: int
                ) -> Array:
    i = jnp.arange(h, dtype=jnp.float32)[:, None]
    j = jnp.arange(w, dtype=jnp.float32)[None, :]
    in_x = (j >= gl.origin_x) & (j <= gl.origin_x + gl.width)
    return ((i == jnp.round(row)) & in_x & on).astype(jnp.float32)


def _trace_cols(x: Array, y: Array, min_x: Array, max_x: Array,
                gw: int) -> tuple[Array, Array]:
    """Interpolate the (x, y) series at each of gw graph columns.

    Returns (vals [gw], col_ok [gw]).  Columns outside the data's x-extent,
    or bridging a NaN gap in the original series, are masked out.

    Gather-free: searchsorted + fancy-indexing are element-serial on TPU
    (measured: the column math was ~95% of the whole on-device plot cost).
    Each column's bracketing segment is a one-hot row of the [gw, n]
    bracket matrix M[c, i] = (x_i <= g_c < x_{i+1}), so every per-column
    quantity is one masked contraction ``M @ v`` — VPU/MXU work instead of
    serial address math."""
    n = x.shape[0]
    w = sig.valid_x(x) & sig.valid_y(y)
    # One 3-column compaction sort instead of separate x / (y, idx) sorts.
    cols3 = sig.compact(w, jnp.stack(
        [x, y, jnp.arange(n, dtype=jnp.float32)], 1))
    cx = sig.Compacted(cols3.values[:, 0], cols3.count)
    cy, cidx = cols3.values[:, 1], cols3.values[:, 2]
    k = cx.count
    grid = min_x + (jnp.arange(gw, dtype=jnp.float32) + 0.5) / gw \
        * (max_x - min_x)
    # Segment endpoints (compacted order): segment i spans [x0s_i, x1s_i).
    # At most one segment per column, so M-contractions are exact selections.
    mf, x0s, x1s = sig.bracket_matrix(cx.values, k, grid)
    y1s = jnp.concatenate([cy[1:], cy[-1:]])
    gap_s = (jnp.concatenate([cidx[1:], cidx[-1:]]) - cidx) > 1.5
    x0 = sig.selmm(mf, sig.zero_infs(x0s))
    x1 = sig.selmm(mf, sig.zero_infs(x1s))
    y0 = sig.selmm(mf, cy)
    y1 = sig.selmm(mf, y1s)
    gap_c = sig.selmm(mf, gap_s.astype(jnp.float32)) > 0.5
    t = jnp.clip((grid - x0) / jnp.where(x1 == x0, 1.0, x1 - x0), 0.0, 1.0)
    vals = y0 + t * (y1 - y0)
    first = x0s[0]
    last = sig.take_at(cx.values, -1, k)
    y_last = sig.take_at(cy, -1, k)
    # grid == last hits no segment (half-open brackets): clamp to the last
    # sample — the searchsorted formulation's j = k-2, t -> 1 path, which
    # also inherits the FINAL segment's gap flag there.
    at_end = grid >= last
    gap_end = sig.take_at(gap_s, -2, k) & (k >= 2)
    vals = jnp.where(at_end, y_last, vals)
    gap_c = jnp.where(at_end, gap_end, gap_c)
    col_ok = ((grid >= first) & (grid <= last) & ~gap_c & (k >= 2)
              & jnp.isfinite(vals))
    return vals, col_ok


def trace_mask(gl: GraphLayout, x: Array, y: Array, min_x: Array,
               max_x: Array, min_y: Array, max_y: Array, h: int, w: int
               ) -> Array:
    """[H, W] stroke mask of one signal's polyline inside the graph."""
    vals, col_ok = _trace_cols(x, y, min_x, max_x, gl.width)
    # Data -> graph rows (y inverted, reference drawer.py:217).
    rows = (vals - max_y) / jnp.where(min_y == max_y, -1.0, min_y - max_y) \
        * gl.height + gl.origin_y
    rows = jnp.clip(rows, gl.origin_y, gl.origin_y + gl.height)
    # Vertical span between adjacent columns = connected stroke.
    prev = jnp.concatenate([rows[:1], rows[:-1]])
    prev_ok = jnp.concatenate([col_ok[:1], col_ok[:-1]])
    lo = jnp.where(prev_ok, jnp.minimum(rows, prev), rows)
    hi = jnp.where(prev_ok, jnp.maximum(rows, prev), rows)
    i = jnp.arange(h, dtype=jnp.float32)[:, None]
    # Graph-column vectors placed at their STATIC canvas offset (origin_x
    # is a Python int) — a pad, not the element-serial gather `lo[ci]`.
    place = lambda v, fill: jnp.full((w,), fill, v.dtype) \
        .at[gl.origin_x:gl.origin_x + gl.width].set(v)
    lo_row = place(jnp.floor(lo), 0.0)
    hi_row = place(jnp.ceil(hi), -1.0)
    ok_row = place(col_ok, False)
    stroke = (i >= lo_row) & (i <= hi_row) & ok_row[None, :]
    return stroke.astype(jnp.float32)


def rasterize_plots(cfg: DrawConfig, groups, sig_colors) -> tuple[Array, list]:
    """Render the full plot canvas.

    groups: [(xs [S, L], ys [S, L], range4 [4])] — one per graph row
    (processed, spectra, correlations; reference drawer.py:231).
    Returns (uint8 RGB canvas [Hp, Wp, 3], [PlotTicks] per graph).
    """
    w, h = cfg.window_size
    layouts = graph_layouts(cfg)
    ticks = []
    # Collect one UNION mask per color across all graphs (the graphs are
    # disjoint canvas regions, so unioning is exact), then composite the
    # whole canvas in one fused select pass — sequential full-canvas paints
    # re-write [H, W, 3] floats once per layer per graph, which dominates
    # the per-stream render cost (overlay.composite docstring).
    #
    # MEASURED DEAD END (round 4, tools/plotprobe.py on the chip): a
    # strip-wise rewrite — each graph rasterized on its own [gh+1, gw+1]
    # local strip, composited per strip, placed by slice-assign — is 2.8x
    # FASTER on CPU but 1.38x SLOWER on TPU (1.032 vs 0.748 ms per
    # 8-stream step): the full-canvas iota masks are fused vector math,
    # while strips pay three composites plus three full-canvas
    # dynamic-update-slices at non-lane-aligned shapes.  Keep full-canvas.
    grid_m = jnp.zeros((h, w), jnp.float32)
    axes_m = jnp.zeros((h, w), jnp.float32)
    trace_ms = [jnp.zeros((h, w), jnp.float32)
                for _ in range(len(sig_colors))]
    for gl, (xs, ys, rng4) in zip(layouts, groups):
        min_x, max_x, min_y, max_y = _resolve_range(
            rng4, cfg.graph_default_range)
        # Gridlines (light gray) under everything.
        vvals, vn = _vlines(min_x, max_x)
        vcols = (vvals - min_x) / (max_x - min_x) * gl.width + gl.origin_x
        vok = jnp.arange(MAX_VLINES) < vn
        grid_m = jnp.maximum(grid_m, _vline_mask(gl, vcols, vok, h, w))
        # Border + zero axes (black).
        axes = _border(gl, h, w)
        # x is NOT screen-inverted (unlike y below): col(v) = (v - min_x).
        zero_col = -min_x / (max_x - min_x) * gl.width + gl.origin_x
        on_x = (min_x <= 0.0) & (0.0 <= max_x)
        axes = axes + _vline_mask(gl, zero_col[None], on_x[None], h, w)
        zero_row = max_y / (max_y - min_y) * gl.height + gl.origin_y
        on_y = (min_y <= 0.0) & (0.0 <= max_y)
        axes = axes + _hline_mask(gl, zero_row, on_y, h, w)
        axes_m = jnp.maximum(axes_m, jnp.clip(axes, 0.0, 1.0))
        # Traces.
        for s in range(xs.shape[0]):
            m = trace_mask(gl, xs[s], ys[s], min_x, max_x, min_y, max_y,
                           h, w)
            i = s % len(sig_colors)
            trace_ms[i] = jnp.maximum(trace_ms[i], m)
        ticks.append(PlotTicks(vcols, vvals, vn,
                               jnp.stack([min_x, max_x]),
                               jnp.stack([min_y, max_y])))
    from bp_from_video_tpu.render.overlay import composite
    canvas = jnp.full((h, w, 3), 255.0, jnp.float32)
    layers = ([(grid_m, C.LIGHT_GRAY), (axes_m, C.BLACK)]
              + list(zip(trace_ms, sig_colors)))
    canvas = composite(canvas, layers)
    return jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8), ticks
