"""On-device renderer tests: overlay rasterization (boxes, points, ROI
crosses, seg blend, alpha), plot rasterization (borders, gridlines, axes,
traces, NaN gaps), and the host Drawer shell end-to-end (headless)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.config import DrawConfig, EngineConfig, InferenceConfig, SignalConfig
from bp_from_video_tpu.render import colors as C
from bp_from_video_tpu.render import overlay, plotter
from bp_from_video_tpu.render.drawer import Drawer


def test_rect_mask_edges():
    m = np.asarray(overlay.rect_mask(
        jnp.asarray([[2.0, 3.0, 10.0, 8.0]]), 16, 16))
    assert m[3, 2] == 1 and m[3, 10] == 1      # top corners
    assert m[8, 2] == 1 and m[8, 10] == 1      # bottom corners
    assert m[3, 6] == 1 and m[8, 6] == 1       # top/bottom edges
    assert m[5, 2] == 1 and m[5, 10] == 1      # left/right edges
    assert m[5, 6] == 0                        # interior empty
    assert m[0, 0] == 0


def test_rect_mask_nan_invisible():
    m = np.asarray(overlay.rect_mask(
        jnp.full((3, 4), jnp.nan, jnp.float32), 16, 16))
    assert m.sum() == 0


def test_points_mask_radius():
    m = np.asarray(overlay.points_mask(jnp.asarray([[5.0, 7.0]]), 16, 16,
                                       radius=1))
    assert m[7, 5] == 1 and m[6, 4] == 1 and m[8, 6] == 1
    assert m[7, 8] == 0
    assert m.sum() == 9


def test_cross_mask():
    m = np.asarray(overlay.cross_mask(jnp.asarray([[8.0, 8.0]]), 17, 17,
                                      arm=3))
    assert m[8, 5] == 1 and m[8, 11] == 1      # horizontal arm
    assert m[5, 8] == 1 and m[11, 8] == 1      # vertical arm
    assert m[5, 5] == 0


def test_compose_overlay_alpha_and_seg():
    frame = jnp.full((12, 12, 3), 100, jnp.uint8)
    boxes = jnp.asarray([[2.0, 2.0, 9.0, 9.0]])
    pts = jnp.full((1, 1, 2), jnp.nan, jnp.float32)
    rois = jnp.full((1, 6), jnp.nan, jnp.float32)
    seg = jnp.full((12, 12), 0.5, jnp.float32)
    out = np.asarray(overlay.compose_overlay(
        frame, [(boxes, pts, (255, 0, 0))], rois, [(0, 255, 0)], seg,
        alpha=0.75))
    # Away from the box: 0.75*(100*0.5) + 0.25*100 = 62.5 -> 62/63.
    assert abs(int(out[6, 6, 0]) - 62) <= 1
    # On the box edge: 0.75*255 + 0.25*100 = 216 (red channel); green/blue
    # painted to 0 then blended with the raw frame: 0.25*100 = 25.
    assert abs(int(out[2, 6, 0]) - 216) <= 1
    assert abs(int(out[2, 6, 1]) - 25) <= 1


def _ticks_val(r):
    return np.asarray(r)


def test_vlines_spacing():
    vals, n = plotter._vlines(jnp.float32(0.8), jnp.float32(4.0))
    # span 3.2 -> order_mag 1 -> dist 0.5 -> arange(1.0, 4.0, 0.5): the
    # upper bound is exclusive (reference drawer.py:176).
    assert int(n) == 6
    np.testing.assert_allclose(_ticks_val(vals)[:6],
                               [1.0, 1.5, 2.0, 2.5, 3.0, 3.5],
                               atol=1e-5)


def test_rasterize_plots_structure():
    cfg = DrawConfig()
    xs = jnp.tile(jnp.linspace(0.0, 10.0, 50)[None], (1, 1))
    ys = jnp.sin(xs)
    # y range padded so the trace doesn't overwrite the border rows.
    rng4 = jnp.asarray([0.0, 10.0, -2.0, 2.0])
    groups = [(xs, ys, rng4)] * 3
    img, ticks = jax.jit(
        lambda g: plotter.rasterize_plots(cfg, g, [(214, 39, 40)]))(groups)
    img = np.asarray(img)
    assert img.shape == (720, 640, 3)
    assert (img == 255).mean() > 0.5          # mostly white canvas
    layouts = plotter.graph_layouts(cfg)
    for gl in layouts:
        # Border pixels are black.
        assert (img[gl.origin_y, gl.origin_x:gl.origin_x + gl.width]
                == 0).all()
        # The trace color appears inside the graph.
        inner = img[gl.origin_y + 1:gl.origin_y + gl.height,
                    gl.origin_x + 1:gl.origin_x + gl.width]
        red = ((inner[..., 0] == 214) & (inner[..., 1] == 39)).sum()
        assert red > gl.width // 2             # a real trace, not noise
    assert int(ticks[0].vline_n) > 0


def test_trace_nan_gap_blanks_columns():
    cfg = DrawConfig()
    gl = plotter.graph_layouts(cfg)[0]
    x = jnp.linspace(0.0, 10.0, 40)
    y = jnp.ones((40,))
    y = y.at[18:22].set(jnp.nan)
    m = np.asarray(plotter.trace_mask(
        gl, x, y, jnp.float32(0.0), jnp.float32(10.0), jnp.float32(0.0),
        jnp.float32(2.0), 720, 640))
    cols = m.sum(0)[gl.origin_x:gl.origin_x + gl.width]
    # Some columns blanked in the middle (the NaN gap), drawn elsewhere.
    mid = cols[gl.width * 45 // 100:gl.width * 52 // 100]
    assert mid.sum() == 0
    assert cols[: gl.width // 4].sum() > 0
    assert cols[-gl.width // 4:].sum() > 0


@pytest.fixture(scope="module")
def drawer_engine(tiny_engine48):
    """Shared engine + jitted step for the Drawer end-to-end tests (the
    session-scoped tiny engine from conftest — suite is trace-bound)."""
    return tiny_engine48


def test_drawer_headless_end_to_end(drawer_engine):
    """Full display stage against real engine outputs (show=False)."""
    cfg, eng, step = drawer_engine
    state = eng.init_state()
    rng = np.random.default_rng(0)
    drawer = Drawer(cfg, show=False)
    for t in range(4):
        frame = jnp.asarray(rng.integers(0, 256, (48, 64, 3), np.uint8))
        state, out = step(eng.params, state, frame, jnp.float32((t + 1) / 30))
        key = drawer.draw_and_plot(frame, out, calibrating=(t == 0))
    assert key == -1
    assert drawer.last_frame.shape == (48, 64, 3)
    assert drawer.last_plot.shape == (720, 640, 3)
    assert drawer.last_frame.dtype == np.uint8
    # HUD text was stamped (some non-background pixels in the text rows).
    assert (drawer.last_plot != 255).any()
    drawer.cleanup()


def test_drawer_hud_unpack_values(drawer_engine):
    """The packed scalar block must round-trip exact HUD values (a layout
    regression would silently misprint BPM/PTT)."""
    cfg, eng, step = drawer_engine
    state = eng.init_state()
    frame = jnp.zeros((48, 64, 3), jnp.uint8)
    out = None
    for t in range(3):
        state, out = step(eng.params, state, frame, jnp.float32((t + 1) / 30))
    # Overwrite the HUD fields with known values.
    out = out._replace(bpm=jnp.asarray([72.0, np.nan]),
                       ptt=jnp.asarray([33.0]),
                       curr_fs=jnp.float32(29.5), mean_fs=jnp.float32(30.25))
    drawer = Drawer(cfg, show=False)
    _, _, packed = drawer._compose(frame, out)
    hud, ticks = drawer._unpack(np.asarray(packed))
    assert hud["curr_fs"] == pytest.approx(29.5)
    assert hud["mean_fs"] == pytest.approx(30.25)
    assert hud["bpm"][0] == pytest.approx(72.0) and np.isnan(hud["bpm"][1])
    assert hud["ptt"][0] == pytest.approx(33.0)
    assert len(ticks) == 3
    for tk in ticks:
        assert np.isfinite(tk["range_x"]).all()


def test_drawer_bp_hud(drawer_engine):
    """With a trained BP head attached, the drawer computes a per-frame
    SBP/DBP estimate from the HUD vitals and stamps it (reference's
    abandoned end goal surfaced live)."""
    import jax as _jax
    from bp_from_video_tpu.train import bp_regressor as bpr

    cfg, eng, step = drawer_engine
    sig = cfg.signal
    in_dim = 2 * (sig.num_signals + sig.num_pairs)
    state0, _ = bpr.init_train_state(_jax.random.key(0), in_dim)
    pred = bpr.BPPredictor(state0.params.weights, state0.params.biases,
                           np.zeros(in_dim), np.ones(in_dim),
                           np.array([100.0, 70.0]), np.array([15.0, 10.0]))

    state = eng.init_state()
    rng = np.random.default_rng(0)
    drawer = Drawer(cfg, show=False, bp_predictor=pred)
    for t in range(3):
        frame = jnp.asarray(rng.integers(0, 256, (48, 64, 3), np.uint8))
        state, out = step(eng.params, state, frame, jnp.float32((t + 1) / 30))
        drawer.draw_and_plot(frame, out)
    assert drawer.last_bp is not None and drawer.last_bp.shape == (2,)
    # Stand-in models on noise frames: NO detection -> NaN vitals -> the
    # BP line degrades to NaN exactly like BPM/PTT do.
    hud_bpm = np.asarray(out.bpm)
    if not np.isfinite(hud_bpm).any():
        assert np.isnan(drawer.last_bp).all()
    drawer.cleanup()


def test_trace_cols_matches_searchsorted_oracle():
    """The gather-free bracket-matrix column interpolation must reproduce
    the direct searchsorted formulation (the pre-optimization
    implementation, kept here as a numpy oracle) over random NaN-gapped
    series — including the grid==last clamp and final-segment gap flag."""
    from bp_from_video_tpu.render import plotter

    rng = np.random.default_rng(7)
    gw = 57
    for trial in range(30):
        n = 40
        x = np.cumsum(rng.uniform(0.02, 0.1, n)).astype(np.float32)
        y = rng.normal(0, 1, n).astype(np.float32)
        y[rng.random(n) < 0.25] = np.nan
        if trial % 5 == 0:
            x[: rng.integers(1, n - 2)] = np.nan  # NaN-prefill prefix
        if trial % 7 == 0:
            y[:] = np.nan
        w = np.isfinite(x) & np.isfinite(y)
        min_x, max_x = (float(np.nanmin(x[w])) if w.any() else 0.0,
                        float(np.nanmax(x[w])) if w.any() else 1.0)
        vals, ok = plotter._trace_cols(jnp.asarray(x), jnp.asarray(y),
                                       jnp.float32(min_x),
                                       jnp.float32(max_x), gw)
        vals, ok = np.asarray(vals), np.asarray(ok)

        # numpy oracle = the old searchsorted implementation.
        cx = x[w]
        cy = y[w]
        cidx = np.arange(n, dtype=np.float32)[w]
        k = int(w.sum())
        grid = min_x + (np.arange(gw) + 0.5) / gw * (max_x - min_x)
        grid = grid.astype(np.float32)
        if k < 2:
            assert not ok.any()
            continue
        j = np.clip(np.searchsorted(cx, grid, side="right") - 1, 0,
                    max(k - 2, 0))
        x0, x1 = cx[j], cx[np.clip(j + 1, 0, k - 1)]
        y0, y1 = cy[j], cy[np.clip(j + 1, 0, k - 1)]
        t = np.clip((grid - x0) / np.where(x1 == x0, 1.0, x1 - x0), 0.0, 1.0)
        want = (y0 + t * (y1 - y0)).astype(np.float32)
        gap = (cidx[np.clip(j + 1, 0, k - 1)] - cidx[j]) > 1.5
        want_ok = ((grid >= cx[0]) & (grid <= cx[k - 1]) & ~gap
                   & np.isfinite(want))
        np.testing.assert_array_equal(ok, want_ok, err_msg=f"trial {trial}")
        # atol 1e-3: the oracle's f64-intermediate grid differs from the
        # jitted f32 grid by ~1 ulp, amplified ~100x through the segment
        # interpolation — far below the half-pixel the rasterizer resolves.
        np.testing.assert_allclose(vals[ok], want[want_ok], rtol=1e-4,
                                   atol=1e-3, err_msg=f"trial {trial}")
