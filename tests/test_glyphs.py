"""On-device bitmap-font text (render/glyphs.py): in-graph number
formatting vs Python's, placement exactness, and the drawer integration
(reference stamps all of this on the host with cv2.putText,
drawer.py:127-150, :177-207)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.render import glyphs


def _decode(idx, show):
    idx, show = np.asarray(idx), np.asarray(show)
    return "".join(glyphs.CHARS[i] if s else " "
                   for i, s in zip(idx, show)).rstrip()


@pytest.mark.parametrize("v,int_d,frac,want", [
    (0.0, 3, 2, "   0.00"),
    (1.5, 3, 2, "   1.50"),
    (-1.5, 3, 2, "-  1.50"),
    (123.456, 3, 2, " 123.46"),
    (72.0, 3, 0, "  72"),
    (-7.0, 3, 0, "-  7"),
    (9999.0, 3, 2, " 999.99"),   # clipped to the field
    (0.004, 2, 2, "  0.00"),
    (29.5, 2, 2, " 29.50"),
])
def test_format_fixed_matches_python(v, int_d, frac, want):
    idx, show = jax.jit(
        lambda x: glyphs.format_fixed(x, int_d, frac))(jnp.float32(v))
    got = "".join(glyphs.CHARS[i] if s else " "
                  for i, s in zip(np.asarray(idx), np.asarray(show)))
    assert got == want, (got, want)


def test_format_fixed_nan():
    idx, show = glyphs.format_fixed(jnp.float32(np.nan), 3, 2)
    assert _decode(idx, show) == "NaN"


def test_render_line_matches_atlas():
    """Rendering one char reproduces its atlas bitmap exactly (the one-hot
    matmul is an exact selection at HIGHEST precision)."""
    row = np.asarray(glyphs.render_line(jnp.asarray(glyphs.encode("7")),
                                        scale=1))
    ref = glyphs._atlas_flat()[glyphs.CHARS.index("7")].reshape(
        glyphs.GLYPH_H, glyphs.PITCH)
    np.testing.assert_array_equal(row, ref)


def test_render_line_scale_and_show():
    idx = jnp.asarray(glyphs.encode("12"))
    row = glyphs.render_line(idx, show=jnp.asarray([True, False]), scale=2)
    assert row.shape == (glyphs.GLYPH_H * 2, 2 * glyphs.PITCH * 2)
    # Hidden slot renders blank.
    assert np.asarray(row)[:, glyphs.PITCH * 2:].sum() == 0
    assert np.asarray(row)[:, :glyphs.PITCH * 2].sum() > 0


def test_stamp_blends_at_position():
    img = jnp.zeros((32, 64, 3), jnp.uint8)
    line = glyphs.render_line(jnp.asarray(glyphs.encode("8")), scale=1)
    out = np.asarray(glyphs.stamp(img, line, 10, 5, (255, 0, 0)))
    ys, xs = np.nonzero(out[..., 0])
    assert ys.min() >= 5 and ys.max() < 5 + glyphs.GLYPH_H
    assert xs.min() >= 10 and xs.max() < 10 + glyphs.PITCH
    assert (out[..., 1] == 0).all() and (out[..., 2] == 0).all()


def test_scatter_row_equals_sequential_stamps():
    """The one-matmul composite must equal placing each label separately."""
    vals = jnp.asarray([1.25, -3.5, 12.0])
    xs = jnp.asarray([5, 40, 90], jnp.int32)
    show = jnp.asarray([True, True, False])
    fi = jax.vmap(lambda v: glyphs.format_fixed(v, 2, 2))(vals)
    lines = jax.vmap(lambda i, s: glyphs.render_line(i, s, 1))(*fi)
    strip = np.asarray(glyphs.scatter_row(lines, xs, show, 160))
    ref = np.zeros_like(strip)
    lw = lines.shape[2]
    for k in range(3):
        if bool(show[k]):
            ref[:, int(xs[k]):int(xs[k]) + lw] = np.maximum(
                ref[:, int(xs[k]):int(xs[k]) + lw], np.asarray(lines[k]))
    np.testing.assert_array_equal(strip, ref)


def test_stamp_dyn_matches_static():
    img = jnp.full((20, 80, 3), 7, jnp.uint8)
    line = glyphs.render_line(jnp.asarray(glyphs.encode("42")), scale=1)
    a = glyphs.stamp(img, line, 13, 4, (9, 8, 7))
    b = jax.jit(lambda x0: glyphs.stamp_dyn(img, line, x0, 4, (9, 8, 7)))(
        jnp.int32(13))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_drawer_device_text_stamps_hud(tiny_engine48):
    """device_text=True must put glyph pixels in the HUD rows on device and
    leave the plot's label band non-empty; device_text=False reproduces the
    text-free images (host stamps in that mode)."""
    import dataclasses
    from bp_from_video_tpu.render.drawer import Drawer

    base, eng, step = tiny_engine48
    state = eng.init_state()
    frame = jnp.zeros((48, 64, 3), jnp.uint8)
    out = None
    for t in range(3):
        state, out = step(eng.params, state, frame,
                          jnp.float32((t + 1) / 30))
    out = out._replace(bpm=jnp.asarray([72.0, np.nan]),
                       ptt=jnp.asarray([33.0]),
                       curr_fs=jnp.float32(29.5), mean_fs=jnp.float32(30.2))

    on = Drawer(base, show=False)
    fr_on, pl_on, _ = on._compose(frame, out)
    off = Drawer(dataclasses.replace(
        base, draw=dataclasses.replace(base.draw, device_text=False)),
        show=False)
    fr_off, pl_off, _ = off._compose(frame, out)

    fr_on, fr_off = np.asarray(fr_on), np.asarray(fr_off)
    # HUD band (rows 30..) gained stamped pixels relative to the off mode.
    assert (fr_on != fr_off).any()
    assert (np.asarray(pl_on) != np.asarray(pl_off)).any()
    # Off mode equals the raw composed frame (no device text at all).
    assert (fr_off[25:] == 0).all()
