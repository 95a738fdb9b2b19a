"""On-device text: bitmap-font glyph stamping for HUD lines and plot
labels (VERDICT r2 next #6 — "stamp HUD text on-device ... to kill the
last host text pass").

The reference stamps every HUD number and tick label on the HOST with
``cv2.putText`` after downloading the composed images
(reference drawer.py:127-150, :177-207).  Host text is the last per-frame
host-side render stage in this rebuild; this module moves it on device:

* a 5x7 bitmap font (digits, lowercase, the HUD's punctuation) lives as a
  static ``[n_chars, 7, 5]`` atlas constant;
* glyph SELECTION is a one-hot matmul against the flattened atlas (the
  same selection-matmul idiom as ops/signal.selmm — no gathers);
* number FORMATTING (fixed-point, leading-zero blanking, sign, NaN) is
  elementwise integer math on scalars;
* PLACEMENT is a static slice-assign for fixed layout lines, and a
  bounded ``lax.dynamic_update_slice`` for labels whose x position is
  data-dependent (plot vline ticks) — contiguous sliced DMA, not scatter.

Everything compiles into the drawer's one composition executable; the
host keeps only window blitting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

GLYPH_H, GLYPH_W = 7, 5
PITCH = GLYPH_W + 1  # 1 blank column between glyphs

# 5x7 font, one string row per scanline; '#' = on.  Kept deliberately
# minimal: the HUD/labels use digits, lowercase, and ". - : / _".
_FONT = {
    "0": ".###.|#..##|#.#.#|##..#|#...#|#...#|.###.",
    "1": "..#..|.##..|..#..|..#..|..#..|..#..|.###.",
    "2": ".###.|#...#|....#|...#.|..#..|.#...|#####",
    "3": ".###.|#...#|....#|..##.|....#|#...#|.###.",
    "4": "...#.|..##.|.#.#.|#..#.|#####|...#.|...#.",
    "5": "#####|#....|####.|....#|....#|#...#|.###.",
    "6": ".###.|#....|####.|#...#|#...#|#...#|.###.",
    "7": "#####|....#|...#.|..#..|..#..|..#..|..#..",
    "8": ".###.|#...#|#...#|.###.|#...#|#...#|.###.",
    "9": ".###.|#...#|#...#|.####|....#|....#|.###.",
    ".": ".....|.....|.....|.....|.....|.##..|.##..",
    "-": ".....|.....|.....|#####|.....|.....|.....",
    ":": ".....|.##..|.##..|.....|.##..|.##..|.....",
    "/": "....#|....#|...#.|..#..|.#...|#....|#....",
    "_": ".....|.....|.....|.....|.....|.....|#####",
    "a": ".....|.....|.###.|....#|.####|#...#|.####",
    "b": "#....|#....|####.|#...#|#...#|#...#|####.",
    "c": ".....|.....|.####|#....|#....|#....|.####",
    "d": "....#|....#|.####|#...#|#...#|#...#|.####",
    "e": ".....|.....|.###.|#...#|#####|#....|.###.",
    "f": "..##.|.#...|####.|.#...|.#...|.#...|.#...",
    "g": ".....|.####|#...#|#...#|.####|....#|.###.",
    "h": "#....|#....|####.|#...#|#...#|#...#|#...#",
    "i": "..#..|.....|.##..|..#..|..#..|..#..|.###.",
    "j": "...#.|.....|..##.|...#.|...#.|#..#.|.##..",
    "k": "#....|#....|#..#.|#.#..|##...|#.#..|#..#.",
    "l": ".##..|..#..|..#..|..#..|..#..|..#..|.###.",
    "m": ".....|.....|##.#.|#.#.#|#.#.#|#.#.#|#.#.#",
    "n": ".....|.....|####.|#...#|#...#|#...#|#...#",
    "o": ".....|.....|.###.|#...#|#...#|#...#|.###.",
    "p": ".....|####.|#...#|#...#|####.|#....|#....",
    "q": ".....|.####|#...#|#...#|.####|....#|....#",
    "r": ".....|.....|#.##.|##...|#....|#....|#....",
    "s": ".....|.....|.####|#....|.###.|....#|####.",
    "t": ".#...|.#...|####.|.#...|.#...|.#...|..##.",
    "u": ".....|.....|#...#|#...#|#...#|#...#|.####",
    "v": ".....|.....|#...#|#...#|#...#|.#.#.|..#..",
    "w": ".....|.....|#...#|#.#.#|#.#.#|#.#.#|.#.#.",
    "x": ".....|.....|#...#|.#.#.|..#..|.#.#.|#...#",
    "y": ".....|#...#|#...#|#...#|.####|....#|.###.",
    "z": ".....|.....|#####|...#.|..#..|.#...|#####",
    "N": "#...#|##..#|#.#.#|#..##|#...#|#...#|#...#",
    "H": "#...#|#...#|#...#|#####|#...#|#...#|#...#",
    " ": ".....|.....|.....|.....|.....|.....|.....",
}
CHARS = "".join(_FONT)
_IDX = {c: i for i, c in enumerate(CHARS)}
SPACE = _IDX[" "]


@functools.lru_cache(maxsize=None)
def _atlas_flat() -> np.ndarray:
    """[n_chars, GLYPH_H * PITCH] float32 (glyph + its spacing column)."""
    rows = []
    for c in CHARS:
        g = np.zeros((GLYPH_H, PITCH), np.float32)
        for y, line in enumerate(_FONT[c].split("|")):
            g[y, :GLYPH_W] = [ch == "#" for ch in line]
        rows.append(g.reshape(-1))
    return np.stack(rows)


def encode(text: str) -> np.ndarray:
    """Static text -> glyph index array (host-side, for label constants)."""
    return np.asarray([_IDX.get(c, SPACE) for c in text], np.int32)


def render_line(idx: Array, show: Array | None = None, scale: int = 2
                ) -> Array:
    """Glyph indices [n] (+ optional per-slot visibility) -> a float32
    coverage image [GLYPH_H*scale, n*PITCH*scale] via one one-hot matmul
    against the atlas (values in {0, 1})."""
    n = idx.shape[0]
    atlas = jnp.asarray(_atlas_flat())
    onehot = (idx[:, None] == jnp.arange(len(CHARS), dtype=idx.dtype)
              ).astype(jnp.float32)
    if show is not None:
        onehot = onehot * show.astype(jnp.float32)[:, None]
    row = jax.lax.dot(onehot, atlas,
                      precision=jax.lax.Precision.HIGHEST)  # [n, gh*pw]
    row = row.reshape(n, GLYPH_H, PITCH).transpose(1, 0, 2)
    row = row.reshape(GLYPH_H, n * PITCH)
    if scale != 1:
        row = jnp.repeat(jnp.repeat(row, scale, axis=0), scale, axis=1)
    return row


def format_fixed(v: Array, int_digits: int = 3, frac_digits: int = 2
                 ) -> tuple[Array, Array]:
    """Scalar float -> (idx, show) for the fixed field ``[-]III[.FF]``.

    In-graph formatting: absolute value scaled to an integer, per-slot
    digits by floor-divide/mod, leading integer zeros blanked, '-' in the
    sign slot, non-finite values render as 'NaN' (reference drawer.py:137
    prints the same).  Total slots = 1 + int_digits (+ 1 + frac_digits).
    """
    slots = 1 + int_digits + ((1 + frac_digits) if frac_digits else 0)
    v = jnp.asarray(v, jnp.float32)
    finite = jnp.isfinite(v)
    vv = jnp.where(finite, v, 0.0)
    neg = vv < 0
    scaled = jnp.round(jnp.abs(vv) * (10 ** frac_digits)).astype(jnp.int32)
    scaled = jnp.minimum(scaled, 10 ** (int_digits + frac_digits) - 1)

    idx_parts, show_parts = [], []
    # Sign slot.
    idx_parts.append(jnp.where(neg, _IDX["-"], SPACE))
    show_parts.append(jnp.asarray(True))
    # Integer digits, most significant first; blank leading zeros (but
    # always show the ones digit).
    for j in range(int_digits):
        p = 10 ** (int_digits + frac_digits - 1 - j)
        d = (scaled // p) % 10
        idx_parts.append(_IDX["0"] + d)
        show_parts.append((scaled >= p * jnp.where(d > 0, 1, 10))
                          | (j == int_digits - 1))
    if frac_digits:
        idx_parts.append(jnp.asarray(_IDX["."]))
        show_parts.append(jnp.asarray(True))
        for j in range(frac_digits):
            p = 10 ** (frac_digits - 1 - j)
            idx_parts.append(_IDX["0"] + (scaled // p) % 10)
            show_parts.append(jnp.asarray(True))
    idx = jnp.stack([jnp.asarray(i, jnp.int32) for i in idx_parts])
    show = jnp.stack([jnp.asarray(s, jnp.bool_) for s in show_parts])
    # NaN: overwrite the leading slots with 'NaN' (truncated if the field
    # is narrower than 3), blank the rest.
    nan_idx = jnp.asarray(encode("NaN"[:slots].ljust(slots)), jnp.int32)
    idx = jnp.where(finite, idx, nan_idx)
    show = jnp.where(finite, show, jnp.arange(slots) < 3)
    return idx, show


def stamp(img: Array, line: Array, x0: int, y0: int,
          color: tuple[int, int, int]) -> Array:
    """Blend a rendered coverage line into ``img`` [H, W, 3] uint8 at a
    STATIC position (clipped to the canvas; oversize lines are cropped)."""
    H, W = img.shape[:2]
    line = line[:H, :W]
    h, w = line.shape
    x0, y0 = max(0, min(x0, W - w)), max(0, min(y0, H - h))
    region = img[y0:y0 + h, x0:x0 + w]
    col = jnp.asarray(color, img.dtype)
    out = jnp.where(line[..., None] > 0.5, col, region)
    return img.at[y0:y0 + h, x0:x0 + w].set(out)


def stamp_block(img: Array, idx: Array, show: Array,
                colors, x0: int, y0: int, row_pitch: int,
                scale: int = 2) -> Array:
    """Stamp a BLOCK of left-aligned text lines (the HUD) in one pass:
    one vmapped selection matmul renders every line, one slice-assign
    blends the whole block — instead of a matmul + slice-assign per line
    (the per-line form measurably taxed the 8-stream render step).

    ``idx``/``show`` are [L, S] (lines padded to a common slot count with
    SPACE), ``colors`` [L, 3] per-line RGB, ``row_pitch`` the vertical
    line spacing in canvas pixels (≥ GLYPH_H*scale)."""
    lines, slots = idx.shape
    block = jax.vmap(lambda i, s: render_line(i, s, scale))(idx, show)
    gh = GLYPH_H * scale
    pad = row_pitch - gh
    assert pad >= 0, (row_pitch, gh)
    block = jnp.pad(block, ((0, 0), (0, pad), (0, 0)))  # [L, pitch, W]
    w = block.shape[2]
    strip = block.reshape(lines * row_pitch, w)
    cols = jnp.repeat(jnp.asarray(colors, img.dtype), row_pitch, axis=0)

    H, W = img.shape[:2]
    # Keep the caller's row GRID: clamp y0 into the canvas, then crop the
    # block's BOTTOM to what fits — shifting the whole block up (the
    # stamp() clamp) would detach the device rows from the host-stamped
    # extras that assume the _write_info grid.
    y0 = max(0, min(y0, H - 1))
    h = min(strip.shape[0], H - y0)
    strip, cols = strip[:h], cols[:h]
    w = min(w, W)
    strip = strip[:, :w]
    x0 = max(0, min(x0, W - w))
    region = img[y0:y0 + h, x0:x0 + w]
    out = jnp.where(strip[..., None] > 0.5, cols[:, None, :], region)
    return img.at[y0:y0 + h, x0:x0 + w].set(out)


def scatter_row(lines: Array, xs: Array, show: Array, width: int,
                scale: int = 1) -> Array:
    """Composite ``n`` rendered label lines at DATA-DEPENDENT column
    offsets into one strip — a single placement matmul, not n serial
    dynamic-slices (the plot's vline tick labels all share one text row,
    reference drawer.py:177-183).

    ``lines`` [n, gh, lw] coverage (render each label at scale 1 and pass
    the batch), ``xs`` [n] int column offsets, ``show`` [n] bool.  Returns
    [gh*scale, width*scale] coverage: P[k, c] = (c == col(k) + x(seg(k)))
    is the one-hot placement operand; overlapping labels saturate at 1.
    """
    n, gh, lw = lines.shape
    flat = lines.transpose(1, 0, 2).reshape(gh, n * lw)
    seg = jnp.repeat(jnp.arange(n), lw)
    target = jnp.tile(jnp.arange(lw), n) + jnp.clip(
        xs.astype(jnp.int32), 0, width - lw)[seg]
    placement = (jnp.arange(width)[None, :] == target[:, None]
                 ).astype(jnp.float32) * show[seg].astype(jnp.float32)[:, None]
    strip = jax.lax.dot(flat, placement,
                        precision=jax.lax.Precision.HIGHEST)
    strip = jnp.minimum(strip, 1.0)
    if scale != 1:
        strip = jnp.repeat(jnp.repeat(strip, scale, axis=0), scale, axis=1)
    return strip


def stamp_dyn(img: Array, line: Array, x0: Array, y0: int,
              color: tuple[int, int, int], show: Array | None = None
              ) -> Array:
    """Blend at a DATA-DEPENDENT x (plot vline labels): one bounded
    ``dynamic_slice`` + ``dynamic_update_slice`` pair — contiguous DMA,
    no scatter.  ``show=False`` leaves the image untouched."""
    H, W = img.shape[:2]
    line = line[:H, :W]
    h, w = line.shape
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - w)
    y0c = max(0, min(y0, H - h))
    region = jax.lax.dynamic_slice(img, (y0c, x0, 0), (h, w, 3))
    col = jnp.asarray(color, img.dtype)
    vis = line[..., None] > 0.5
    if show is not None:
        vis = vis & show
    out = jnp.where(vis, col, region)
    return jax.lax.dynamic_update_slice(img, out, (y0c, x0, 0))
