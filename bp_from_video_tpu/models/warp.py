"""Rotated-rect geometry and image warping for the landmark pipelines.

The reference relies on MediaPipe's C++ calculators (DetectionsToRects,
RectTransformation, ImageToTensor, LandmarkProjection) hidden behind
`detect_for_video` (reference inference_runner.py:120-122).  Re-built here in
**pixel space** as pure JAX: a rect is (cx, cy, w, h, rotation) in pixels,
crops are affine bilinear gathers on-device, and landmark projection is the
exact inverse of the crop mapping — so crop→net→project is self-consistent
by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Rect(NamedTuple):
    cx: Array
    cy: Array
    w: Array
    h: Array
    rotation: Array  # radians


def normalize_radians(a: Array) -> Array:
    """Wrap to [-pi, pi) (MediaPipe NormalizeRadians)."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


def rotation_from_points(p0: Array, p1: Array, target_angle: float) -> Array:
    """Rotation aligning the p0→p1 direction to ``target_angle``
    (DetectionsToRectsCalculator::ComputeRotation, y-down image coords)."""
    return normalize_radians(
        target_angle - jnp.arctan2(-(p1[1] - p0[1]), p1[0] - p0[0]))


def detection_to_rect(box_px: Array, kp_px: Array, kp_start: int, kp_end: int,
                      target_angle: float) -> Rect:
    """Rect from a detection bbox (pixel corners) + rotation from two
    keypoints."""
    cx = (box_px[0] + box_px[2]) / 2.0
    cy = (box_px[1] + box_px[3]) / 2.0
    w = box_px[2] - box_px[0]
    h = box_px[3] - box_px[1]
    rot = rotation_from_points(kp_px[kp_start], kp_px[kp_end], target_angle)
    return Rect(cx, cy, w, h, rot)


def landmarks_to_rect(pts_px: Array, rot_start: int, rot_end: int,
                      target_angle: float) -> Rect:
    """Tracking rect from the previous frame's landmarks: their axis-aligned
    bbox + rotation from two anchor landmarks (the landmarks-to-ROI step of
    the MediaPipe tracking graphs)."""
    x0 = jnp.min(pts_px[:, 0])
    x1 = jnp.max(pts_px[:, 0])
    y0 = jnp.min(pts_px[:, 1])
    y1 = jnp.max(pts_px[:, 1])
    rot = rotation_from_points(pts_px[rot_start], pts_px[rot_end], target_angle)
    return Rect((x0 + x1) / 2.0, (y0 + y1) / 2.0, x1 - x0, y1 - y0, rot)


def rect_transform(r: Rect, scale: float, shift_x: float = 0.0,
                   shift_y: float = 0.0, square_long: bool = True) -> Rect:
    """RectTransformationCalculator: rotation-aware shift, square-long, then
    scale."""
    sx = r.w * shift_x
    sy = r.h * shift_y
    cos, sin = jnp.cos(r.rotation), jnp.sin(r.rotation)
    cx = r.cx + sx * cos - sy * sin
    cy = r.cy + sx * sin + sy * cos
    side = jnp.maximum(r.w, r.h) if square_long else None
    w = (side if square_long else r.w) * scale
    h = (side if square_long else r.h) * scale
    return Rect(cx, cy, w, h, r.rotation)


def axis_aligned_cover(r: Rect) -> Rect:
    """The axis-aligned rect covering the rotated rect ``r`` (same center).

    The fast separable crop path samples this cover instead of the rotated
    rect: landmark nets then see an unrotated view (fine for near-upright
    subjects), and landmark projection stays exactly consistent because the
    same cover rect is used for both crop and projection."""
    cos = jnp.abs(jnp.cos(r.rotation))
    sin = jnp.abs(jnp.sin(r.rotation))
    return Rect(r.cx, r.cy, r.w * cos + r.h * sin, r.w * sin + r.h * cos,
                jnp.zeros_like(r.rotation))


def interp_matrix(samples: Array, in_len: int, mode: str = "zero") -> Array:
    """Bilinear interpolation matrix W [out, in]: W @ signal samples the
    signal at pixel-center coordinates ``samples``.

    The triangular kernel max(0, 1-|d|) IS bilinear-with-zero-pad, but as a
    dense matrix the resample becomes an MXU matmul instead of a gather —
    the TPU-native formulation (gathers are element-serial on TPU).
    mode='zero': zero outside (crop semantics); 'edge': clamp (resize
    semantics, rows always sum to 1)."""
    if mode == "edge":
        samples = jnp.clip(samples, 0.0, in_len - 1.0)
    grid = jnp.arange(in_len, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(samples[:, None] - grid[None, :]))


def resample_separable(frame: Array, ys: Array, xs: Array,
                       dtype=jnp.float32, mode: str = "zero") -> Array:
    """Separable bilinear resample: out[i, j] = frame[ys[i], xs[j]] (pixel
    coords where integer k = center of pixel k; zero outside) via two
    matmuls.  frame [H, W, C] -> [len(ys), len(xs), C]."""
    h, w, c = frame.shape
    wy = interp_matrix(ys, h, mode).astype(dtype)     # [oy, H]
    wx = interp_matrix(xs, w, mode).astype(dtype)     # [ox, W]
    f = frame.reshape(h, w * c).astype(dtype)
    tmp = jnp.dot(wy, f, preferred_element_type=jnp.float32)  # [oy, W*C]
    tmp = tmp.reshape(-1, w, c).astype(dtype)
    out = jnp.einsum("ywc,xw->yxc", tmp, wx,
                     preferred_element_type=jnp.float32)
    return out


def crop_rect(frame: Array, r: Rect, out_size: int,
              exact_rotation: bool = True, dtype=jnp.float32) -> Array:
    """Bilinear crop of the rect into (out_size, out_size, C), zero padding
    outside the frame (ImageToTensor / ExtractSubRect).

    exact_rotation=True: rotated affine grid via gather (exact MediaPipe
    semantics, slow on TPU).  False: the caller must pass an axis-aligned
    rect (rotation ignored) and the crop is two MXU matmuls."""
    s = out_size
    u = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s - 0.5
    if not exact_rotation:
        ys = r.cy + u * r.h - 0.5
        xs = r.cx + u * r.w - 0.5
        return resample_separable(frame, ys, xs, dtype)
    vv, uu = jnp.meshgrid(u, u, indexing="ij")  # vv: rows, uu: cols
    cos, sin = jnp.cos(r.rotation), jnp.sin(r.rotation)
    xs = r.cx + uu * r.w * cos - vv * r.h * sin
    ys = r.cy + uu * r.w * sin + vv * r.h * cos
    return bilinear_sample(frame, xs, ys)


def bilinear_sample(frame: Array, xs: Array, ys: Array) -> Array:
    """Bilinear sample at pixel centers (x+0.5 conventions folded: xs/ys are
    pixel coordinates where integer k is the center of pixel k); zero
    outside."""
    h, w = frame.shape[0], frame.shape[1]
    f = frame.astype(jnp.float32)
    x = xs - 0.5
    y = ys - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = f[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    a = gather(y0i, x0i)
    b = gather(y0i, x0i + 1)
    c = gather(y0i + 1, x0i)
    d = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def _rdft_mats(n: int):
    """Real-DFT analysis/synthesis matrices for length ``n``: ``x @ F``
    gives [Re | Im] of the rFFT (nf = n//2+1 each half), and
    ``[Re' | Im'] @ I`` synthesizes the shifted signal; concatenated so
    each direction is ONE matmul.  Built IN-GRAPH (exact int32 mod-n
    angle reduction, see ops/dft.py) — numpy bases embedded multi-MB
    constants per instance into the HLO and inflated remote-compile
    payloads; as traced ops they CSE and hoist out of scans."""
    from bp_from_video_tpu.ops.dft import _angles
    nf = n // 2 + 1
    ang = _angles(n, nf, n)
    f = jnp.concatenate([jnp.cos(ang), -jnp.sin(ang)], axis=1)  # [n, 2nf]
    wts = jnp.full((nf, 1), 2.0, jnp.float32)
    wts = wts.at[0].set(1.0)
    if n % 2 == 0:
        wts = wts.at[-1].set(1.0)
    angt = ang.T
    i_c = jnp.cos(angt) * wts / n                               # [nf, n]
    i_s = jnp.sin(angt) * wts / n
    i_mat = jnp.concatenate([i_c, -i_s], axis=0)                # [2nf, n]
    kk = jnp.arange(nf, dtype=jnp.float32) / n                  # rfftfreq
    return f, i_mat, kk


def fract_shift(img: Array, shifts: Array, axis: int,
                method: str | None = None) -> Array:
    """Translate ``img`` along ``axis`` by per-slice fractional ``shifts``
    via rDFT phase ramps (periodic sinc interpolation).

    ``shifts`` has ``img``'s shape with ``axis`` removed and broadcasts
    against the spectrum; positive shifts move content toward lower
    indices (out[j] = in[j + shift]).  This is the gather-free shift
    primitive: a data-dependent, per-row translation is an analysis
    transform, an elementwise phase rotation, and a synthesis transform —
    no element-serial gathers (the same phase-ramp trick
    ops/correlate.py uses for data-dependent lag shifts).

    ``method``: 'fft' uses jnp.fft (exact, fast on CPU), 'dft' evaluates
    the real DFT as two MXU matmuls against static trig matrices — on
    TPU the FFT lowering measures ~20x slower than the matmuls at the
    crop-canvas sizes (35 ms vs ~1.7 ms per [64,3,384,384] shear pass),
    while the matmul path agrees with it to ~1e-4 of the data range.
    None auto-selects by backend (dft on TPU)."""
    if method is None:
        method = "dft" if jax.default_backend() == "tpu" else "fft"
    ax = axis if axis >= 0 else axis + img.ndim
    x = jnp.moveaxis(img.astype(jnp.float32), ax, -1)
    n = x.shape[-1]
    if method == "fft":
        k = jnp.fft.rfftfreq(n)  # cycles/sample
        # Always FFT along the MINOR axis: TPU FFTs on non-minor axes
        # (e.g. axis 0/1 of an [H, W, C] image, C=3 minor) lower
        # catastrophically (~70x the moveaxis + minor-axis form).
        spec = jnp.fft.rfft(x, axis=-1)
        ph = jnp.exp(2j * jnp.pi * k * shifts[..., None].astype(jnp.float32))
        out = jnp.fft.irfft(spec * ph, n=n, axis=-1)
        return jnp.moveaxis(out, -1, ax)
    f_mat, i_mat, kk = _rdft_mats(n)
    nf = kk.shape[0]
    # HIGH precision: bf16 operands lose ~2% of pixel range here; the
    # 3-pass bf16x3 mode matches the FFT path to ~1e-4 at ~the same speed
    # as default (measured 1.79 vs 1.64 ms per pass).
    spec = jnp.matmul(x, f_mat, precision=jax.lax.Precision.HIGH)
    re, im = spec[..., :nf], spec[..., nf:]
    ang = 2.0 * jnp.pi * kk * shifts[..., None].astype(jnp.float32)
    pc, ps = jnp.cos(ang), jnp.sin(ang)
    spec2 = jnp.concatenate([re * pc - im * ps, re * ps + im * pc],
                            axis=-1)
    out = jnp.matmul(spec2, i_mat, precision=jax.lax.Precision.HIGH)
    return jnp.moveaxis(out, -1, ax)


def rotate_shear(img: Array, theta: Array, r: Array | float = 1.0) -> Array:
    """Rotate ``img`` [H, W, C] about its center by ``theta`` (y-down
    screen convention, matching :func:`crop_rect`'s rotated sampling grid)
    using the classic 3-shear decomposition — each shear pass is a
    per-row/per-column fractional translation done with FFT phase ramps
    (:func:`fract_shift`), so the whole rotation is gather-free.

    ``r`` is the row-pitch / col-pitch ratio of the pixel grid
    (anisotropic rects rotate correctly when sampled at rect pitch:
    index-space transform = diag(1/ph,1/pw)·R·diag(ph,pw), still det 1 and
    shear-decomposable with k1 = k3 = −r·tan(θ/2), k2 = sin(θ)/r in
    :func:`fract_shift`'s out[j] = in[j + shift] convention).

    Interpolation is periodic sinc (vs the exact path's bilinear): on
    natural image content the difference is sub-1% of range; hard edges
    ring at the few-percent level.  Content within ~·√2/2 of the center
    stays wrap-free for |θ| ≤ 45° given the caller's padding margin."""
    h, w = img.shape[0], img.shape[1]
    t = jnp.tan(theta / 2.0)
    k1 = -r * t
    k2 = jnp.sin(theta) / r
    a = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0  # row offsets
    b = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0  # col offsets
    x = fract_shift(img, (k1 * a)[:, None], axis=1)
    x = fract_shift(x, (k2 * b)[:, None], axis=0)
    x = fract_shift(x, (k1 * a)[:, None], axis=1)
    return x


def crop_rect_shear(frame: Array, r: Rect, out_size: int,
                    dtype=jnp.float32, expand: float = 1.5) -> Array:
    """Rotated-rect crop with ZERO gathers: resample the axis-aligned
    neighborhood of the rect center at target pixel pitch (two MXU
    matmuls, zero outside the frame), then rotate in place with 3
    FFT-phase-ramp shear passes and take the central window.

    Matches :func:`crop_rect`'s exact rotated path (`exact_rotation=True`)
    up to interpolation kernel (sinc vs bilinear); landmark projection via
    :func:`project_landmarks` with the same rect stays exactly consistent
    because the sampling grid is the same rotated grid.  ``expand`` sizes
    the working canvas (≥ √2 covers the rotated rect for any θ; 1.5
    rounded up to a multiple of 64 adds wrap margin for the shears)."""
    s = out_size
    tdim = int(-(-int(s * expand) // 64) * 64)
    u = (jnp.arange(tdim, dtype=jnp.float32) + 0.5 - tdim / 2) / s
    ys = r.cy + u * r.h - 0.5
    xs = r.cx + u * r.w - 0.5
    g = resample_separable(frame, ys, xs, dtype)   # [t, t, C] at rect pitch
    # Fold quarter turns out of the rotation: the shear decomposition's
    # tan(θ/2) factors explode toward ±180°, but quarter turns of the
    # square canvas are exact index permutations (rot90 = transpose +
    # reverse — still zero gathers).  The residual |θr| ≤ 45° keeps every
    # shear shift inside the wrap margin.  Quarter-turn folding is exact
    # for square rects (the runner's tracking rects are square_long); a
    # no-op for |θ| < 45°.  Anisotropic rects are supported for |θ| ≤ 45°
    # (beyond that a quarter turn of an anisotropic grid is a rescale,
    # not a permutation — and strong anisotropy also shrinks the shear
    # wrap margin by max(r, 1/r); keep w/h within ~[2/3, 3/2]).
    rot = normalize_radians(r.rotation)
    nq = jnp.round(rot / (jnp.pi / 2))
    theta_r = rot - nq * (jnp.pi / 2)
    n4 = jnp.mod(nq.astype(jnp.int32), 4)
    g = jax.lax.switch(n4, [
        lambda im: im,
        lambda im: jnp.rot90(im, 1, axes=(0, 1)),
        lambda im: jnp.rot90(im, 2, axes=(0, 1)),
        lambda im: jnp.rot90(im, 3, axes=(0, 1)),
    ], g)
    ratio = jnp.where(n4 % 2 == 1, r.w / r.h, r.h / r.w)
    rot_img = rotate_shear(g, theta_r, r=ratio)
    o0 = (tdim - s) // 2
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(rot_img, o0, o0 + s, axis=0),
        o0, o0 + s, axis=1)


def project_landmarks(norm_pts: Array, r: Rect) -> Array:
    """Map landmark-net outputs (normalized crop coords in [0,1], shape
    [L, 2+]) back to frame pixels — the exact inverse of :func:`crop_rect`'s
    grid mapping (LandmarkProjectionCalculator)."""
    u = norm_pts[:, 0] - 0.5
    v = norm_pts[:, 1] - 0.5
    cos, sin = jnp.cos(r.rotation), jnp.sin(r.rotation)
    x = r.cx + u * r.w * cos - v * r.h * sin
    y = r.cy + u * r.w * sin + v * r.h * cos
    return jnp.stack([x, y], axis=-1)


# --- detector input: centered letterbox --------------------------------------


class Letterbox(NamedTuple):
    image: Array     # (S, S, C) float
    scale: Array     # pixels per letterbox unit
    pad_x: Array     # left pad in letterbox pixels
    pad_y: Array


def letterbox(frame: Array, out_size: int, dtype=jnp.float32) -> Letterbox:
    """Keep-aspect resize into a centered (out_size, out_size) canvas
    (ImageToTensor keep_aspect_ratio), zero padding.  ``dtype`` sets the
    resample matmul precision (bf16 when feeding bf16 detector nets)."""
    h, w = frame.shape[0], frame.shape[1]
    s = out_size
    scale = jnp.float32(max(h, w)) / s  # frame pixels per output pixel
    pad_x = (s - w / scale) / 2.0
    pad_y = (s - h / scale) / 2.0
    j = jnp.arange(s, dtype=jnp.float32) + 0.5
    xs = (j - pad_x) * scale
    ys = (j - pad_y) * scale
    # Axis-aligned by construction -> two-matmul separable resample (the
    # interp matrices are compile-time constants here: h/w/s are static).
    img = resample_separable(frame, ys - 0.5, xs - 0.5, dtype=dtype)
    return Letterbox(img, scale, pad_x, pad_y)


def resize_bilinear(image: Array, out_h: int, out_w: int,
                    dtype=jnp.float32) -> Array:
    """Half-pixel bilinear resize with edge clamp (jax.image.resize
    'bilinear' semantics in the interior) as two MXU matmuls.  ``dtype``
    sets the matmul operand precision (bf16 halves the traffic for
    mask-grade data)."""
    h, w = image.shape[0], image.shape[1]
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    return resample_separable(image, ys, xs, dtype=dtype, mode="edge")


def _resize_mm(x: Array, out_h: int, out_w: int, h_axis: int, w_axis: int,
               specs: tuple[str, str], dtype, out_dtype=None) -> Array:
    """Shared core of the MXU-matmul bilinear resizes: half-pixel sample
    coordinates (resize_bilinear's formula), edge-clamped interpolation
    matrices, two einsum contractions given per-layout subscripts.

    ``jax.image.resize(..., "bilinear")`` lowers to gathers, which are
    element-serial on TPU; the triangular-kernel interpolation matrices
    keep the resize on the MXU (same formulation as resample_separable)
    and match TFLite's RESIZE_BILINEAR half-pixel semantics exactly —
    including on DOWNSCALE, where jax.image.resize antialias-filters and
    TFLite does not.  Accumulates f32, returns ``x.dtype`` (integer inputs
    are rounded, not truncated, matching jax.image.resize)."""
    h, w = x.shape[h_axis], x.shape[w_axis]
    if dtype is None:
        dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) \
            else jnp.float32
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    wy = interp_matrix(ys, h, "edge").astype(dtype)   # [oh, H]
    wx = interp_matrix(xs, w, "edge").astype(dtype)   # [ow, W]
    spec_h, spec_w = specs
    t = jnp.einsum(spec_h, x.astype(dtype), wy,
                   preferred_element_type=jnp.float32).astype(dtype)
    out = jnp.einsum(spec_w, t, wx, preferred_element_type=jnp.float32)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        out = jnp.round(out)
    return out.astype(x.dtype if out_dtype is None else out_dtype)


def resize_bilinear_planar(x: Array, out_h: int, out_w: int,
                           dtype=None, out_dtype=None) -> Array:
    """Half-pixel bilinear resize over the LAST TWO axes ([..., H, W] —
    the planar activation layout) as two MXU matmuls (see _resize_mm).
    ``out_dtype`` keeps the f32 accumulation on output (skips the
    round-trip through ``x.dtype``)."""
    return _resize_mm(x, out_h, out_w, -2, -1,
                      ("...hw,oh->...ow", "...hw,pw->...hp"), dtype,
                      out_dtype)


def resize_bilinear_nhwc(x: Array, out_h: int, out_w: int,
                         dtype=None, out_dtype=None) -> Array:
    """resize_bilinear_planar for NHWC batches ([B, H, W, C]) — interior
    axes resampled by the same MXU interpolation matmuls, no transpose."""
    return _resize_mm(x, out_h, out_w, 1, 2,
                      ("bhwc,oh->bowc", "bhwc,pw->bhpc"), dtype,
                      out_dtype)


def unletterbox_points(pts_norm: Array, lb: Letterbox, out_size: int) -> Array:
    """Map detector outputs (normalized letterbox coords) to frame pixels."""
    x = (pts_norm[..., 0] * out_size - lb.pad_x) * lb.scale
    y = (pts_norm[..., 1] * out_size - lb.pad_y) * lb.scale
    return jnp.stack([x, y], axis=-1)
