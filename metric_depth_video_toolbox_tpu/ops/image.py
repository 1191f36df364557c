"""Image-space ops: resize, blur, morphology, remap, inpaint (jnp).

TPU replacements for the reference's OpenCV calls (resize, GaussianBlur,
filter2D, dilate, remap, inpaint-TELEA) — expressed as convolutions,
reduce-windows and gathers that XLA fuses into surrounding pipelines, and
batched over frames instead of per-frame host calls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Resize / sampling
# ---------------------------------------------------------------------------

def resize(img, out_hw, method="linear"):
    """Resize (..., H, W[, C]) to out_hw. method: linear|nearest|cubic."""
    shape = img.shape[:-3] + (out_hw[0], out_hw[1], img.shape[-1]) \
        if img.ndim >= 3 else img.shape[:-2] + tuple(out_hw)
    meth = {"linear": "bilinear", "nearest": "nearest",
            "cubic": "bicubic", "area": "linear"}[method]
    if method == "area":
        # antialiased linear is the close analogue of cv2.INTER_AREA
        return jax.image.resize(img.astype(jnp.float32), shape, "linear",
                                antialias=True).astype(img.dtype)
    out = jax.image.resize(img.astype(jnp.float32), shape, meth)
    return out if jnp.issubdtype(img.dtype, jnp.floating) else (
        jnp.clip(jnp.round(out), 0, 255).astype(img.dtype))


def rescale_to_side(h, w, side_length, mode="max", multiple=1):
    """New (h, w) so the longest ('max') or shortest ('min') side becomes
    side_length (reference depth_frames_helper.py:77-97), optionally snapped
    down to a multiple (ViT patch size)."""
    scale = side_length / (max(h, w) if mode == "max" else min(h, w))
    nh, nw = int(h * scale), int(w * scale)
    if multiple > 1:
        nh -= nh % multiple
        nw -= nw % multiple
    return nh, nw


def bilinear_sample(img, xy, fill=0.0):
    """Sample (H, W, C) at float pixel coords xy (..., 2); out-of-bounds ->
    fill. The cv2.remap replacement (used by drift correction,
    inspatio_world_infill.py:170-196)."""
    h, w = img.shape[:2]
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    def tap(yi, xi):
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(ok[..., None], v, fill)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


# ---------------------------------------------------------------------------
# Convolution / blur
# ---------------------------------------------------------------------------

def gaussian_kernel_1d(ksize, sigma=0.0):
    """cv2.getGaussianKernel-compatible: sigma<=0 -> 0.3*((k-1)*0.5-1)+0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _sep_filter_chw(x, k1):
    """Separable zero-padded filter over the last two axes (H, W) via
    shift-adds — pure VPU elementwise work. The NCHW single-channel conv
    lowering measured ~10x slower at the mask-loop shapes on TPU (tiny
    feature counts waste the MXU; here W rides the lane dimension)."""
    k = k1.shape[0]
    r = k // 2
    for axis in (x.ndim - 2, x.ndim - 1):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (r, k - 1 - r)
        xp = jnp.pad(x, pad)
        acc = None
        for i in range(k):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            term = k1[i] * xp[tuple(sl)]
            acc = term if acc is None else acc + term
        x = acc
    return x


def _conv2d_same(img_hwc, kernel_hw, border_zero=True):
    """Depthwise 2D convolution with zero padding ('BORDER_ISOLATED')."""
    c = img_hwc.shape[-1]
    x = img_hwc.astype(jnp.float32).transpose(2, 0, 1)[:, None]  # (C,1,H,W)
    k = kernel_hw.astype(jnp.float32)[None, None]  # (1,1,kh,kw)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    del border_zero, c
    return out[:, 0].transpose(1, 2, 0)


def filter2d(img, kernel):
    """(H, W[, C]) x (kh, kw) -> same shape, zero border."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    out = _conv2d_same(img, kernel)
    return out[..., 0] if squeeze else out


def gaussian_blur(img, ksize, sigma=0.0):
    """Separable Gaussian blur, (H, W[, C]) float or uint8."""
    k1 = gaussian_kernel_1d(ksize, sigma)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    out = _sep_filter_chw(img.astype(jnp.float32).transpose(2, 0, 1), k1)
    out = out.transpose(1, 2, 0)
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out[..., 0] if squeeze else out


def masked_blur(img, ksize=6, sigma=0.0, valid_mask=None):
    """Gaussian blur that treats black (or masked-out) pixels as
    transparent: weights renormalize over valid pixels only (reference
    stereo_rerender.py:114-153). Holes stay black.
    """
    imf = img.astype(jnp.float32)
    if valid_mask is None:
        valid_mask = jnp.any(imf != 0, axis=-1)
    v = valid_mask.astype(jnp.float32)
    g1 = gaussian_kernel_1d(ksize, sigma)
    num = _sep_filter_chw((imf * v[..., None]).transpose(2, 0, 1), g1)
    num = num.transpose(1, 2, 0)
    den = _sep_filter_chw(v, g1)
    safe = jnp.where(den == 0, 1.0, den)
    out = num / safe[..., None]
    out = jnp.where((den == 0)[..., None], 0.0, out)
    out = jnp.where(valid_mask[..., None], out, 0.0)
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out


# ---------------------------------------------------------------------------
# Morphology
# ---------------------------------------------------------------------------

def _window_reduce(mask, ksize, init, op):
    pad = ksize // 2
    return jax.lax.reduce_window(
        mask, init, op, (ksize, ksize), (1, 1),
        [(pad, ksize - 1 - pad), (pad, ksize - 1 - pad)])


def dilate(mask, ksize=3, iterations=1):
    """Binary/float dilation with a square structuring element."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = _window_reduce(m, ksize, -jnp.inf, jax.lax.max)
    return m.astype(mask.dtype) if mask.dtype != jnp.bool_ else m > 0.5


def erode(mask, ksize=3, iterations=1):
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = _window_reduce(m, ksize, jnp.inf, jax.lax.min)
    return m.astype(mask.dtype) if mask.dtype != jnp.bool_ else m > 0.5


# ---------------------------------------------------------------------------
# Inpainting (TELEA-class diffusion fill)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iterations", "ksize"))
def inpaint_diffusion(img, hole_mask, iterations=64, ksize=3):
    """Fill holes by iterated masked neighborhood averaging — the march-in
    equivalent of cv2.inpaint(TELEA) used on the infill-mask normals
    (reference stereo_rerender.py:806). Each iteration fills hole pixels
    that have >= 1 valid neighbor with the distance-weighted neighbor
    mean; interiors fill progressively inward.
    """
    imf = img.astype(jnp.float32)
    if imf.ndim == 2:
        imf = imf[..., None]
        squeeze = True
    else:
        squeeze = False
    valid = (~hole_mask).astype(jnp.float32)
    g1 = gaussian_kernel_1d(ksize, 0.0)

    # loop state lives in (C, H, W): W in lanes, filters as shift-adds
    def body(_, carry):
        cur, v = carry
        num = _sep_filter_chw(cur * v[None], g1)
        den = _sep_filter_chw(v, g1)
        cand = num / jnp.where(den == 0, 1.0, den)[None]
        newly = (v == 0) & (den > 0)
        cur = jnp.where(newly[None], cand, cur)
        v = jnp.where(newly, 1.0, v)
        return cur, v

    x0 = (imf * valid[..., None]).transpose(2, 0, 1)
    out, _ = jax.lax.fori_loop(0, iterations, body, (x0, valid))
    out = out.transpose(1, 2, 0)
    out = jnp.where(hole_mask[..., None] | (valid[..., None] > 0), out, imf)
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out[..., 0] if squeeze else out


def box_blur(img, ksize):
    k = jnp.full((ksize, ksize), 1.0 / (ksize * ksize), jnp.float32)
    return filter2d(img, k)


@partial(jax.jit, static_argnames=("coarse_iters", "fine_iters", "factor"))
def inpaint_diffusion_multiscale(img, hole_mask, coarse_iters=24,
                                 fine_iters=6, factor=4):
    """Two-scale diffusion inpaint: fill at 1/factor resolution (each
    iteration propagates factor x further), upsample the fill into the
    holes, then refine at full resolution. ~factor^2 cheaper than running
    all iterations at full resolution for the same effective radius.
    """
    imf = img.astype(jnp.float32)
    squeeze = imf.ndim == 2
    if squeeze:
        imf = imf[..., None]
    h, w, c = imf.shape
    ch, cw = h // factor, w // factor
    small = jax.image.resize(imf, (ch, cw, c), "linear")
    small_hole = jax.image.resize(hole_mask.astype(jnp.float32),
                                  (ch, cw), "linear") > 0.5
    small_fill = inpaint_diffusion(small, small_hole,
                                   iterations=coarse_iters)
    up = jax.image.resize(small_fill, (h, w, c), "linear")
    seeded = jnp.where(hole_mask[..., None], up, imf)
    # short full-res refinement: re-diffuse only a thin eroded interior
    # so seams between seeded fill and real pixels smooth out
    out = inpaint_diffusion(seeded, hole_mask & False,
                            iterations=0) if fine_iters == 0 else \
        _refine_inpaint(seeded, hole_mask, fine_iters)
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out[..., 0] if squeeze else out


def _refine_inpaint(img, hole_mask, iterations):
    """Jacobi smoothing of the hole region against its boundary."""
    g1 = gaussian_kernel_1d(3, 0.0)
    m = hole_mask[None]

    def body(_, cur):
        blurred = _sep_filter_chw(cur, g1)
        return jnp.where(m, blurred, cur)

    out = jax.lax.fori_loop(0, iterations, body, img.transpose(2, 0, 1))
    return out.transpose(1, 2, 0)
