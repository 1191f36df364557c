"""Disocclusion infill ops: normal-guided ray-march fill, lower-side
marking, and linear histogram matching (jnp, jit-safe).

The reference implements these as host-side numpy loops over *sparse* hole
pixels (stereo_rerender.py:155-240, infill_common.py:4-49, :52-130). On
TPU the same marches run over the *full* frame in lockstep — every pixel
carries its own ray; non-hole pixels are masked out. That turns irregular
sparse iteration into dense gathers the VPU eats, and lets the march fuse
with the warp that produced the holes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import image as im


def _gather_hw(img, yi, xi, fill=0.0):
    h, w = img.shape[:2]
    ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    if img.ndim == 3:
        return jnp.where(ok[..., None], v, fill), ok
    return jnp.where(ok, v, fill), ok


@partial(jax.jit, static_argnames=("max_steps",))
def normal_march_infill(color, hole_mask, normal_map, max_steps=400):
    """Fill holes by marching along the XY of the surface normal until the
    march exits the hole, then copy that color back (reference
    ``infill_using_normals``, stereo_rerender.py:155-240, including its
    "prefer a source 2 then 1 pixels past the exit" heuristic).

    color:      (H, W, 3) float or uint8.
    hole_mask:  (H, W) bool.
    normal_map: (H, W, 3) float; XY components give the fill direction
                (already signed, i.e. decoded from the infill-mask video).
    """
    h, w = hole_mask.shape
    dirs = normal_map[..., :2].astype(jnp.float32)
    norms = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    has_dir = norms[..., 0] > 1e-6
    dirs = dirs / jnp.maximum(norms, 1e-6)
    # green-coded normals are screen-edge markers, never marched
    green = jnp.all(normal_map == jnp.array([0.0, 1.0, 0.0]), axis=-1)
    active0 = hole_mask & has_dir & ~green

    x0 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y0 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    def sample_hole(t):
        xi = jnp.round(x0 + dirs[..., 0] * t).astype(jnp.int32)
        yi = jnp.round(y0 + dirs[..., 1] * t).astype(jnp.int32)
        hole, inb = _gather_hw(hole_mask, yi, xi, fill=False)
        return xi, yi, hole, inb

    def body(t, carry):
        alive, hit_x, hit_y, found = carry
        tf = t.astype(jnp.float32)
        xi, yi, hole, inb = sample_hole(tf)
        exits = alive & inb & ~hole
        # source preference: t+2, then t+1, then t (reference :213-222)
        bx, by = xi, yi
        for dt in (1.0, 2.0):
            x2, y2, hole2, inb2 = sample_hole(tf + dt)
            better = inb2 & ~hole2
            bx = jnp.where(better, x2, bx)
            by = jnp.where(better, y2, by)
        hit_x = jnp.where(exits, bx, hit_x)
        hit_y = jnp.where(exits, by, hit_y)
        found = found | exits
        alive = alive & inb & ~exits
        return alive, hit_x, hit_y, found

    zero_i = jnp.zeros((h, w), jnp.int32)
    _, hit_x, hit_y, found = jax.lax.fori_loop(
        1, max_steps + 1, body,
        (active0, zero_i, zero_i, jnp.zeros((h, w), bool)))

    src = color[jnp.clip(hit_y, 0, h - 1), jnp.clip(hit_x, 0, w - 1)]
    return jnp.where(found[..., None], src, color)


@partial(jax.jit, static_argnames=("max_steps",))
def mark_lower_side(normals_rgb_u8, max_steps=30):
    """From an infill-mask frame (normals encoded as RGB uint8, 0 = no
    data), march along each encoded normal until leaving the marked
    region, and mark the last in-region pixel blue (0,0,255) — flagging the
    *background* side of every disocclusion edge (reference
    infill_common.py:4-49). Returns an RGB uint8 image.
    """
    h, w = normals_rgb_u8.shape[:2]
    orig = normals_rgb_u8
    valid = jnp.any(orig != 0, axis=-1)
    dirs = (orig[..., :2].astype(jnp.float32) / 255.0) * 2.0 - 1.0
    norms = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    good = valid & (norms[..., 0] > 1e-6)
    dirs = dirs / jnp.maximum(norms, 1e-6)

    x0 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y0 = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    def body(t, carry):
        alive, res_x, res_y, found = carry
        tf = t.astype(jnp.float32)
        xi = jnp.round(x0 + dirs[..., 0] * tf).astype(jnp.int32)
        yi = jnp.round(y0 + dirs[..., 1] * tf).astype(jnp.int32)
        vhere, inb = _gather_hw(valid, yi, xi, fill=False)
        bg_hit = alive & inb & ~vhere
        # record the previous step's position (still inside the region)
        xb = jnp.round(x0 + dirs[..., 0] * (tf - 1.0)).astype(jnp.int32)
        yb = jnp.round(y0 + dirs[..., 1] * (tf - 1.0)).astype(jnp.int32)
        res_x = jnp.where(bg_hit, xb, res_x)
        res_y = jnp.where(bg_hit, yb, res_y)
        found = found | bg_hit
        alive = alive & inb & ~bg_hit
        return alive, res_x, res_y, found

    zero_i = jnp.zeros((h, w), jnp.int32)
    _, res_x, res_y, found = jax.lax.fori_loop(
        1, max_steps, body, (good, zero_i, zero_i, jnp.zeros((h, w), bool)))

    out = jnp.zeros((h * w + 1, 3), jnp.uint8)
    flat = jnp.where(found, res_y * w + res_x, h * w)
    out = out.at[flat.reshape(-1)].set(
        jnp.array([0, 0, 255], jnp.uint8), mode="drop")
    return out[:-1].reshape(h, w, 3)


def _matrix_sqrt_psd(a, eps=1e-8):
    vals, vecs = jnp.linalg.eigh(a)
    vals = jnp.maximum(vals, eps)
    return (vecs * jnp.sqrt(vals)) @ vecs.T, (vecs / jnp.sqrt(vals)) @ vecs.T


@jax.jit
def lhm_color_transfer(generated, reference, ref_weights=None):
    """Linear histogram matching: match mean + covariance of ``generated``
    to ``reference``, reference statistics weighted (e.g. masked to
    non-hole pixels). Per-frame eigh-based matrix square roots (reference
    infill_common.py:52-130 / m2svid_infill.py:116-200).

    generated/reference: (H, W, 3) float in [0, 1] or [0, 255].
    ref_weights:         (H, W) float weights for the reference stats.
    Returns generated', same scale as input.
    """
    g = generated.astype(jnp.float32).reshape(-1, 3)
    r = reference.astype(jnp.float32).reshape(-1, 3)
    w = (jnp.ones(r.shape[0], jnp.float32) if ref_weights is None
         else ref_weights.astype(jnp.float32).reshape(-1))
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_r = jnp.sum(r * w[:, None], axis=0) / wsum
    rc = (r - mu_r) * jnp.sqrt(w)[:, None]
    cov_r = rc.T @ rc / wsum + 1e-5 * jnp.eye(3)
    mu_g = jnp.mean(g, axis=0)
    gc = g - mu_g
    cov_g = gc.T @ gc / g.shape[0] + 1e-5 * jnp.eye(3)
    sqrt_r, _ = _matrix_sqrt_psd(cov_r)
    _, inv_sqrt_g = _matrix_sqrt_psd(cov_g)
    t = sqrt_r @ inv_sqrt_g
    out = gc @ t.T + mu_r
    return out.reshape(generated.shape)


def blur_under_mask(img, mask, ksize=9, sigma=0.0):
    """Gaussian-blend the region under ``mask`` with its blurred
    surroundings — the halo smoother applied below disocclusion lower
    edges (reference stereo_crafter_infill.py:172-188,
    basic_nomal_infill.py:45-85). ``mask`` may be float alpha in [0,1].
    """
    alpha = im.gaussian_blur(mask.astype(jnp.float32), ksize, sigma)
    blurred = im.gaussian_blur(img.astype(jnp.float32), ksize, sigma)
    out = img.astype(jnp.float32) * (1 - alpha[..., None]) + \
        blurred * alpha[..., None]
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out
