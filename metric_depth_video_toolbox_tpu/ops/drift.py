"""Drift correction for generated video (phase-correlation flow grid).

The InSpatio-class infill engine corrects low-frequency spatial drift of
diffusion-generated frames against their render conditioning: a coarse
grid of phase-correlation shifts, MAD outlier rejection, neighbor fill,
temporal averaging, then a remap (reference
inspatio_world_infill.py:55-196, cv2.phaseCorrelate + cv2.remap).

Device implementation: per-cell phase correlation = 2D FFT of each grid
cell (jnp.fft, batched over cells), cross-power spectrum, argmax of the
inverse transform. Everything static-shape; the remap is
image.bilinear_sample.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import image as im


def _gray(x):
    return (x[..., 0] * 0.299 + x[..., 1] * 0.587
            + x[..., 2] * 0.114).astype(jnp.float32)


@partial(jax.jit, static_argnames=("grid",))
def phase_correlation_grid(ref_u8, gen_u8, grid=4):
    """Per-cell (grid x grid) translation of gen relative to ref.

    Returns shifts (grid, grid, 2) [dx, dy] and a response strength
    (grid, grid) for outlier weighting.
    """
    h, w = ref_u8.shape[:2]
    ch, cw = h // grid, w // grid
    a = _gray(ref_u8.astype(jnp.float32))[:grid * ch, :grid * cw]
    b = _gray(gen_u8.astype(jnp.float32))[:grid * ch, :grid * cw]
    a = a.reshape(grid, ch, grid, cw).transpose(0, 2, 1, 3)
    b = b.reshape(grid, ch, grid, cw).transpose(0, 2, 1, 3)

    win_y = jnp.hanning(ch)[:, None]
    win_x = jnp.hanning(cw)[None, :]
    win = win_y * win_x

    fa = jnp.fft.rfft2(a * win)
    fb = jnp.fft.rfft2(b * win)
    cross = fa * jnp.conj(fb)
    cross = cross / (jnp.abs(cross) + 1e-9)
    corr = jnp.fft.irfft2(cross, s=(ch, cw))  # (g, g, ch, cw)

    flat = corr.reshape(grid, grid, ch * cw)
    idx = jnp.argmax(flat, axis=-1)
    peak = jnp.max(flat, axis=-1)
    dy = idx // cw
    dx = idx % cw
    # wrap-around to signed shifts
    dy = jnp.where(dy > ch // 2, dy - ch, dy).astype(jnp.float32)
    dx = jnp.where(dx > cw // 2, dx - cw, dx).astype(jnp.float32)
    return jnp.stack([dx, dy], axis=-1), peak


def robust_flow_field(shifts, strength, mad_k=3.0):
    """MAD outlier rejection + neighbor (median) fill over the shift grid
    (reference :96-150)."""
    med = jnp.median(shifts.reshape(-1, 2), axis=0)
    mad = jnp.median(jnp.abs(shifts.reshape(-1, 2) - med), axis=0) + 1e-6
    ok = jnp.all(jnp.abs(shifts - med) < mad_k * mad, axis=-1) \
        & (strength > 0.0)
    filled = jnp.where(ok[..., None], shifts, med)
    return filled, ok


@partial(jax.jit, static_argnames=("grid",))
def drift_correct_frame(gen_u8, ref_u8, grid=4, strength_scale=1.0):
    """Correct one generated frame toward its reference: estimate the
    per-cell flow, smooth it, upsample to dense flow, and remap."""
    h, w = gen_u8.shape[:2]
    shifts, peak = phase_correlation_grid(ref_u8, gen_u8, grid=grid)
    flow_grid, _ = robust_flow_field(shifts, peak)
    dense = jax.image.resize(flow_grid, (h, w, 2), "bilinear") \
        * strength_scale
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # shifts are gen-relative-to-ref: sample gen at x - shift to undo
    xy = jnp.stack([xs - dense[..., 0], ys - dense[..., 1]], axis=-1)
    out = im.bilinear_sample(gen_u8.astype(jnp.float32), xy)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def drift_correct_video(gen_frames_u8, ref_frames_u8, grid=4,
                        temporal_avg=3):
    """Temporal-averaged drift correction over a clip (reference :151-196:
    the flow grids are averaged over a temporal window before remapping).
    Host loop over frames; each step is a jitted device op."""
    import numpy as np
    t = gen_frames_u8.shape[0]
    grids = []
    for fi in range(t):
        s, p = phase_correlation_grid(jnp.asarray(ref_frames_u8[fi]),
                                      jnp.asarray(gen_frames_u8[fi]),
                                      grid=grid)
        g, _ = robust_flow_field(s, p)
        grids.append(np.asarray(g))
    grids = np.stack(grids)
    out = np.empty_like(gen_frames_u8)
    h, w = gen_frames_u8.shape[1:3]
    half = temporal_avg // 2
    for fi in range(t):
        lo, hi = max(0, fi - half), min(t, fi + half + 1)
        avg = jnp.asarray(grids[lo:hi].mean(axis=0))
        dense = jax.image.resize(avg, (h, w, 2), "bilinear")
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        xy = jnp.stack([xs - dense[..., 0], ys - dense[..., 1]], axis=-1)
        res = im.bilinear_sample(
            jnp.asarray(gen_frames_u8[fi]).astype(jnp.float32), xy)
        out[fi] = np.asarray(jnp.clip(jnp.round(res), 0, 255)
                             .astype(jnp.uint8))
    return out
