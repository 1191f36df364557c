"""Forward-warp z-buffer rasterization — the TPU replacement for the
reference's offscreen renderers (Open3D depth_map_tools.py:1422-1597 and
the GL path :660-865).

The reference builds an explicit triangle mesh from the depth grid
(2*(H-1)*(W-1) triangles, depth_map_tools.py:1186-1414), optionally culls
near-silhouette triangles (normal-vs-view angle > ~89 deg, :1279-1294), and
rasterizes it twice per frame (left/right eye) through Open3D. On TPU there
is no rasterizer, and a triangle pipeline is the wrong shape for the VPU —
so this module re-poses the whole thing as one fused dataflow over the
depth grid:

    unproject -> rigid transform (eye offset + convergence) -> project
    -> per-cell subsample expansion (the quad interior the mesh would fill)
    -> scatter-min z-buffer -> winner-take gather for color/payloads

Each source grid cell is covered by an S x S lattice of bilinearly
interpolated samples in screen space — equivalent to rasterizing the two
cell triangles at up-to-S-pixel stretch. Cells stretched further than S
pixels are, by construction, near-silhouette cells: exactly the ones the
reference culls as "edges". Edge detection is the same normal-vs-view
angle test, computed per cell from the camera-space points, so edge
semantics (and therefore infill-mask quality) match the mesh path without
ever materializing a mesh.

Everything is static-shape jnp: jit-, vmap- and shard_map-safe. Depth is
positive into the screen (OpenCV camera convention).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import geometry as geo

INF_DEPTH = 3.0e38


class WarpResult(NamedTuple):
    """Outputs of one forward warp.

    color:     (Ht, Wt, C) warped payload (float32; callers pass uint8/255.)
    depth:     (Ht, Wt)    linear z-buffer depth in target camera space
                           (INF where nothing landed)
    mask:      (Ht, Wt)    bool, True where a sample landed (holes = False)
    edge_mask: (H, W)      bool, source pixels whose cell was edge-culled
                           (the reference's "removed vertices",
                           depth_map_tools.py:1336-1384 — used to splat
                           infill anchors)
    """
    color: jnp.ndarray
    depth: jnp.ndarray
    mask: jnp.ndarray
    edge_mask: jnp.ndarray


def _cell_corners(a):
    """(H, W, ...) -> 4 corner views of each grid cell anchored at (i, j):
    (i,j), (i,j+1), (i+1,j), (i+1,j+1), edge-clamped so every pixel owns a
    cell (the last row/col cells are degenerate and carry the pixel's own
    sample)."""
    a01 = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    a10 = jnp.concatenate([a[1:], a[-1:]], axis=0)
    a11 = jnp.concatenate([a01[1:], a01[-1:]], axis=0)
    return a, a01, a10, a11


def cell_edge_mask(points_cam, angle_threshold_deg=89.0):
    """True for grid cells whose surface is nearly parallel to the view ray
    — the reference's triangle cull (depth_map_tools.py:1279-1294).

    points_cam: (H, W, 3) camera-space points (pre-transform, source cam).
    A cell is an edge if either of its two triangles' normals makes an
    angle > threshold with the ray to the camera.
    """
    p00, p01, p10, p11 = _cell_corners(points_cam)
    # triangle 1: p00, p10, p01 ; triangle 2: p11, p01, p10 (grid split)
    n1 = jnp.cross(p10 - p00, p01 - p00)
    n2 = jnp.cross(p01 - p11, p10 - p11)
    center = (p00 + p01 + p10 + p11) * 0.25
    view = -center  # ray from surface toward camera at origin
    cos_t = math.cos(math.radians(angle_threshold_deg))

    def bad(n):
        nn = jnp.linalg.norm(n, axis=-1)
        cosang = jnp.abs(jnp.sum(n * view, axis=-1)) / (
            nn * jnp.linalg.norm(view, axis=-1) + 1e-12)
        # Degenerate (zero-area) triangles — the clamped last row/col cells
        # — are not edges; they carry only the pixel's own point sample.
        return (cosang < cos_t) & (nn > 1e-12)

    return bad(n1) | bad(n2)


def forward_warp(depth, color, k_src, k_dst, transform, out_hw,
                 subsample=2, remove_edges=True,
                 edge_angle_deg=89.0, of_by_one=True,
                 depth_tie_eps=1e-3, min_depth=1e-4):
    """Warp a depth+color frame into a target camera. Fully fused XLA.

    Args:
      depth:      (H, W) float meters, source camera.
      color:      (H, W, C) payload to carry (interpolated per subsample).
      k_src/k_dst: 3x3 intrinsics.
      transform:  4x4 source-camera -> target-camera rigid transform
                  (the composition of camera-motion cancel and stereo eye
                  view, reference stereo_rerender.py:615-725).
      out_hw:     (Ht, Wt) static output size.
      subsample:  S; each grid cell emits S*S interpolated samples. S=1 is
                  pure point splatting; S>=2 fills intra-cell stretch like
                  the reference's mesh interiors.
      remove_edges: cull near-silhouette cells (holes become the infill
                  mask, like --remove_edges).

    Returns a :class:`WarpResult`.
    """
    ht, wt = out_hw
    h, w = depth.shape
    c = color.shape[-1]
    s = int(subsample)

    pts_cam = geo.unproject_depth(depth, k_src, of_by_one=of_by_one)
    edge = cell_edge_mask(pts_cam, edge_angle_deg)

    pts = geo.transform_depth_map(pts_cam, transform)
    uv, z = _project_map(pts, k_dst)

    # Per-cell corners of screen position, depth, color, validity.
    u00, u01, u10, u11 = _cell_corners(uv)
    z00, z01, z10, z11 = _cell_corners(z)
    c00, c01, c10, c11 = _cell_corners(color.astype(jnp.float32))

    valid_pix = depth > min_depth
    v00, v01, v10, v11 = _cell_corners(valid_pix)
    cell_valid = v00 & v01 & v10 & v11
    if remove_edges:
        cell_valid = cell_valid & ~edge
    # Degenerate last row/col cells fall back to the pixel's own sample
    # (corners clamp to themselves), which is exactly point splatting.

    zflat = jnp.full((ht * wt + 1,), INF_DEPTH, jnp.float32)
    cflat = jnp.zeros((ht * wt + 1, c), jnp.float32)

    def lattice(a, b):
        """Bilinear mix of the 4 corner fields at fraction (a, b)."""
        wa0, wa1 = 1.0 - a, a
        wb0, wb1 = 1.0 - b, b

        def mix(x00, x01, x10, x11):
            return (wa0 * wb0 * x00 + wa0 * wb1 * x01
                    + wa1 * wb0 * x10 + wa1 * wb1 * x11)
        return mix

    # Collect all S*S candidate sample sets, then one scatter-min.
    cand_idx = []
    cand_z = []
    cand_col = []
    for ia in range(s):
        for ib in range(s):
            a = ia / s
            b = ib / s
            mix = lattice(a, b)
            su = mix(u00, u01, u10, u11)
            sz = mix(z00, z01, z10, z11)
            sc = mix(c00, c01, c10, c11)
            ok = cell_valid if (ia or ib) else valid_pix
            ui = jnp.round(su[..., 0]).astype(jnp.int32)
            vi = jnp.round(su[..., 1]).astype(jnp.int32)
            inb = (ui >= 0) & (ui < wt) & (vi >= 0) & (vi < ht)
            ok = ok & inb & (sz > min_depth)
            flat = jnp.where(ok, vi * wt + ui, ht * wt)  # invalid -> slot -1
            cand_idx.append(flat.reshape(-1))
            cand_z.append(sz.reshape(-1))
            cand_col.append(sc.reshape(-1, c))

    idx = jnp.concatenate(cand_idx)
    zc = jnp.concatenate(cand_z)
    colc = jnp.concatenate(cand_col)

    # Pass 1: z-buffer via scatter-min.
    zflat = zflat.at[idx].min(zc, mode="drop")
    # Pass 2: winners write payload (ties resolved arbitrarily among
    # samples within depth_tie_eps of the winning depth — same depth, same
    # surface).
    zwin = zflat[jnp.minimum(idx, ht * wt)]
    winner = zc <= zwin * (1.0 + depth_tie_eps) + depth_tie_eps
    widx = jnp.where(winner, idx, ht * wt)
    cflat = cflat.at[widx].set(colc, mode="drop")

    zout = zflat[:-1].reshape(ht, wt)
    mask = zout < INF_DEPTH
    return WarpResult(
        color=cflat[:-1].reshape(ht, wt, c),
        depth=jnp.where(mask, zout, INF_DEPTH),
        mask=mask,
        edge_mask=edge & valid_pix,
    )


def _project_map(points_hw3, k):
    z = points_hw3[..., 2]
    safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = points_hw3[..., 0] / safe * k[0, 0] + k[0, 2]
    v = points_hw3[..., 1] / safe * k[1, 1] + k[1, 2]
    return jnp.stack([u, v], axis=-1), z


def splat_points(points_cam, payload, k, out_hw, radius=0,
                 min_depth=1e-4, depth_tie_eps=1e-3):
    """Z-buffered point splatting into a target camera.

    Used for edge-anchor splatting (the reference projects removed-edge
    vertices and depth-sorts them into the infill mask,
    stereo_rerender.py:589-607, 745-814) and for point-cloud rendering
    (3d_view_depthfile.py --render). ``radius`` splats each point into a
    (2r+1)^2 neighborhood.

    points_cam: (N, 3) target-camera-space points.
    payload:    (N, C).
    Returns (payload_img (Ht,Wt,C), depth (Ht,Wt), mask (Ht,Wt)).
    """
    ht, wt = out_hw
    c = payload.shape[-1]
    uv, z = geo.project_points(points_cam, k)
    ui0 = jnp.round(uv[:, 0]).astype(jnp.int32)
    vi0 = jnp.round(uv[:, 1]).astype(jnp.int32)
    base_ok = z > min_depth

    zflat = jnp.full((ht * wt + 1,), INF_DEPTH, jnp.float32)
    offs = range(-radius, radius + 1)
    idxs = []
    for dy in offs:
        for dx in offs:
            ui = ui0 + dx
            vi = vi0 + dy
            ok = base_ok & (ui >= 0) & (ui < wt) & (vi >= 0) & (vi < ht)
            idxs.append(jnp.where(ok, vi * wt + ui, ht * wt))
    idx = jnp.concatenate(idxs)
    n_rep = len(offs) ** 2
    zr = jnp.tile(z, n_rep)
    pr = jnp.tile(payload.astype(jnp.float32), (n_rep, 1))
    zflat = zflat.at[idx].min(zr, mode="drop")
    zwin = zflat[jnp.minimum(idx, ht * wt)]
    winner = zr <= zwin * (1.0 + depth_tie_eps) + depth_tie_eps
    widx = jnp.where(winner, idx, ht * wt)
    pflat = jnp.zeros((ht * wt + 1, c), jnp.float32)
    pflat = pflat.at[widx].set(pr, mode="drop")
    zout = zflat[:-1].reshape(ht, wt)
    mask = zout < INF_DEPTH
    return pflat[:-1].reshape(ht, wt, c), jnp.where(mask, zout, INF_DEPTH), mask
