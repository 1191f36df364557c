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

import jax
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
    # barrier: keep the scatters on the bulk runtime path (see
    # _bilinear_gather note) instead of fused-serialized emitters
    idx, zc, colc = jax.lax.optimization_barrier((idx, zc, colc))

    # Pass 1: z-buffer via scatter-min.
    zflat = zflat.at[idx].min(zc, mode="drop")
    # Pass 2: winners write payload (ties resolved arbitrarily among
    # samples within depth_tie_eps of the winning depth — same depth, same
    # surface).
    zwin = zflat[jnp.minimum(idx, ht * wt)]
    winner = zc <= zwin * (1.0 + depth_tie_eps) + depth_tie_eps
    widx = jnp.where(winner, idx, ht * wt)
    widx, colc = jax.lax.optimization_barrier((widx, colc))
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


# ---------------------------------------------------------------------------
# Plane-sweep warp — the gather-only (scatter-free) TPU formulation
# ---------------------------------------------------------------------------

def _bilinear_gather(img, u, v, fill=0.0):
    """Sample (H, W[, C]) at float coords; out-of-bounds -> fill.

    The optimization_barrier is load-bearing: without it XLA:TPU fuses the
    gather into the elementwise producer graph and emits a serialized
    per-element loop (~1000x slower than the bulk gather runtime path —
    measured 106 ms vs 0.06 ms for a 2M-point 4-tap sample at 1080p).
    """
    img, u, v = jax.lax.optimization_barrier((img, u, v))
    h, w = img.shape[:2]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0

    def tap(vi, ui):
        ok = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
        val = img[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]
        if img.ndim == 3:
            return jnp.where(ok[..., None], val, fill)
        return jnp.where(ok, val, fill)

    t00 = tap(v0, u0)
    t01 = tap(v0, u0 + 1)
    t10 = tap(v0 + 1, u0)
    t11 = tap(v0 + 1, u0 + 1)
    if img.ndim == 3:
        fu = fu[..., None]
        fv = fv[..., None]
    return ((1 - fv) * ((1 - fu) * t00 + fu * t01)
            + fv * ((1 - fu) * t10 + fu * t11))


def plane_sweep_warp(depth, color, k_src, k_dst, transform, out_hw,
                     num_planes=128, remove_edges=True,
                     edge_angle_deg=89.0, of_by_one=True,
                     min_depth=1e-2, tol_scale=2.0):
    """Scatter-free re-rendering: for every TARGET pixel, sweep depth
    hypotheses front-to-back, back-project into the source camera, and
    accept the first hypothesis whose source depth agrees. All memory
    traffic is gathers (bilinear samples of the source depth/color), which
    the TPU streams well — unlike scatter z-buffers, which serialize.

    Equivalent output contract to :func:`forward_warp` (same WarpResult),
    with *bilinear* source sampling (higher color quality than splatting).
    Depth hypotheses are uniform in inverse depth between the source
    depth map's range, so the disparity step is constant (sub-pixel for
    num_planes >= image disparity range).
    """
    ht, wt = out_hw
    h, w = depth.shape
    depth = depth.astype(jnp.float32)

    pts_cam = geo.unproject_depth(depth, k_src, of_by_one=of_by_one)
    edge = cell_edge_mask(pts_cam, edge_angle_deg) if remove_edges else None

    valid_src = depth > min_depth
    big = jnp.where(valid_src, depth, jnp.inf)
    small = jnp.where(valid_src, depth, -jnp.inf)
    z_near = jnp.maximum(jnp.min(big), min_depth)
    z_far = jnp.maximum(jnp.max(small), z_near * (1.0 + 1e-3))
    inv_near = 1.0 / z_near
    inv_far = 1.0 / z_far
    d_inv = (inv_near - inv_far) / (num_planes - 1)

    m_inv = jnp.linalg.inv(transform)
    r = m_inv[:3, :3]
    t = m_inv[:3, 3]

    # target pixel rays (unit-z direction in target cam)
    x = (jnp.arange(wt, dtype=jnp.float32) - k_dst[0, 2]) / k_dst[0, 0]
    y = (jnp.arange(ht, dtype=jnp.float32) - k_dst[1, 2]) / k_dst[1, 1]
    dir_x, dir_y = jnp.meshgrid(x, y)

    fx_s, fy_s = k_src[0, 0], k_src[1, 1]
    cx_s, cy_s = k_src[0, 2], k_src[1, 2]
    # the source grid was built with the of_by_one stretch; invert it when
    # mapping back to source pixel indices
    sx = (w / (w + 1.0)) if of_by_one else 1.0
    sy = (h / (h + 1.0)) if of_by_one else 1.0

    edge_f = (edge.astype(jnp.float32) if edge is not None else None)

    # Sweep in vectorized CHUNKS of planes: one batched gather + a
    # first-hit argmax per chunk. A scalar fori_loop over planes defeats
    # XLA's gather/elementwise pipelining on TPU (~250 ms/plane observed);
    # the chunked form runs the identical math at memory bandwidth.
    chunk = min(16, num_planes)
    n_chunks = -(-num_planes // chunk)
    plane_ids = jnp.arange(n_chunks * chunk, dtype=jnp.float32)
    plane_ids = plane_ids.reshape(n_chunks, chunk)

    def sweep_chunk(carry, ids):
        found, best_z, best_u, best_v = carry
        inv_z = inv_near - d_inv * ids  # (C,)
        z_t = (1.0 / inv_z)[:, None, None]  # (C,1,1)
        px = dir_x[None] * z_t
        py = dir_y[None] * z_t
        sx_c = r[0, 0] * px + r[0, 1] * py + r[0, 2] * z_t + t[0]
        sy_c = r[1, 0] * px + r[1, 1] * py + r[1, 2] * z_t + t[1]
        sz_c = r[2, 0] * px + r[2, 1] * py + r[2, 2] * z_t + t[2]
        behind = sz_c <= min_depth
        zs = jnp.where(behind, 1.0, sz_c)
        u_s = (sx_c / zs * fx_s + cx_s) * sx
        v_s = (sy_c / zs * fy_s + cy_s) * sy
        d_s = _bilinear_gather(depth, u_s, v_s, fill=-1.0)
        tol = tol_scale * sz_c * sz_c * d_inv + 1e-4
        ok = (~behind) & (d_s > min_depth) & (jnp.abs(d_s - sz_c) < tol)
        if edge_f is not None:
            e = _bilinear_gather(edge_f, u_s, v_s, fill=1.0)
            ok = ok & (e < 0.25)
        hit = jnp.any(ok, axis=0)
        first = jnp.argmax(ok, axis=0)  # first consistent plane in chunk

        def pick(field):
            return jnp.take_along_axis(field, first[None], axis=0)[0]
        newly = hit & ~found
        best_z = jnp.where(newly, pick(sz_c), best_z)
        best_u = jnp.where(newly, pick(u_s), best_u)
        best_v = jnp.where(newly, pick(v_s), best_v)
        return (found | hit, best_z, best_u, best_v), None

    init = (jnp.zeros((ht, wt), bool), jnp.full((ht, wt), INF_DEPTH),
            jnp.zeros((ht, wt)), jnp.zeros((ht, wt)))
    (found, best_z, best_u, best_v), _ = jax.lax.scan(
        sweep_chunk, init, plane_ids)

    colf = color.astype(jnp.float32)
    out_color = _bilinear_gather(colf, best_u, best_v, fill=0.0)
    out_color = jnp.where(found[..., None], out_color, 0.0)
    # Refine depth past the plane quantization: take the matched source
    # pixel's true depth, unproject it in the source camera, and carry it
    # through the forward transform — the continuous surface z.
    d_hit = _bilinear_gather(depth, best_u, best_v, fill=0.0)
    sxp = (best_u / sx - cx_s) / fx_s * d_hit
    syp = (best_v / sy - cy_s) / fy_s * d_hit
    rf = transform[:3, :3]
    tf = transform[:3, 3]
    z_ref = rf[2, 0] * sxp + rf[2, 1] * syp + rf[2, 2] * d_hit + tf[2]
    out_depth = jnp.where(found & (d_hit > min_depth), z_ref,
                          jnp.where(found, best_z, INF_DEPTH))
    edge_out = (edge & valid_src) if edge is not None else \
        jnp.zeros((h, w), bool)
    return WarpResult(color=out_color, depth=out_depth, mask=found,
                      edge_mask=edge_out)


# ---------------------------------------------------------------------------
# VMEM disparity-sweep warp (Pallas fast path for the stereo-eye case)
# ---------------------------------------------------------------------------

def stereo_sweep_warp(depth, color, k, transform, num_planes=128,
                      remove_edges=True, edge_angle_deg=89.0,
                      max_disparity=256, neutralize_rotation=True,
                      conv_inv_z=0.0, min_depth=1e-2, tol_scale=1.6,
                      interpret=None, edge=None):
    """Stereo re-rendering via the Pallas VMEM plane sweep.

    Valid when ``transform`` decomposes as (rotation R, translation t)
    with t.y ~ t.z ~ 0 after rotation-neutralization — exactly the stereo
    eye case (camera-motion-cancelled frame + toe-in rotation + IPD
    x-shift, reference stereo_rerender.py:707-725). The rotation is
    removed exactly with one bilinear resample (rotation about the camera
    center causes no disocclusion); the remaining pure-x translation runs
    in ops.warp_pallas.disparity_sweep at VMEM speed.

    Same WarpResult contract as forward_warp / plane_sweep_warp.
    """
    from metric_depth_video_toolbox_tpu.ops import warp_pallas

    if interpret is None:
        # Pallas TPU kernels need interpret mode on the CPU backend (tests)
        interpret = jax.default_backend() != "tpu"
    h, w = depth.shape
    depth = depth.astype(jnp.float32)
    r = transform[:3, :3]
    t = transform[:3, 3]

    # edge mask is eye-invariant: callers rendering two eyes pass it in
    # precomputed (saves an unprojection + cull per eye); the edge-only
    # anchor pass passes remove_edges=False and skips the work entirely
    if edge is None:
        if remove_edges:
            pts_cam = geo.unproject_depth(depth, k, of_by_one=False)
            edge = cell_edge_mask(pts_cam, edge_angle_deg)
        else:
            edge = jnp.zeros((h, w), bool)
    valid_src = depth > min_depth

    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]

    if neutralize_rotation:
        # exact rotation removal: one bilinear resample, no disocclusion
        xs = (jnp.arange(w, dtype=jnp.float32) - cx) / fx
        ys = (jnp.arange(h, dtype=jnp.float32) - cy) / fy
        dx, dy = jnp.meshgrid(xs, ys)
        # p_s direction = R^T [dx, dy, 1]
        sx_d = r[0, 0] * dx + r[1, 0] * dy + r[2, 0]
        sy_d = r[0, 1] * dx + r[1, 1] * dy + r[2, 1]
        sz_d = r[0, 2] * dx + r[1, 2] * dy + r[2, 2]
        u_s = sx_d / sz_d * fx + cx
        v_s = sy_d / sz_d * fy + cy
        z_src = _bilinear_gather(jnp.where(edge | ~valid_src, 0.0, depth),
                                 u_s, v_s, fill=0.0)
        depth_rot = z_src / sz_d
        color_rot = _bilinear_gather(color.astype(jnp.float32), u_s, v_s,
                                     fill=0.0)
    else:
        depth_rot = jnp.where(edge | ~valid_src, 0.0, depth)
        color_rot = color.astype(jnp.float32)

    # plane set: uniform inverse depth across the (rot-frame) depth range
    big = jnp.where(depth_rot > min_depth, depth_rot, jnp.inf)
    small = jnp.where(depth_rot > min_depth, depth_rot, -jnp.inf)
    z_near = jnp.maximum(jnp.min(big), min_depth)
    z_far = jnp.maximum(jnp.max(small), z_near * 1.001)
    inv_near = 1.0 / z_near
    inv_far = 1.0 / z_far
    d_inv = (inv_near - inv_far) / (num_planes - 1)
    ids = jnp.arange(num_planes, dtype=jnp.float32)
    plane_z = 1.0 / (inv_near - d_inv * ids)  # ascending z = front-first
    plane_tol = tol_scale * plane_z * plane_z * d_inv + 1e-4

    # target x samples rot-frame source at u + disp, disp = -fx*tx/z.
    # Convergence as horizontal image translation (HIT): subtract the
    # disparity of the convergence plane so it lands at zero disparity —
    # the parallel-sensor-shift stereo model, equivalent to the
    # reference's toe-in for small angles without the rotation resample.
    disp = -fx * t[0] * (1.0 / plane_z - conv_inv_z)
    disp = jnp.clip(disp, -(max_disparity - 2.0), max_disparity - 2.0)
    disp_int = jnp.floor(disp).astype(jnp.int32)
    disp_frac = disp - jnp.floor(disp)

    pad_left, pad_right = warp_pallas.pad_widths(w, max_disparity)
    depth_pad = jnp.pad(depth_rot, ((0, 0), (pad_left, pad_right)))
    color_pad = jnp.pad(color_rot.transpose(2, 0, 1),
                        ((0, 0), (0, 0), (pad_left, pad_right)))

    # per-(row-tile, plane) histogram lets the kernel skip planes with
    # no source depth in the tile — on piecewise-smooth scenes most of
    # the sweep vanishes (and the sparse edge-anchor pass almost all)
    active = warp_pallas.plane_activity(depth_rot, inv_near, d_inv,
                                        num_planes)

    best_z, out_color, found = warp_pallas.disparity_sweep(
        depth_pad, color_pad, disp_int, disp_frac, plane_z, plane_tol,
        num_planes=num_planes, pad_left=pad_left, interpret=interpret,
        active=active)

    return WarpResult(color=out_color,
                      depth=jnp.where(found, best_z, INF_DEPTH),
                      mask=found, edge_mask=edge & valid_src)


def stereo_sweep_warp_dual(depth, color, extra, k, transform,
                           num_planes=128, edge_angle_deg=89.0,
                           max_disparity=256, neutralize_rotation=True,
                           conv_inv_z=0.0, min_depth=1e-2, tol_scale=1.6,
                           interpret=None, edge=None):
    """Fused stereo sweep + edge-anchor sweep in ONE kernel pass.

    The movie-config stereo path renders two surfaces per eye: the main
    (edge-culled) surface and an anchor layer of the culled silhouette
    pixels carrying color+normal seeds for the infill
    (reference stereo_rerender.py:589-607, 745-814). Both share the
    projection, so this runs them in one plane loop: the edge-only depth
    rides as a second z-stream, ``color`` is written to whichever
    surface hit, and ``extra`` (H, W, E payload, e.g. encoded normals)
    only to the anchor surface. Versus two stereo_sweep_warp calls this
    saves a full second kernel launch + duplicate color shifts
    (measured: the separate anchor sweep cost 9.3 ms/frame both eyes at
    1080p; see scripts/profile_stereo.py).

    The anchor surface is also swept over the FULL plane set (the
    two-call path used num_planes//4 for anchors), so anchor placement
    is strictly more accurate.

    Returns (WarpResult main, anchor_color (H,W,3), anchor_extra
    (H,W,E), anchor_mask (H,W) bool).
    """
    from metric_depth_video_toolbox_tpu.ops import warp_pallas

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = depth.shape
    depth = depth.astype(jnp.float32)
    r = transform[:3, :3]
    t = transform[:3, 3]

    if edge is None:
        pts_cam = geo.unproject_depth(depth, k, of_by_one=False)
        edge = cell_edge_mask(pts_cam, edge_angle_deg)
    valid_src = depth > min_depth

    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]

    main_depth = jnp.where(edge | ~valid_src, 0.0, depth)
    edge_depth = jnp.where(edge & valid_src, depth, 0.0)
    color_f = color.astype(jnp.float32)
    extra_f = extra.astype(jnp.float32)

    if neutralize_rotation:
        xs = (jnp.arange(w, dtype=jnp.float32) - cx) / fx
        ys = (jnp.arange(h, dtype=jnp.float32) - cy) / fy
        dx, dy = jnp.meshgrid(xs, ys)
        sx_d = r[0, 0] * dx + r[1, 0] * dy + r[2, 0]
        sy_d = r[0, 1] * dx + r[1, 1] * dy + r[2, 1]
        sz_d = r[0, 2] * dx + r[1, 2] * dy + r[2, 2]
        u_s = sx_d / sz_d * fx + cx
        v_s = sy_d / sz_d * fy + cy
        main_depth = _bilinear_gather(main_depth, u_s, v_s,
                                      fill=0.0) / sz_d
        edge_depth = _bilinear_gather(edge_depth, u_s, v_s,
                                      fill=0.0) / sz_d
        color_f = _bilinear_gather(color_f, u_s, v_s, fill=0.0)
        extra_f = _bilinear_gather(extra_f, u_s, v_s, fill=0.0)

    # Plane set from the MAIN (edge-culled) depth only — identical to
    # stereo_sweep_warp so the main surface is bit-equal to the single
    # sweep. Edge pixels sit on the same surfaces as their non-edge
    # neighbours, so anchor depths lie inside this range too; ranging
    # over the resampled edge-only map instead would let silhouette
    # pixels bilinearly blended with the 0-fill (e.g. 3 m next to a
    # hole -> 1.5 m) stretch z_near and shift every plane.
    big = jnp.where(main_depth > min_depth, main_depth, jnp.inf)
    small = jnp.where(main_depth > min_depth, main_depth, -jnp.inf)
    z_near = jnp.maximum(jnp.min(big), min_depth)
    z_far = jnp.maximum(jnp.max(small), z_near * 1.001)
    inv_near = 1.0 / z_near
    inv_far = 1.0 / z_far
    d_inv = (inv_near - inv_far) / (num_planes - 1)
    ids = jnp.arange(num_planes, dtype=jnp.float32)
    plane_z = 1.0 / (inv_near - d_inv * ids)
    plane_tol = tol_scale * plane_z * plane_z * d_inv + 1e-4

    disp = -fx * t[0] * (1.0 / plane_z - conv_inv_z)
    disp = jnp.clip(disp, -(max_disparity - 2.0), max_disparity - 2.0)
    disp_int = jnp.floor(disp).astype(jnp.int32)
    disp_frac = disp - jnp.floor(disp)

    pad_left, pad_right = warp_pallas.pad_widths(w, max_disparity)
    pads = ((0, 0), (pad_left, pad_right))
    depth_pad = jnp.pad(main_depth, pads)
    edepth_pad = jnp.pad(edge_depth, pads)
    shared_pad = jnp.pad(color_f.transpose(2, 0, 1),
                         ((0, 0),) + pads)
    extra_pad = jnp.pad(extra_f.transpose(2, 0, 1),
                        ((0, 0),) + pads)

    block_rows = 32  # dual kernel VMEM budget (see disparity_sweep_dual)
    act_m = warp_pallas.plane_activity(main_depth, inv_near, d_inv,
                                       num_planes, block_rows=block_rows)
    act_e = warp_pallas.plane_activity(edge_depth, inv_near, d_inv,
                                       num_planes, block_rows=block_rows)

    (best_z, out_color, found, a_color, a_extra,
     a_found) = warp_pallas.disparity_sweep_dual(
        depth_pad, edepth_pad, shared_pad, extra_pad, disp_int,
        disp_frac, plane_z, plane_tol, act_m, act_e,
        num_planes=num_planes, pad_left=pad_left,
        block_rows=block_rows, interpret=interpret)

    main = WarpResult(color=out_color,
                      depth=jnp.where(found, best_z, INF_DEPTH),
                      mask=found, edge_mask=edge & valid_src)
    return main, a_color, a_extra, a_found


def warp_pixel_ids(depth, k_src, k_dst, transform, out_hw,
                   subsample=1, remove_edges=False, of_by_one=True):
    """Forward-warp carrying each source pixel's flat id as the payload.

    The TPU equivalent of the reference GL path's R32I pixel-id
    attachment (depth_map_tools.py:660-865): render passes emit id maps
    that :func:`remap_ids_to_img` later chases back to source data.
    Returns (ids (Ht, Wt) int32, -1 where nothing landed; depth buffer).
    """
    h, w = depth.shape
    ids = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w, 1)
    res = forward_warp(depth, ids, k_src, k_dst, transform, out_hw,
                       subsample=subsample, remove_edges=remove_edges,
                       of_by_one=of_by_one)
    out = jnp.round(res.color[..., 0]).astype(jnp.int32)
    return jnp.where(res.mask, out, -1), res.depth


def remap_ids_to_img(rgb_image, id_maps, invalid_color=(0, 0, 0)):
    """Chase pixel ids through a chain of render passes back to the
    source colors (reference depth_map_tools.py:487-539):
    idsN -> ids(N-1) -> ... -> ids1 -> rgb_image. Pure jnp gathers.

    id_maps: list of (Hi, Wi) int32 id images, -1/-out-of-range invalid.
    """
    final_shape = id_maps[-1].shape
    current = id_maps[-1].reshape(-1)
    valid = jnp.ones(current.shape, bool)
    for stage in reversed(range(len(id_maps) - 1)):
        ids = id_maps[stage].reshape(-1)
        ok = (current >= 0) & (current < ids.size)
        valid = valid & ok
        current = jnp.where(ok, ids[jnp.clip(current, 0, ids.size - 1)],
                            -1)
    h0, w0 = rgb_image.shape[:2]
    ok = valid & (current >= 0) & (current < h0 * w0)
    src = rgb_image.reshape(-1, rgb_image.shape[-1])[
        jnp.clip(current, 0, h0 * w0 - 1)]
    inv = jnp.asarray(invalid_color, rgb_image.dtype)
    out = jnp.where(ok[:, None], src, inv)
    return out.reshape(final_shape + (rgb_image.shape[-1],))
