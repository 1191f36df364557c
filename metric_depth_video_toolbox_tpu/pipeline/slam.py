"""Dense SLAM-class camera tracking with global bundle adjustment.

Fills the role of the reference's ``sam_track_video.py`` (Mega-SAM /
DROID-SLAM: CUDA correlation volumes + dense BA,
reference sam_track_video.py:169-206, SURVEY.md §2.4 item 5). TPU-native
re-design instead of a CUDA port:

  - feature tracks come from the jitted pyramidal-LK scan
    (models.tracker) seeded on corner responses — the role of DROID's
    correlation volume lookups;
  - per-pair initial poses from the depth-based solvers (pipeline.align);
  - **global bundle adjustment**: fixed-iteration Gauss-Newton over all
    camera poses jointly, minimizing reprojection error of
    depth-anchored world points, expressed as one jitted program
    (jacfwd over se3 increments, vmapped residuals) — the role of
    DROID's dense BA CUDA kernel. Motion masking weights residuals by a
    per-track movement score (the reference feeds motion-probability
    masks, :233-241). Optional focal refinement mirrors
    ``--optimize_intrinsic`` (:200-206).

Outputs the same artifacts: ``*_transformations.json`` plus an optional
motion-probability video.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import sidecar
from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.ops import codec
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import solvers
from metric_depth_video_toolbox_tpu.utils.host import robust_call, to_host


def _se3_apply(rvec, tvec, pts):
    r = solvers._so3_exp(rvec)
    return pts @ r.T + tvec


@partial(jax.jit, static_argnames=("iters", "optimize_focal"))
def bundle_adjust(track_uv, track_valid, anchor_depth, k, rvecs0, tvecs0,
                  iters=10, optimize_focal=False, damping=1e-3):
    """Global Gauss-Newton bundle adjustment with a Schur complement on
    the poses (the role of DROID-SLAM's dense BA CUDA kernel,
    reference sam_track_video.py:200-206 ``full_ba``).

    Structure exploited: each residual (t, n) touches exactly TWO poses
    (the observing frame t and track n's anchor frame a_n), ONE 1-dof
    structure variable (the track's log-inverse-depth correction), and
    optionally the global focal scale. So the structure block C of the
    normal equations is DIAGONAL, and the system reduces to
    S = Hp - E C^-1 E^T over the (6T+1) pose/focal variables — the
    reference working scale (1500 frames x 512 tracks,
    movie_2_3D.py:189 / sam_track_video.py:200) is a 9001-dim dense
    solve + (T,N) block einsums, all MXU work; the earlier dense-jacfwd
    formulation materialized a (2TN x 6T+N) Jacobian (~56 GB at that
    scale).

    track_uv:     (T, N, 2) observed pixel positions per frame.
    track_valid:  (T, N) observation weights (0 = missing; motion-masked
                  tracks get low weight).
    anchor_depth: (N,) depth of each track in its anchor (first) frame —
                  world points are parameterized as anchor-frame
                  unprojections scaled by a per-track inverse-depth
                  correction (DROID's structure parameterization).
    k:            (3, 3) intrinsics.
    rvecs0/tvecs0: (T, 3) initial world->camera poses (frame 0 fixed).

    Returns (rvecs, tvecs, focal_scale, point_logz, mean_residual).
    """
    t_frames, n_tracks = track_valid.shape
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]

    # anchor = first valid observation (computed once, static shapes)
    first_idx = jnp.argmax(track_valid > 0, axis=0)  # (N,)
    anchor_uv = jnp.take_along_axis(
        track_uv, first_idx[None, :, None], axis=0)[0]  # (N, 2)
    # anchor rays at unit focal scale; focal scale divides them inside
    aray = jnp.stack([(anchor_uv[:, 0] - cx) / fx,
                      (anchor_uv[:, 1] - cy) / fy], axis=-1)  # (N, 2)

    def res_one(packed, uv, w, ar, adepth):
        """One residual from its 14 packed inputs:
        [pose_t (6), pose_a (6), logz, log_f] -> weighted (2,)."""
        pose_t, pose_a = packed[0:6], packed[6:12]
        logz, logf = packed[12], packed[13]
        fscale = jnp.exp(logf) if optimize_focal else 1.0
        z = adepth * jnp.exp(logz)
        p_anchor = jnp.array([ar[0] / fscale * z, ar[1] / fscale * z, z])
        ra = solvers._so3_exp(pose_a[:3])
        pw = ra.T @ (p_anchor - pose_a[3:6])
        rt = solvers._so3_exp(pose_t[:3])
        pc = rt @ pw + pose_t[3:6]
        zc = jnp.maximum(pc[2], 1e-3)
        u = pc[0] / zc * fx * fscale + cx
        v = pc[1] / zc * fy * fscale + cy
        return (jnp.stack([u, v]) - uv) * w

    res_grad = jax.vmap(jax.vmap(
        lambda p, uv, w, ar, ad: (res_one(p, uv, w, ar, ad),
                                  jax.jacfwd(res_one)(p, uv, w, ar, ad)),
        in_axes=(0, 0, 0, 0, 0)), in_axes=(0, 0, 0, None, None))

    t_idx = jnp.arange(t_frames)
    n_idx = jnp.arange(n_tracks)
    np_pose = 6 * t_frames + (1 if optimize_focal else 0)

    def gn_step(_, state):
        rvecs, tvecs, logz, logf = state
        poses = jnp.concatenate([rvecs, tvecs], axis=-1)  # (T, 6)
        packed = jnp.concatenate([
            jnp.broadcast_to(poses[:, None], (t_frames, n_tracks, 6)),
            jnp.broadcast_to(poses[first_idx][None],
                             (t_frames, n_tracks, 6)),
            jnp.broadcast_to(logz[None, :, None],
                             (t_frames, n_tracks, 1)),
            jnp.full((t_frames, n_tracks, 1), logf),
        ], axis=-1)
        r, jac = res_grad(packed, track_uv, track_valid, aray,
                          anchor_depth)  # (T,N,2), (T,N,2,14)
        # gauge fix: frame 0 contributes no pose derivatives
        jt = jac[..., 0:6] * (t_idx[:, None, None, None] != 0)
        ja = jac[..., 6:12] * (first_idx[None, :, None, None] != 0)
        jz = jac[..., 12]   # (T, N, 2)
        jf = jac[..., 13]

        # --- normal equations, pose part (T,T,6,6 block matrix) ------
        h = jnp.zeros((t_frames, t_frames, 6, 6), jnp.float32)
        h_tt = jnp.einsum("tnai,tnaj->tij", jt, jt)
        h = h.at[t_idx, t_idx].add(h_tt)
        h_aa = jnp.einsum("tnai,tnaj->nij", ja, ja)
        h = h.at[first_idx, first_idx].add(h_aa)
        h_ta = jnp.einsum("tnai,tnaj->tnij", jt, ja)  # (T,N,6,6)
        h = h.at[:, first_idx].add(h_ta)
        h = h.at[first_idx, :].add(
            h_ta.transpose(1, 0, 3, 2))  # (N,T,6,6) at rows a_n
        hp = h.transpose(0, 2, 1, 3).reshape(6 * t_frames, 6 * t_frames)

        # --- structure (diagonal) and couplings ----------------------
        c_diag = jnp.einsum("tna,tna->n", jz, jz)
        e = jnp.zeros((t_frames, n_tracks, 6), jnp.float32)
        e = e + jnp.einsum("tnai,tna->tni", jt, jz)
        e = e.at[first_idx, n_idx].add(
            jnp.einsum("tnai,tna->ni", ja, jz))
        e = e.transpose(0, 2, 1).reshape(6 * t_frames, n_tracks)

        g_pose = jnp.zeros((t_frames, 6), jnp.float32)
        g_pose = g_pose + jnp.einsum("tnai,tna->ti", jt, r)
        g_pose = g_pose.at[first_idx].add(
            jnp.einsum("tnai,tna->ni", ja, r))
        g_pose = g_pose.reshape(6 * t_frames)
        g_z = jnp.einsum("tna,tna->n", jz, r)

        if optimize_focal:
            h_ff = jnp.sum(jf * jf)[None, None]
            h_pf = jnp.zeros((t_frames, 6), jnp.float32)
            h_pf = h_pf + jnp.einsum("tnai,tna->ti", jt, jf)
            h_pf = h_pf.at[first_idx].add(
                jnp.einsum("tnai,tna->ni", ja, jf))
            h_pf = h_pf.reshape(6 * t_frames, 1)
            hp = jnp.block([[hp, h_pf], [h_pf.T, h_ff]])
            e_f = jnp.einsum("tna,tna->n", jf, jz)[None]  # (1, N)
            e = jnp.concatenate([e, e_f], axis=0)
            g_pose = jnp.concatenate(
                [g_pose, jnp.sum(jf * r)[None]])

        # Levenberg damping + absolute floor (dead tracks / frames)
        floor = 1e-5 * (1.0 + jnp.max(jnp.abs(jnp.diag(hp))))
        hp = hp + damping * jnp.diag(jnp.diag(hp)) \
            + floor * jnp.eye(np_pose)
        c_inv = 1.0 / (c_diag * (1.0 + damping)
                       + 1e-5 * (1.0 + jnp.max(c_diag)))

        # --- Schur complement on poses -------------------------------
        s = hp - (e * c_inv[None, :]) @ e.T
        rhs = -(g_pose - e @ (c_inv * g_z))
        dy = jnp.linalg.solve(s, rhs)
        dz = c_inv * (-g_z - e.T @ dy)
        dy = jnp.nan_to_num(dy)
        dz = jnp.nan_to_num(dz)

        dpose = dy[: 6 * t_frames].reshape(t_frames, 6)
        rvecs = rvecs + dpose[:, :3]
        tvecs = tvecs + dpose[:, 3:]
        logz = logz + dz
        if optimize_focal:
            logf = logf + dy[-1]
        # gauge: frame 0 pinned exactly
        rvecs = rvecs.at[0].set(rvecs0[0])
        tvecs = tvecs.at[0].set(tvecs0[0])
        return rvecs, tvecs, logz, logf

    state0 = (rvecs0, tvecs0, jnp.zeros(n_tracks, jnp.float32),
              jnp.zeros((), jnp.float32))
    rvecs, tvecs, logz, logf = jax.lax.fori_loop(0, iters, gn_step,
                                                 state0)

    # final residual statistics
    poses = jnp.concatenate([rvecs, tvecs], axis=-1)
    packed = jnp.concatenate([
        jnp.broadcast_to(poses[:, None], (t_frames, n_tracks, 6)),
        jnp.broadcast_to(poses[first_idx][None], (t_frames, n_tracks, 6)),
        jnp.broadcast_to(logz[None, :, None], (t_frames, n_tracks, 1)),
        jnp.full((t_frames, n_tracks, 1), logf),
    ], axis=-1)
    res = jax.vmap(jax.vmap(res_one, in_axes=(0, 0, 0, 0, 0)),
                   in_axes=(0, 0, 0, None, None))(
        packed, track_uv, track_valid, aray, anchor_depth)
    denom = jnp.maximum(track_valid.sum(), 1.0)
    mean_res = jnp.sum(jnp.linalg.norm(res, axis=-1)) / denom
    fscale = jnp.exp(logf) if optimize_focal else jnp.ones(())
    return rvecs, tvecs, fscale, logz, mean_res


def motion_weights(dense_tracks, transforms, depths_at_tracks, k,
                   z_thresh=2.0):
    """Per-track static-scene weights: tracks whose reprojection moves
    inconsistently with the rigid camera model get down-weighted (the
    motion-probability input of the reference, sam_track_video.py:190)."""
    t, n = dense_tracks.shape[:2]
    errs = np.zeros(n)
    counts = np.zeros(n) + 1e-9
    for fi in range(1, t):
        v = (dense_tracks[fi, :, 2] > 0) & (dense_tracks[0, :, 2] > 0)
        if v.sum() < 8:
            continue
        # predict frame-fi position from frame-0 unprojection
        z0 = depths_at_tracks[0]
        p0 = np.stack([(dense_tracks[0, :, 0] - k[0, 2]) / k[0, 0] * z0,
                       (dense_tracks[0, :, 1] - k[1, 2]) / k[1, 1] * z0,
                       z0], axis=-1)
        m = np.linalg.inv(transforms[fi]) @ transforms[0]
        pc = p0 @ m[:3, :3].T + m[:3, 3]
        zc = np.maximum(pc[:, 2], 1e-3)
        u = pc[:, 0] / zc * k[0, 0] + k[0, 2]
        vv = pc[:, 1] / zc * k[1, 1] + k[1, 2]
        e = np.hypot(u - dense_tracks[fi, :, 0],
                     vv - dense_tracks[fi, :, 1])
        errs[v] += e[v]
        counts[v] += 1
    mean_e = errs / counts
    mu, sd = mean_e.mean(), mean_e.std() + 1e-9
    zscores = (mean_e - mu) / sd
    return np.where(zscores > z_thresh, 0.1, 1.0).astype(np.float32)


def slam_track_video(color_video, depth_video, xfov=None, yfov=None,
                     max_depth=100.0, max_frames=-1, output=None,
                     optimize_intrinsic=False, ba_iters=10,
                     max_tracks=512, grid=24, save_motion_video=False,
                     mask_video=None):
    """Full tracking pipeline: LK tracks -> pairwise init -> global BA.

    Returns (transformations_path, mean_reprojection_error_px).
    """
    from metric_depth_video_toolbox_tpu.pipeline import align as align_mod
    from metric_depth_video_toolbox_tpu.pipeline import tracking as track_mod

    track_path = track_mod.track_video(color_video, grid=grid,
                                       max_frames=max_frames)
    # pairwise initial poses (two-group solver)
    init_path = align_mod.align_video(
        depth_video, track_path, xfov=xfov, yfov=yfov, max_depth=max_depth,
        max_frames=max_frames, max_tracks=max_tracks,
        output=depth_video + "_init_transformations.json")
    transforms = sidecar.load_transformations(init_path)  # c2w

    frames_tr = sidecar.load_tracking(track_path)
    dense, _ = sidecar.tracking_to_dense(frames_tr, max_tracks=max_tracks)
    t_total = min(len(transforms), dense.shape[0])
    dense = dense[:t_total]
    transforms = transforms[:t_total]

    dv = vio.DepthVideoReader(depth_video, max_depth)
    h, w = dv.height, dv.width
    k = np.asarray(geo.camera_matrix_from_fov(
        w, h, xfov_deg=xfov, yfov_deg=yfov), np.float32)

    # per-frame track depths (for anchors + motion weights)
    depths_at = np.zeros((t_total, dense.shape[1]), np.float32)
    fi = 0
    while fi < t_total:
        d = dv.read_depth_batch(1)
        if d is None:
            break
        xi = np.clip(np.round(dense[fi, :, 0]).astype(int), 0, w - 1)
        yi = np.clip(np.round(dense[fi, :, 1]).astype(int), 0, h - 1)
        depths_at[fi] = d[0][yi, xi]
        fi += 1
    dv.close()

    weights = motion_weights(dense, transforms, depths_at, k)
    if mask_video:
        # external motion mask (the reference feeds motion-probability
        # masks into DROID, sam_track_video.py:190): tracks that ever
        # land on a masked pixel are down-weighted to zero
        mv = vio.VideoReader(mask_video, max_frames=max_frames)
        masked_ever = np.zeros(dense.shape[1], bool)
        for fi in range(t_total):
            m = mv.read_batch(1)
            if m is None:
                break
            gray = m[0][..., 0]
            xi = np.clip(np.round(dense[fi, :, 0]).astype(int), 0, w - 1)
            yi = np.clip(np.round(dense[fi, :, 1]).astype(int), 0, h - 1)
            masked_ever |= (dense[fi, :, 2] > 0) & (gray[yi, xi] > 127)
        mv.close()
        weights = np.where(masked_ever, 0.0, weights)
    valid = dense[..., 2] * weights[None, :]

    first_idx = np.argmax(dense[..., 2] > 0, axis=0)
    anchor_depth = depths_at[first_idx, np.arange(dense.shape[1])]
    anchor_depth = np.maximum(anchor_depth, 1e-2)

    # w2c initials from c2w
    w2c = np.linalg.inv(transforms)
    rvecs0 = np.zeros((t_total, 3), np.float32)
    for i in range(t_total):
        rvecs0[i] = _log_so3(w2c[i, :3, :3])
    tvecs0 = w2c[:, :3, 3].astype(np.float32)

    rv, tv, fscale, logz, mean_res = [to_host(x) for x in bundle_adjust(
        jnp.asarray(dense[..., :2]), jnp.asarray(valid),
        jnp.asarray(anchor_depth), jnp.asarray(k),
        jnp.asarray(rvecs0), jnp.asarray(tvecs0), iters=ba_iters,
        optimize_focal=optimize_intrinsic)]

    out_transforms = np.zeros((t_total, 4, 4), np.float32)
    for i in range(t_total):
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.asarray(solvers._so3_exp(jnp.asarray(rv[i])))
        m[:3, 3] = tv[i]
        out_transforms[i] = np.linalg.inv(m)  # back to cam-to-world

    output = output or (depth_video + "_transformations.json")
    sidecar.save_transformations(output, out_transforms)

    if save_motion_video:
        _write_motion_video(color_video, dense, weights, output)
    return output, float(mean_res)


def _global_ba_refine(color_video, depth, k, c2w_init, max_frames=-1,
                      mask_video=None, ba_iters=10, max_tracks=512,
                      grid=24):
    """Final global BA over the whole clip — the role of the reference's
    ``droid.terminate(full_ba=True)`` backend (sam_track_video.py:
    200-206): LK tracks + depth-anchored Gauss-Newton jointly over ALL
    poses, initialized from the windowed front-end's chained estimates
    so cross-window drift is bounded globally instead of accumulating.

    ``depth``: (T, H, W) metric depth already in host memory.
    Returns (c2w (T, 4, 4), mean_reproj_err_px)."""
    from metric_depth_video_toolbox_tpu.pipeline import tracking as track_mod

    track_path = track_mod.track_video(color_video, grid=grid,
                                       max_frames=max_frames)
    frames_tr = sidecar.load_tracking(track_path)
    dense, _ = sidecar.tracking_to_dense(frames_tr, max_tracks=max_tracks)
    t_total = min(len(c2w_init), dense.shape[0], depth.shape[0])
    dense = dense[:t_total]
    c2w = np.asarray(c2w_init[:t_total], np.float32)
    h, w = depth.shape[1:3]

    xi = np.clip(np.round(dense[..., 0]).astype(int), 0, w - 1)
    yi = np.clip(np.round(dense[..., 1]).astype(int), 0, h - 1)
    depths_at = depth[np.arange(t_total)[:, None], yi, xi]

    weights = motion_weights(dense, c2w, depths_at, k)
    if mask_video:
        mv = vio.VideoReader(mask_video, max_frames=max_frames)
        masked_ever = np.zeros(dense.shape[1], bool)
        for fi in range(t_total):
            m = mv.read_batch(1)
            if m is None:
                break
            gray = m[0][..., 0]
            masked_ever |= ((dense[fi, :, 2] > 0)
                            & (gray[yi[fi], xi[fi]] > 127))
        mv.close()
        weights = np.where(masked_ever, 0.0, weights)
    valid = dense[..., 2] * weights[None, :]

    first_idx = np.argmax(dense[..., 2] > 0, axis=0)
    anchor_depth = np.maximum(
        depths_at[first_idx, np.arange(dense.shape[1])], 1e-2)

    w2c = np.linalg.inv(c2w)
    rvecs0 = np.stack([_log_so3(w2c[i, :3, :3])
                       for i in range(t_total)]).astype(np.float32)
    tvecs0 = w2c[:, :3, 3].astype(np.float32)

    rv, tv, _fs, _lz, mean_res = [to_host(x) for x in bundle_adjust(
        jnp.asarray(dense[..., :2]), jnp.asarray(valid),
        jnp.asarray(anchor_depth), jnp.asarray(k),
        jnp.asarray(rvecs0), jnp.asarray(tvecs0), iters=ba_iters)]

    out = np.zeros((t_total, 4, 4), np.float32)
    for i in range(t_total):
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.asarray(solvers._so3_exp(jnp.asarray(rv[i])))
        m[:3, 3] = tv[i]
        out[i] = np.linalg.inv(m)
    return out, float(mean_res)


# --- learned (DROID-class) front-end ---------------------------------------


def _window_edges(w, radius):
    ii, jj = [], []
    for i in range(w):
        for j in range(max(0, i - radius), min(w, i + radius + 1)):
            if i != j:
                ii.append(i)
                jj.append(j)
    return np.asarray(ii, np.int32), np.asarray(jj, np.int32)


def _build_window_solver(model, cfg, k8, w_frames, h8, w8, iters,
                         gn_inner, radius):
    """One jitted program: correlation pyramids over the window's frame
    graph, ``iters`` learned update steps (GRU -> flow revision +
    confidence), each followed by ``gn_inner`` pose Gauss-Newton steps
    accumulating per-edge normal equations into a (6W, 6W) system —
    the DBA structure with poses only (metric depth is given, as in the
    reference's Mega-SAM feed, sam_track_video.py:190)."""
    from metric_depth_video_toolbox_tpu.models import droid as droid_mod
    ii, jj = _window_edges(w_frames, radius)
    ii_j = jnp.asarray(ii)
    n_e = len(ii)
    p_pix = h8 * w8
    fx, fy, cx, cy = k8[0, 0], k8[1, 1], k8[0, 2], k8[1, 2]
    xs = (np.arange(w8, dtype=np.float32) + 0.0)
    ys = (np.arange(h8, dtype=np.float32) + 0.0)
    grid = np.stack(np.meshgrid(xs, ys), axis=-1)  # (h8, w8, 2) x,y

    def unproject(d):  # (h8, w8) -> (h8, w8, 3) cam points
        x = (grid[..., 0] - cx) / fx * d
        y = (grid[..., 1] - cy) / fy * d
        return jnp.stack([x, y, d], axis=-1)

    def proj(pts):  # (..., 3) -> (..., 2)
        z = jnp.maximum(pts[..., 2], 1e-4)
        return jnp.stack([fx * pts[..., 0] / z + cx,
                          fy * pts[..., 1] / z + cy], axis=-1)

    def induced(rot, tr, pts_cam):
        """Current w2c (W,3,3),(W,3) + per-frame cam points ->
        per-edge target coords + target-frame depth."""
        xw = jnp.einsum("ephc,ecd->ephd",
                        pts_cam[ii] - tr[ii][:, None, None],
                        rot[ii])  # R_i^T (X - t_i), rows as (..,3)@R
        xj = jnp.einsum("ephc,edc->ephd", xw, rot[jj]) \
            + tr[jj][:, None, None]
        return proj(xj), xj[..., 2]

    def edge_res(xi, ri0, ti0, rj0, tj0, pts, tgt):
        """(12,) se3 increments on poses i, j -> (P*2,) residuals."""
        dri = solvers._so3_exp(xi[:3])
        drj = solvers._so3_exp(xi[6:9])
        ri = dri @ ri0
        tci = dri @ ti0 + xi[3:6]
        rj = drj @ rj0
        tcj = drj @ tj0 + xi[9:12]
        xw = (pts.reshape(-1, 3) - tci) @ ri
        xj = xw @ rj.T + tcj
        return (proj(xj) - tgt.reshape(-1, 2)).reshape(-1)

    res_and_jac = jax.vmap(
        lambda *a: (edge_res(*a),
                    jax.jacfwd(edge_res)(*a)))

    rows6 = np.arange(6, dtype=np.int32)

    def gn_step(rot, tr, pts_cam, target, wgt, eta):
        zero = jnp.zeros((n_e, 12), jnp.float32)
        r, j = res_and_jac(zero, rot[ii], tr[ii], rot[jj], tr[jj],
                           pts_cam[ii], target)
        w_flat = wgt.reshape(n_e, p_pix * 2)
        h_e = jnp.einsum("epk,ep,epl->ekl", j, w_flat, j)
        b_e = jnp.einsum("epk,ep->ek", j, w_flat * r)
        hdim = 6 * w_frames
        big_h = jnp.zeros((hdim, hdim), jnp.float32)
        big_b = jnp.zeros((hdim,), jnp.float32)
        idx_i = 6 * ii[:, None] + rows6[None]
        idx_j = 6 * jj[:, None] + rows6[None]
        big_h = big_h.at[idx_i[:, :, None], idx_i[:, None, :]].add(
            h_e[:, :6, :6])
        big_h = big_h.at[idx_i[:, :, None], idx_j[:, None, :]].add(
            h_e[:, :6, 6:])
        big_h = big_h.at[idx_j[:, :, None], idx_i[:, None, :]].add(
            h_e[:, 6:, :6])
        big_h = big_h.at[idx_j[:, :, None], idx_j[:, None, :]].add(
            h_e[:, 6:, 6:])
        big_b = big_b.at[idx_i].add(b_e[:, :6])
        big_b = big_b.at[idx_j].add(b_e[:, 6:])
        # damping: LM floor + the learned per-frame eta (DROID's agg
        # damps the depth block; with fixed metric depth it rides the
        # pose diagonal instead — documented deviation)
        damp = 1e-4 + jnp.repeat(eta.mean(axis=(1, 2)), 6)
        big_h = big_h + jnp.diag(damp) \
            + 1e-6 * jnp.eye(hdim, dtype=jnp.float32)
        # gauge: freeze frame 0
        big_h = big_h.at[:6].set(0.0).at[:, :6].set(0.0)
        big_h = big_h.at[rows6, rows6].set(1.0)
        big_b = big_b.at[:6].set(0.0)
        delta = jnp.linalg.solve(big_h, -big_b).reshape(w_frames, 6)
        drot = jax.vmap(solvers._so3_exp)(delta[:, :3])
        rot = jnp.einsum("wab,wbc->wac", drot, rot)
        tr = jnp.einsum("wab,wb->wa", drot, tr) + delta[:, 3:]
        return rot, tr

    @jax.jit
    def solve(params, fmap, net0, inp0, depth8, wmask8):
        pyr = droid_mod.corr_pyramid(fmap[ii], fmap[jj],
                                     cfg.corr_levels)
        net = net0[ii]
        inp = inp0[ii]
        pts_cam = jax.vmap(unproject)(depth8)
        rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                               (w_frames, 3, 3))
        tr = jnp.zeros((w_frames, 3), jnp.float32)
        coords1, _ = induced(rot, tr, pts_cam)
        target = coords1
        g = jnp.asarray(grid)
        eta = jnp.zeros((w_frames, h8, w8), jnp.float32)
        for _ in range(iters):
            coords1, zj = induced(rot, tr, pts_cam)
            corr = droid_mod.corr_lookup(pyr, coords1, cfg.corr_radius)
            flow_in = jnp.concatenate(
                [coords1 - g[None], target - coords1], axis=-1)
            net, delta, weight, eta, _ = model.apply(
                params, net, inp, corr, flow_in, ii_j, w_frames,
                method=lambda m, *a: m.update(*a))
            target = coords1 + delta
            ok = ((zj > 1e-3)
                  & (target[..., 0] >= 0) & (target[..., 0] <= w8 - 1)
                  & (target[..., 1] >= 0) & (target[..., 1] <= h8 - 1)
                  & (depth8[ii] > 1e-3))
            wgt = weight * (ok & (wmask8[ii] > 0.5))[..., None]
            for _ in range(gn_inner):
                rot, tr = gn_step(rot, tr, pts_cam, target, wgt, eta)
        coords1, _ = induced(rot, tr, pts_cam)
        resid = jnp.sqrt(jnp.sum((coords1 - target) ** 2, axis=-1))
        wsum = jnp.maximum(wgt.mean(axis=-1).sum(), 1.0)
        mean_res = (resid * wgt.mean(axis=-1)).sum() / wsum
        return rot, tr, mean_res
    return solve


def droid_track_video(color_video, depth_video, params=None, cfg=None,
                      xfov=None, yfov=None, max_depth=100.0,
                      max_frames=-1, output=None, window=12, radius=2,
                      iters=6, gn_inner=2, work_long=336,
                      mask_video=None, rng_seed=0, batch=8,
                      global_ba=True, ba_iters=10):
    """Learned (DROID-class) camera tracking: correlation volumes + the
    trained ConvGRU update operator + pose DBA — the reference's
    Mega-SAM path (sam_track_video.py:169-206) as one jitted window
    program, with identity-init poses and SE3 chaining across windows
    (overlap 1). ``params``: a converted megasam/droid checkpoint
    (models.convert.convert_droid); without one the same graph runs
    random-init (tests). ``global_ba``: finish with a full-clip bundle
    adjustment over LK tracks initialized from the windowed poses —
    the role of the reference's ``droid.terminate(full_ba=True)``
    backend — so drift does not accumulate monotonically across
    windows. Returns (transformations_path, mean_residual); with
    ``global_ba`` the residual is the global mean reprojection error
    in px (full-clip), otherwise the window-local flow residual.
    """
    from metric_depth_video_toolbox_tpu.models import droid as droid_mod

    cfg = cfg or (droid_mod.config_from_params(params)
                  if params is not None else droid_mod.DROID_TINY)
    model = droid_mod.DroidNet(cfg)

    frames, _fps = vio.read_video_frames(color_video,
                                         max_frames=max_frames)
    t_total = frames.shape[0]
    dv = vio.DepthVideoReader(depth_video, max_depth)
    depth = dv.read_depth_batch(t_total)
    dv.close()
    t_total = min(t_total, depth.shape[0])
    frames, depth = frames[:t_total], depth[:t_total]
    h, w = frames.shape[1:3]

    scale = work_long / max(h, w)
    wh = max(16, int(round(h * scale / 16)) * 16)
    ww = max(16, int(round(w * scale / 16)) * 16)
    h8, w8 = wh // 8, ww // 8
    k_full = np.asarray(geo.camera_matrix_from_fov(
        w, h, xfov_deg=xfov, yfov_deg=yfov), np.float32)
    k8 = k_full.copy()
    k8[0] *= ww / w / 8.0
    k8[1] *= wh / h / 8.0

    if params is None:
        params = model.init(jax.random.PRNGKey(rng_seed),
                            jnp.zeros((1, wh, ww, 3)))

    @jax.jit
    def feat_step(p, imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], wh, ww, 3), "bilinear")
        return model.apply(p, x, method=lambda m, im: m.features(im))

    fmaps, nets, inps = [], [], []
    for s in range(0, t_total, batch):
        chunk = frames[s:s + batch]
        n = chunk.shape[0]
        if n < batch:
            chunk = np.pad(chunk, ((0, batch - n),) + ((0, 0),) * 3,
                           mode="edge")
        fm, ne, ip = robust_call(feat_step, params, jnp.asarray(chunk))
        fmaps.append(to_host(fm)[:n])
        nets.append(to_host(ne)[:n])
        inps.append(to_host(ip)[:n])
    fmaps = np.concatenate(fmaps)
    nets = np.concatenate(nets)
    inps = np.concatenate(inps)

    depth8 = np.asarray(jax.image.resize(
        jnp.asarray(depth), (t_total, h8, w8), "bilinear"))
    if mask_video:
        mv = vio.VideoReader(mask_video, max_frames=max_frames)
        wmask8 = np.ones((t_total, h8, w8), np.float32)
        for fi in range(t_total):
            m = mv.read_batch(1)
            if m is None:
                break
            mm = np.asarray(jax.image.resize(
                jnp.asarray(m[0][..., 0].astype(np.float32)),
                (h8, w8), "bilinear"))
            wmask8[fi] = (mm <= 127).astype(np.float32)
        mv.close()
    else:
        wmask8 = np.ones((t_total, h8, w8), np.float32)

    window = max(2, min(window, t_total))
    solver_cache = {}
    out_w2c = np.zeros((t_total, 4, 4), np.float32)
    out_w2c[:] = np.eye(4, dtype=np.float32)
    residuals = []
    start = 0
    base = np.eye(4, dtype=np.float32)  # w2c of the window's frame 0
    while True:
        end = min(start + window, t_total)
        wlen = end - start
        if wlen < 2:
            break
        if wlen not in solver_cache:
            solver_cache[wlen] = _build_window_solver(
                model, cfg, k8, wlen, h8, w8, iters, gn_inner, radius)
        rot, tr, mres = robust_call(
            solver_cache[wlen], params,
            jnp.asarray(fmaps[start:end]), jnp.asarray(nets[start:end]),
            jnp.asarray(inps[start:end]), jnp.asarray(depth8[start:end]),
            jnp.asarray(wmask8[start:end]))
        rot, tr = to_host(rot), to_host(tr)
        residuals.append(float(mres))
        for i in range(wlen):
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = rot[i]
            m[:3, 3] = tr[i]
            out_w2c[start + i] = m @ base  # local is relative to frame0
        if end >= t_total:
            break
        base = out_w2c[end - 1].copy()  # overlap-1 chaining
        start = end - 1

    c2w = np.linalg.inv(out_w2c)
    mean_res = float(np.mean(residuals)) if residuals else 0.0
    if global_ba and t_total >= 3:
        # reference backend: droid.terminate(full_ba=True) — one global
        # BA over the whole clip, seeded by the windowed front-end
        c2w, mean_res = _global_ba_refine(
            color_video, depth, k_full, c2w, max_frames=max_frames,
            mask_video=mask_video, ba_iters=ba_iters)
    output = output or (depth_video + "_transformations.json")
    sidecar.save_transformations(output, c2w)
    return output, mean_res


def _log_so3(r):
    """Rotation matrix -> axis-angle (host, numpy)."""
    cos = np.clip((np.trace(r) - 1) / 2, -1, 1)
    theta = np.arccos(cos)
    if theta < 1e-8:
        return np.zeros(3, np.float32)
    w = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    return (w * theta / (2 * np.sin(theta))).astype(np.float32)


def _write_motion_video(color_video, dense, weights, output_base):
    """Debug motion-probability video (red = moving tracks),
    reference sam_track_video.py:233-241."""
    frames, fps = vio.read_video_frames(color_video)
    t = min(frames.shape[0], dense.shape[0])
    for fi in range(t):
        for ti in range(dense.shape[1]):
            if dense[fi, ti, 2] > 0:
                x, y = int(dense[fi, ti, 0]), int(dense[fi, ti, 1])
                if 0 <= x < frames.shape[2] and 0 <= y < frames.shape[1]:
                    col = [255, 40, 40] if weights[ti] < 0.5 else \
                        [40, 255, 40]
                    frames[fi, max(0, y - 1):y + 2,
                           max(0, x - 1):x + 2] = col
    vio.save_rgb_video(frames[:t], output_base + "_motion.mkv", fps)
