"""Track-based camera aligner: 2D tracks + depth video -> per-frame 4x4
camera transforms (``*_transformations.json``).

Capability parity with reference ``align_3d_points.py`` (call stack
SURVEY.md §3.4) with its three pose solvers per frame pair:

  - 'hybrid'      (reference --use_madpose): joint pose + per-frame depth
                  scale/shift, here an alternating closed-form solve
                  (rigid Kabsch <-> depth scale) instead of madpose's
                  C++/Ceres RANSAC.
  - 'stationary'  (--assume_stationary_camera): rotation-only Kabsch on
                  distant points (reference :280-285).
  - 'two_group'   (default): 3 iterations of [distant-rotation ->
                  close-point x/y shift] + a 20-step z line search that
                  matches the mean 2D spread to the reference frame
                  (reference :286-383).

TPU-first re-design: tracks become a dense (T, N, 3) [x, y, valid] array
(io.sidecar.tracking_to_dense); every per-pair solve is a fixed-shape
jitted program using *weights* instead of boolean indexing, so the whole
sequence of frame pairs could also be lax.scan-ed on device. The host
loop streams depth frames (keeps only 2, like the reference :535).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import sidecar
from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.ops import codec
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import solvers
from metric_depth_video_toolbox_tpu.utils.host import to_host


def _sample_depth(depth, pts_2d):
    """Nearest-pixel depth lookup for (N, 2) float pixel coords."""
    h, w = depth.shape
    xi = jnp.clip(jnp.round(pts_2d[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(pts_2d[:, 1]).astype(jnp.int32), 0, h - 1)
    return depth[yi, xi]


def _weighted_mean(x, w, axis=None):
    return jnp.sum(x * w, axis=axis) / jnp.maximum(jnp.sum(w, axis=axis),
                                                   1e-9)


@partial(jax.jit, static_argnames=("iters", "z_steps"))
def solve_pair_two_group(pts_2d, ref_2d, depth_cur, depth_ref, k, valid,
                         iters=3, z_steps=20):
    """The reference's default two-group solver, fixed-shape.

    pts_2d/ref_2d: (N, 2) track positions in current / previous frame.
    depth_cur/depth_ref: (H, W) metric depth of the two frames.
    valid: (N,) 1.0 where the track exists in both frames.
    Returns 4x4 transform taking current-frame points to ref-frame space.
    """
    z_cur = _sample_depth(depth_cur, pts_2d)
    z_ref = _sample_depth(depth_ref, ref_2d)
    p3 = geo.unproject_2d_points(pts_2d, z_cur, k)
    r3 = geo.unproject_2d_points(ref_2d, z_ref, k)

    mean_depth = _weighted_mean(p3[:, 2], valid)
    distant = valid * (p3[:, 2] > mean_depth)
    close = valid * (p3[:, 2] < mean_depth)
    # degenerate fallback: if a group is empty use all valid points
    distant = jnp.where(jnp.sum(distant) > 2, distant, valid)
    close = jnp.where(jnp.sum(close) > 2, close, valid)

    total = jnp.eye(4, dtype=jnp.float32)

    def body(_, carry):
        total, p3 = carry
        rot = solvers.rigid_transform(p3, r3, weights=distant,
                                      zero_centroid=True)
        total = total @ rot
        p3 = geo.transform_points(p3, rot)

        close_rot = solvers.rigid_transform(p3, r3, weights=close,
                                            zero_centroid=True)
        cmean = _weighted_mean(p3, close[:, None], axis=0)
        moved = geo.transform_points(cmean[None], close_rot)[0]
        shift = (moved - cmean).at[2].set(0.0)
        tr = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(shift)
        total = total @ tr
        p3 = geo.transform_points(p3, tr)
        return total, p3

    total, p3 = jax.lax.fori_loop(0, iters, body, (total, p3))
    final_rot = solvers.rigid_transform(p3, r3, weights=distant,
                                        zero_centroid=True)
    total = total @ final_rot
    p3 = geo.transform_points(p3, final_rot)

    # z line search: move along z until the projected 2D spread matches the
    # reference frame's (reference :333-383).
    center = jnp.array([k[0, 2], k[1, 2]], jnp.float32)
    ref_dist = jnp.linalg.norm(_weighted_mean(ref_2d, valid[:, None], 0)
                               - center)

    def zbody(_, carry):
        total, p3, step, direction, prev_err = carry
        uv, _ = geo.project_points(p3, k)
        cur = jnp.linalg.norm(_weighted_mean(uv, valid[:, None], 0) - center)
        err = jnp.abs(cur - ref_dist)
        worse = (prev_err >= 0) & (err > prev_err)
        step = jnp.where(worse & (direction < 0), 0.0001, step)
        direction = jnp.where(worse, -direction, direction)
        done = err < 1e-5
        dz = jnp.where(done, 0.0, step * direction)
        tr = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(dz)
        p3 = geo.transform_points(p3, tr)
        total = total @ tr
        return total, p3, step, direction, err

    total, p3, _, _, _ = jax.lax.fori_loop(
        0, z_steps, zbody, (total, p3, jnp.float32(0.002),
                            jnp.float32(1.0), jnp.float32(-1.0)))
    return total


@jax.jit
def solve_pair_stationary(pts_2d, ref_2d, depth_cur, depth_ref, k, valid):
    """Rotation-only solve on distant points (locked camera,
    reference :280-285)."""
    z_cur = _sample_depth(depth_cur, pts_2d)
    z_ref = _sample_depth(depth_ref, ref_2d)
    p3 = geo.unproject_2d_points(pts_2d, z_cur, k)
    r3 = geo.unproject_2d_points(ref_2d, z_ref, k)
    mean_depth = _weighted_mean(p3[:, 2], valid)
    distant = valid * (p3[:, 2] > mean_depth)
    distant = jnp.where(jnp.sum(distant) > 2, distant, valid)
    return solvers.rigid_transform(p3, r3, weights=distant,
                                   zero_centroid=True)


@partial(jax.jit, static_argnames=("iters", "hypotheses"))
def solve_pair_hybrid(pts_2d, ref_2d, depth_cur, depth_ref, k, valid,
                      iters=6, hypotheses=64, inlier_px=6.0):
    """Joint pose + per-frame depth scale with RANSAC (madpose-class
    hybrid estimator, reference align_3d_points.py:123-147,244-264):

    1. ``hypotheses`` vmapped minimal-set (3-point) Umeyama sim3 fits,
       sampled from the valid tracks (fixed fan-out — TPU-friendly
       RANSAC, same pattern as the PnP solver in ops.solvers);
    2. each hypothesis scored by 2D REPROJECTION inlier count
       (madpose's hybrid cost reprojects; pure 3D transfer error would
       let depth outliers vote);
    3. final weighted Umeyama on the best hypothesis's inliers.

    Scale-only by design — a free depth *offset* is degenerate with
    camera z-translation without epipolar constraints; the reference
    itself only consumes pose + the scale sanity value.
    Returns (4x4 transform, scale).
    """
    del iters
    z_cur = _sample_depth(depth_cur, pts_2d)
    z_ref = _sample_depth(depth_ref, ref_2d)
    p3 = geo.unproject_2d_points(pts_2d, z_cur, k)
    r3 = geo.unproject_2d_points(ref_2d, z_ref, k)
    n = p3.shape[0]

    def reproj_inliers(s, r, t):
        q = (s * (p3 @ r.T) + t)
        z = jnp.maximum(q[:, 2], 1e-6)
        u = q[:, 0] / z * k[0, 0] + k[0, 2]
        v = q[:, 1] / z * k[1, 1] + k[1, 2]
        err = jnp.hypot(u - ref_2d[:, 0], v - ref_2d[:, 1])
        # hybrid cost: reprojection alone is blind to depth outliers
        # (a wrong-depth point still projects near its track when the
        # baseline is small) — madpose adds depth-consistency terms for
        # exactly this reason; 5% relative 3D transfer error gates them
        d3 = jnp.linalg.norm(q - r3, axis=-1) / jnp.maximum(
            jnp.linalg.norm(r3, axis=-1), 1e-6)
        return valid * (err < inlier_px) * (d3 < 0.05), err

    # fixed-fanout minimal hypotheses
    key = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.maximum(valid, 1e-9))
    idx = jax.random.categorical(
        key, jnp.broadcast_to(logits, (hypotheses * 3, n)), axis=-1)
    idx = idx.reshape(hypotheses, 3)

    def one_hyp(sel):
        w3 = jnp.zeros(n).at[sel].add(1.0)
        s, r, t = solvers.umeyama_sim3(p3, r3, weights=w3)
        inl, _ = reproj_inliers(s, r, t)
        return jnp.sum(inl)

    scores = jax.vmap(one_hyp)(idx)
    best = idx[jnp.argmax(scores)]
    w3 = jnp.zeros(n).at[best].add(1.0)
    s0, r0, t0 = solvers.umeyama_sim3(p3, r3, weights=w3)
    inl, _ = reproj_inliers(s0, r0, t0)
    # degenerate guard: if the best hypothesis has too few inliers, fall
    # back to all valid tracks (small-motion pairs are near-degenerate
    # for minimal sets but fine globally)
    use = jnp.where(jnp.sum(inl) >= 8, inl, valid)
    s, r, t = solvers.umeyama_sim3(p3, r3, weights=use)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(r).at[:3, 3].set(t)
    return m, s


SOLVERS = {
    "two_group": solve_pair_two_group,
    "stationary": solve_pair_stationary,
    "hybrid": solve_pair_hybrid,
}


def _triangulation_diagnostics(cur, cur_z, past, past_z, t_cur, t_past, k):
    """Forward-intersection residuals vs an earlier frame (reference
    align_3d_points.py:390-480): per-track ray angle, law-of-sines
    triangulated range, and residual against the measured depth range.
    Returns a per-frame stats dict or None (degenerate geometry)."""
    ok = (cur[:, 2] > 0) & (past[:, 2] > 0) & (cur_z > 1e-3) \
        & (past_z > 1e-3)
    if ok.sum() < 3:
        return None
    kk = np.asarray(k)

    def world_rays(pts, t_c2w):
        d = np.stack([(pts[:, 0] - kk[0, 2]) / kk[0, 0],
                      (pts[:, 1] - kk[1, 2]) / kk[1, 1],
                      np.ones(len(pts), np.float32)], axis=-1)
        nrm = np.linalg.norm(d, axis=-1, keepdims=True)
        return (d / nrm) @ t_c2w[:3, :3].T, nrm[:, 0]

    d1, n1 = world_rays(cur[ok, :2], t_cur)
    d2, _ = world_rays(past[ok, :2], t_past)
    o1, o2 = t_cur[:3, 3], t_past[:3, 3]
    baseline = o2 - o1
    bl = float(np.linalg.norm(baseline))
    if bl < 1e-6:
        return None
    bn = baseline / bl
    gamma = np.arccos(np.clip((d1 * d2).sum(-1), -1, 1))  # ray angle
    alpha = np.arccos(np.clip(d1 @ bn, -1, 1))
    beta = np.arccos(np.clip(-(d2 @ bn), -1, 1))
    # law of sines in the (o1, o2, P) triangle: range from camera 1
    tri_r1 = bl * np.sin(beta) / np.maximum(np.sin(alpha + beta), 1e-6)
    measured = cur_z[ok] * n1  # range along the ray
    resid = np.abs(tri_r1 - measured)
    return {
        "n_common": int(ok.sum()),
        "baseline_m": bl,
        "median_ray_angle_deg": float(np.degrees(np.median(gamma))),
        "median_measured_range_m": float(np.median(measured)),
        "median_triangulated_range_m": float(np.median(tri_r1)),
        "median_residual_m": float(np.median(resid)),
    }


def align_video(depth_video, tracking_file, xfov=None, yfov=None,
                max_depth=100.0, solver="two_group", mask_video=None,
                strict_mask=False, max_frames=-1, output=None,
                max_tracks=4096, color_video=None, diagnostics=False,
                diag_gap=15):
    """Host driver: stream depth frames, solve each consecutive pair,
    accumulate to frame 0's space, write ``*_transformations.json``.

    Mask filtering drops track points on masked (moving) pixels; with
    ``strict_mask`` a track touched by the mask once is dropped everywhere
    (reference :172-196).
    """
    frames = sidecar.load_tracking(tracking_file)
    dv = vio.VideoReader(depth_video, max_frames=max_frames)
    h, w = dv.height, dv.width
    k = jnp.asarray(np.asarray(
        geo.camera_matrix_from_fov(w, h, xfov_deg=xfov, yfov_deg=yfov),
        np.float32))

    mv = vio.VideoReader(mask_video) if mask_video else None
    if mv is not None:
        banned = set()
        masked = []
        for fi, fr in enumerate(frames):
            m = mv.read_batch(1)
            if m is None:
                masked.append(fr)
                continue
            gray = m[0].astype(np.float32).mean(-1)
            keep = []
            for p in fr:
                x, y = int(p[1]), int(p[2])
                if x >= w or y >= h or gray[min(y, h - 1), min(x, w - 1)] > 0:
                    banned.add(int(p[0]))
                    continue
                keep.append(p)
            masked.append(np.asarray(keep, np.float32).reshape(-1, 3))
        mv.close()
        if strict_mask:
            masked = [np.asarray([p for p in fr if int(p[0]) not in banned],
                                 np.float32).reshape(-1, 3)
                      for fr in masked]
        frames = masked

    dense, _ = sidecar.tracking_to_dense(frames, max_tracks=max_tracks)
    t_total = min(len(frames), dv.frame_count if max_frames < 0
                  else max_frames)

    dec = jax.jit(lambda rgb: codec.decode_depth_frame(
        rgb, max_depth, average_rg=True))
    solve = SOLVERS[solver]

    # debug overlay video: tracked points + solved-pose reprojection of
    # the previous frame's points (reference :486-533)
    cvr = dbg_writer = None
    if color_video:
        cvr = vio.VideoReader(color_video, max_frames=max_frames)
        dbg_writer = vio.VideoWriter(depth_video + "_debug.mkv", dv.fps,
                                     w, h)

    transforms = [np.eye(4, dtype=np.float32)]
    to_ref_zero = np.eye(4, dtype=np.float32)
    prev_depth = None
    fr_n = 0
    diag_hist = {}  # frame -> (dense row, sampled depths) for diag_gap
    diag_stats = []
    while fr_n < t_total:
        rgb = dv.read_batch(1)
        if rgb is None:
            break
        depth = dec(jnp.asarray(rgb[0]))
        if diagnostics:
            dh = to_host(depth)
            row = dense[fr_n]
            xi = np.clip(row[:, 0].astype(int), 0, w - 1)
            yi = np.clip(row[:, 1].astype(int), 0, h - 1)
            diag_hist[fr_n] = (row, dh[yi, xi].astype(np.float32))
            diag_hist.pop(fr_n - diag_gap - 1, None)
        if prev_depth is not None:
            cur = dense[fr_n]
            prev = dense[fr_n - 1]
            valid = jnp.asarray(cur[:, 2] * prev[:, 2])
            out = solve(jnp.asarray(cur[:, :2]), jnp.asarray(prev[:, :2]),
                        depth, prev_depth, k, valid)
            m = out[0] if isinstance(out, tuple) else out
            n_common = float(np.asarray(valid).sum())
            if n_common >= 8:
                to_ref_zero = to_ref_zero @ to_host(m)
            transforms.append(to_ref_zero.copy())
            if diagnostics and (fr_n - diag_gap) in diag_hist:
                past_row, past_z = diag_hist[fr_n - diag_gap]
                cur_row, cur_z = diag_hist[fr_n]
                st = _triangulation_diagnostics(
                    cur_row, cur_z, past_row, past_z,
                    transforms[fr_n], transforms[fr_n - diag_gap], k)
                if st is not None:
                    st["frame"] = fr_n
                    diag_stats.append(st)
                    print(f"frame {fr_n}: tri-residual "
                          f"{st['median_residual_m']:.3f} m over "
                          f"{st['n_common']} tracks, ray angle "
                          f"{st['median_ray_angle_deg']:.2f} deg")
        if dbg_writer is not None:
            cb = cvr.read_batch(1)
            frame = (cb[0].copy() if cb is not None
                     else np.zeros((h, w, 3), np.uint8))
            for gid, x, y in np.asarray(frames[fr_n]).reshape(-1, 3):
                xi, yi = int(x), int(y)
                if 0 <= xi < w and 0 <= yi < h:
                    frame[max(0, yi - 1):yi + 2,
                          max(0, xi - 1):xi + 2] = (0, 255, 0)
            if prev_depth is not None and fr_n > 0:
                prev = dense[fr_n - 1]
                ok = prev[:, 2] > 0
                p3 = np.asarray(geo.unproject_2d_points(
                    jnp.asarray(prev[ok, :2]),
                    jnp.asarray(to_host(prev_depth)[
                        np.clip(prev[ok, 1].astype(int), 0, h - 1),
                        np.clip(prev[ok, 0].astype(int), 0, w - 1)]), k))
                m_rel = transforms[-1] @ np.linalg.inv(transforms[-2]) \
                    if len(transforms) >= 2 else np.eye(4)
                p3w = p3 @ m_rel[:3, :3].T + m_rel[:3, 3]
                z = np.maximum(p3w[:, 2], 1e-6)
                kk = np.asarray(k)
                us = (p3w[:, 0] * kk[0, 0] / z + kk[0, 2]).astype(int)
                vs = (p3w[:, 1] * kk[1, 1] / z + kk[1, 2]).astype(int)
                sel = (us >= 0) & (us < w) & (vs >= 0) & (vs < h)
                frame[vs[sel], us[sel]] = (255, 0, 0)
            dbg_writer.write(frame)
        prev_depth = depth
        fr_n += 1
    dv.close()
    if dbg_writer is not None:
        dbg_writer.commit(fr_n)
        cvr.close()

    output = output or (depth_video + "_transformations.json")
    sidecar.save_transformations(output, np.asarray(transforms[:t_total]))
    if diagnostics:
        import json
        with open(output + "_diagnostics.json", "w") as f:
            json.dump(diag_stats, f)
        if diag_stats:
            med = float(np.median([s["median_residual_m"]
                                   for s in diag_stats]))
            print(f"triangulation diagnostics: {len(diag_stats)} frame "
                  f"pairs, overall median residual {med:.3f} m "
                  f"(saved {output}_diagnostics.json)")
    return output
