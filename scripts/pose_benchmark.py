"""Pose-accuracy benchmark: slam.py (classical LK + global BA, the
DROID-SLAM role — reference sam_track_video.py:169-206) vs align.py
(track-based incremental alignment, reference align_3d_points.py) on a
synthetic rigid-motion scene with exact ground truth.

The reference's sam_track feeds a TRAINED DROID net; our slam front-end
is classical, so the accuracy gap must be measured, not assumed
(VERDICT r2 #9). This script renders an analytically-exact textured
tilted-plane scene (per-pixel depth + color from a known camera
trajectory), runs both pose pipelines end to end (slam does its own
LK tracking from the video; align consumes the tracking stage's track
file), and reports ATE/RPE against ground truth. Results are written
to docs/POSE_ACCURACY.md.

Run: MDVT_PLATFORM=cpu JAX_PLATFORMS='' python scripts/pose_benchmark.py
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from metric_depth_video_toolbox_tpu.io import video as vio  # noqa: E402
from metric_depth_video_toolbox_tpu.ops import geometry as geo  # noqa


W, H, T = 128, 96, 16
XFOV = 60.0
Z0, KX = 6.0, 0.35  # plane: Z = Z0 + KX * X (tilted about y)


def _texture(rng, n=1024):
    """Smooth but feature-rich world texture (random + blur octaves)."""
    import cv2
    t = rng.uniform(0, 255, (n, n)).astype(np.float32)
    t = cv2.GaussianBlur(t, (0, 0), 1.2)
    t2 = cv2.resize(cv2.GaussianBlur(
        rng.uniform(0, 255, (n // 8, n // 8)).astype(np.float32),
        (0, 0), 1.0), (n, n))
    tex = 0.5 * t + 0.5 * t2
    tex = (tex - tex.min()) / (np.ptp(tex) + 1e-6) * 255
    return np.stack([tex, np.roll(tex, 37, 0), np.roll(tex, 91, 1)],
                    -1).astype(np.float32)


def _trajectory(fi):
    """Ground-truth c2w: x-slide + yaw + slight forward motion."""
    yaw = 0.006 * fi
    cy, sy = np.cos(yaw), np.sin(yaw)
    r = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = r
    c2w[:3, 3] = [0.08 * fi, 0.01 * fi, 0.02 * fi]
    return c2w


def render_scene(rng):
    k = np.asarray(geo.camera_matrix_from_fov(W, H, xfov_deg=XFOV),
                   np.float32)
    kinv = np.linalg.inv(k)
    tex = _texture(rng)
    n_pl = np.array([-KX, 0.0, 1.0], np.float32)  # n . X = Z0
    frames = np.zeros((T, H, W, 3), np.uint8)
    depths = np.zeros((T, H, W), np.float32)
    gt = np.zeros((T, 4, 4), np.float32)
    uu, vv = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    pix = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    for fi in range(T):
        c2w = _trajectory(fi)
        gt[fi] = c2w
        dirs = (kinv @ pix.T).T @ c2w[:3, :3].T
        o = c2w[:3, 3]
        s = (Z0 - n_pl @ o) / (dirs @ n_pl)
        x_world = o[None] + s[:, None] * dirs
        # camera-frame depth
        w2c = np.linalg.inv(c2w)
        z = (x_world @ w2c[:3, :3].T + w2c[:3, 3])[:, 2]
        depths[fi] = z.reshape(H, W)
        # texture lookup in world x/y (bilinear)
        scale = 90.0
        tu = (x_world[:, 0] * scale) % tex.shape[1]
        tv = (x_world[:, 1] * scale) % tex.shape[0]
        i0, j0 = np.floor(tv).astype(int), np.floor(tu).astype(int)
        fi_, fj = tv - i0, tu - j0
        i1 = (i0 + 1) % tex.shape[0]
        j1 = (j0 + 1) % tex.shape[1]
        c = (tex[i0, j0] * ((1 - fi_) * (1 - fj))[:, None]
             + tex[i0, j1] * ((1 - fi_) * fj)[:, None]
             + tex[i1, j0] * (fi_ * (1 - fj))[:, None]
             + tex[i1, j1] * (fi_ * fj)[:, None])
        frames[fi] = np.clip(c.reshape(H, W, 3), 0, 255).astype(np.uint8)
    return frames, depths, gt


def _centers(c2w):
    return np.asarray(c2w)[:, :3, 3]


def ate_rmse(est_c2w, gt_c2w, sim3=True):
    """RMSE of camera centers after (optionally sim3) alignment."""
    import jax.numpy as jnp

    from metric_depth_video_toolbox_tpu.ops import solvers
    est, gtc = _centers(est_c2w), _centers(gt_c2w)
    if sim3:
        s, r, t = [np.asarray(v) for v in solvers.umeyama_sim3(
            jnp.asarray(est), jnp.asarray(gtc))]
        est = est @ (s * r).T + t
    return float(np.sqrt(np.mean(np.sum((est - gtc) ** 2, -1))))


def rpe_deg(est_c2w, gt_c2w):
    """Mean relative rotation error per frame step (degrees)."""
    errs = []
    for i in range(len(gt_c2w) - 1):
        de = np.linalg.inv(est_c2w[i]) @ est_c2w[i + 1]
        dg = np.linalg.inv(gt_c2w[i]) @ gt_c2w[i + 1]
        dr = de[:3, :3].T @ dg[:3, :3]
        c = np.clip((np.trace(dr) - 1) / 2, -1, 1)
        errs.append(np.degrees(np.arccos(c)))
    return float(np.mean(errs))


def main():
    rng = np.random.default_rng(0)
    frames, depths, gt = render_scene(rng)
    td = tempfile.mkdtemp(prefix="posebench_")
    color = os.path.join(td, "c.mkv")
    dvid = os.path.join(td, "d.mkv")
    vio.save_rgb_video(frames, color, 24)
    vio.save_depth_video(depths, dvid, 24, 100.0)

    results = {}

    # --- slam (classical LK + global BA; DROID role) ---
    from metric_depth_video_toolbox_tpu.pipeline import slam
    out = slam.slam_track_video(color, dvid, xfov=XFOV)
    tf = out[0] if isinstance(out, tuple) else out
    est = np.asarray(json.load(open(tf)), np.float32)
    results["slam (LK+GN global BA)"] = (
        ate_rmse(est, gt), ate_rmse(est, gt, sim3=False), rpe_deg(est, gt))

    # --- tracking stage + align (reference align_3d_points role) ---
    from metric_depth_video_toolbox_tpu.pipeline import tracking, align
    trk = tracking.track_video(color, grid=14, clip_len=8)
    align_out = align.align_video(dvid, trk, xfov=XFOV)
    tf2 = (align_out if isinstance(align_out, str)
           else dvid + "_transformations.json")
    est2 = np.asarray(json.load(open(tf2)), np.float32)
    results["track+align (incremental)"] = (
        ate_rmse(est2, gt), ate_rmse(est2, gt, sim3=False),
        rpe_deg(est2, gt))

    traj_len = float(np.linalg.norm(np.diff(_centers(gt), axis=0),
                                    axis=1).sum())
    lines = [
        "# Pose accuracy: slam vs track+align (synthetic ground truth)",
        "",
        "Generated by `scripts/pose_benchmark.py` — an analytically",
        f"exact textured tilted-plane scene ({T} frames {W}x{H}, xfov "
        f"{XFOV}, trajectory length {traj_len:.3f} m with yaw+slide).",
        "The reference's sam_track runs a TRAINED DROID-SLAM net",
        "(sam_track_video.py:169-206); our slam.py is a classical",
        "LK + Gauss-Newton global bundle adjustment, so this measures",
        "the accuracy gap on an easy, well-textured scene (both should",
        "be near-exact here; textureless/fast-motion scenes are where",
        "a learned front-end wins, and that regime is NOT covered by",
        "this synthetic).",
        "",
        "| pipeline | ATE-sim3 (m) | ATE-raw (m) | RPE rot (deg/frame) |",
        "|---|---|---|---|",
    ]
    for name, (a, araw, r) in results.items():
        lines.append(f"| {name} | {a:.4f} | {araw:.4f} | {r:.4f} |")
    lines += [
        "",
        f"(trajectory length {traj_len:.3f} m; ATE-raw uses the metric",
        "depth scale directly, no alignment — both pipelines consume",
        "the same metric ground-truth depth video.)",
    ]
    doc = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "POSE_ACCURACY.md")
    with open(doc, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwritten: {doc}")


if __name__ == "__main__":
    main()
