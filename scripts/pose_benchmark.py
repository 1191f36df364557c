"""Pose-accuracy benchmark: pipeline/slam.py (LK + global BA, the
DROID-SLAM role, reference sam_track_video.py:169-206) vs
pipeline/align.py (pairwise track-based aligner, reference
align_3d_points.py) on synthetic rigid-motion ground truth.

The reference feeds a TRAINED DROID net; our SLAM front-end is
classical. This script quantifies that gap on controlled conditions —
texture strength and motion speed — so the trade is documented rather
than asserted (VERDICT r2 "what's missing" #3). Results are written to
docs/POSE_ACCURACY.md by hand from this output.

Run (CPU is fine; ~2-4 min):
    MDVT_PLATFORM=cpu JAX_PLATFORMS='' python scripts/pose_benchmark.py

Metrics:
  ATE-RMSE  (m): RMSE of camera-center error after SE3 (no-scale
                 Umeyama) alignment of the estimated c2w trajectory to
                 ground truth.
  RPE-rot (deg): mean relative-pose rotation error over 1-frame deltas.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metric_depth_video_toolbox_tpu.io import sidecar  # noqa: E402
from metric_depth_video_toolbox_tpu.io import video as vio  # noqa: E402
from metric_depth_video_toolbox_tpu.ops import geometry as geo  # noqa: E402
from metric_depth_video_toolbox_tpu.ops import solvers  # noqa: E402

W, H = 192, 144
N_FRAMES = 24


def _scene_depth_texture(rng, texture_strength=1.0):
    """Frame-0 depth (smooth ramp + slabs) and a texture image whose
    contrast scales with ``texture_strength`` (0.15 = near-textureless,
    the regime where a learned front-end beats classical LK)."""
    yy = np.linspace(0.0, 1.0, H, dtype=np.float32)[:, None]
    depth = np.tile(4.0 + 8.0 * yy, (1, W))
    depth[H // 4: 2 * H // 3, W // 6: W // 3] = 2.5
    depth[H // 3: 5 * H // 6, W // 2: 3 * W // 4] = 3.5
    base = rng.integers(40, 215, (H // 4, W // 4, 3)).astype(np.float32)
    tex = np.kron(base, np.ones((4, 4, 1), np.float32))
    tex = 127.5 + (tex - 127.5) * texture_strength
    # mild smooth gradient so even "textureless" frames aren't constant
    tex += 20.0 * yy[..., None]
    return depth, np.clip(tex, 0, 255).astype(np.uint8)


def _trajectory(speed=1.0):
    """c2w poses: x-slide + yaw + small z bob, scaled by ``speed``."""
    poses = []
    import jax.numpy as jnp
    for i in range(N_FRAMES):
        yaw = 0.004 * speed * i
        r = np.asarray(solvers._so3_exp(jnp.asarray([0.0, yaw, 0.0])))
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = r
        c2w[0, 3] = 0.03 * speed * i
        c2w[2, 3] = 0.01 * speed * np.sin(0.4 * i)
        poses.append(c2w)
    return np.stack(poses)


def _render_sequence(depth0, tex0, poses, k):
    """Render the static frame-0 geometry from every pose with the
    forward z-buffer warp; fill holes with mid-gray (the classical
    front-end must survive mild disocclusion, like real footage)."""
    import jax
    import jax.numpy as jnp

    from metric_depth_video_toolbox_tpu.ops import rasterize

    @jax.jit
    def render(transform):
        res = rasterize.forward_warp(
            jnp.asarray(depth0), jnp.asarray(tex0, jnp.float32) / 255.0,
            jnp.asarray(k), jnp.asarray(k), transform, (H, W),
            remove_edges=False)
        img = jnp.where(res.mask[..., None], res.color, 0.5)
        dep = jnp.where(res.mask, res.depth, 0.0)
        return (jnp.clip(img * 255, 0, 255).astype(jnp.uint8), dep)

    frames, depths = [], []
    for c2w in poses:
        w2c = np.linalg.inv(c2w).astype(np.float32)
        img, dep = render(jnp.asarray(w2c))
        frames.append(np.asarray(img))
        d = np.array(dep)
        d[d <= 0] = np.median(d[d > 0])  # fill depth holes plausibly
        depths.append(d)
    return np.stack(frames), np.stack(depths)


def ate_rmse(est_c2w, gt_c2w):
    """SE3-aligned (scale fixed to 1) absolute trajectory error, plus
    mean 1-frame relative rotation error in degrees."""
    import jax.numpy as jnp
    t = min(len(est_c2w), len(gt_c2w))
    est, gt = np.asarray(est_c2w)[:t], np.asarray(gt_c2w)[:t]
    pe, pg = est[:, :3, 3], gt[:, :3, 3]
    _, r, tr = [np.asarray(v) for v in solvers.umeyama_sim3(
        jnp.asarray(pe), jnp.asarray(pg))]
    pe_al = pe @ r.T + tr
    ate = float(np.sqrt(np.mean(np.sum((pe_al - pg) ** 2, -1))))
    rots = []
    for i in range(1, t):
        d_est = est[i - 1, :3, :3].T @ est[i, :3, :3]
        d_gt = gt[i - 1, :3, :3].T @ gt[i, :3, :3]
        dd = d_est.T @ d_gt
        c = np.clip((np.trace(dd) - 1) / 2, -1, 1)
        rots.append(np.degrees(np.arccos(c)))
    return ate, float(np.mean(rots))


def run_condition(name, texture_strength, speed, seed=0):
    from metric_depth_video_toolbox_tpu.pipeline import align as align_mod
    from metric_depth_video_toolbox_tpu.pipeline import slam
    from metric_depth_video_toolbox_tpu.pipeline import tracking as track_mod

    rng = np.random.default_rng(seed)
    depth0, tex0 = _scene_depth_texture(rng, texture_strength)
    poses = _trajectory(speed)
    k = np.asarray(geo.camera_matrix_from_fov(W, H, xfov_deg=60.0),
                   np.float32)
    frames, depths = _render_sequence(depth0, tex0, poses, k)

    with tempfile.TemporaryDirectory() as td:
        cpath = os.path.join(td, "c.mkv")
        dpath = os.path.join(td, "d.mkv")
        vio.save_rgb_video(frames, cpath, 24)
        vio.save_depth_video(depths, dpath, 24, max_depth=100.0)

        # A) track + pairwise align
        track_path = track_mod.track_video(cpath, grid=16, clip_len=12)
        align_path = align_mod.align_video(dpath, track_path, xfov=60.0,
                                           max_depth=100.0)
        ate_a, rpe_a = ate_rmse(
            sidecar.load_transformations(align_path), poses)

        # B) full SLAM (LK + pairwise init + global BA)
        slam_path, res_px = slam.slam_track_video(
            cpath, dpath, xfov=60.0, max_depth=100.0, grid=16)
        ate_b, rpe_b = ate_rmse(
            sidecar.load_transformations(slam_path), poses)

    print(f"{name:28s} | align ATE {ate_a * 100:6.2f} cm "
          f"RPE {rpe_a:5.3f} deg | slam ATE {ate_b * 100:6.2f} cm "
          f"RPE {rpe_b:5.3f} deg (BA res {res_px:.2f} px)", flush=True)
    return {"condition": name, "align_ate_m": ate_a, "align_rpe_deg": rpe_a,
            "slam_ate_m": ate_b, "slam_rpe_deg": rpe_b}


def main():
    conditions = [
        ("textured / slow motion", 1.0, 1.0),
        ("textured / fast motion", 1.0, 4.0),
        ("weak texture / slow", 0.15, 1.0),
        ("weak texture / fast", 0.15, 4.0),
    ]
    results = [run_condition(n, ts, sp) for n, ts, sp in conditions]
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
