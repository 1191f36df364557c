"""Tracking (pyramidal LK) and the track-based camera aligner on
synthetic scenes with known motion."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import sidecar, video as vio
from metric_depth_video_toolbox_tpu.models import tracker as trk
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.pipeline import align as align_mod
from metric_depth_video_toolbox_tpu.pipeline import tracking as track_mod


def _textured_frame(rng, h, w):
    base = rng.integers(0, 255, (h // 4, w // 4, 3), np.uint8)
    return np.kron(base, np.ones((4, 4, 1), np.uint8))[:h, :w]


def test_corner_response_finds_corners():
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = 255
    resp = np.asarray(trk.corner_response(jnp.asarray(img)))
    # corners of the square respond much more than its edges' midpoints
    assert resp[8, 8] > 5 * abs(resp[16, 8]) - 1e-3
    assert resp[8, 8] > resp[16, 16] + 1e-3


def test_lk_tracks_translation(rng):
    h, w = 64, 96
    tex = _textured_frame(rng, h + 8, w + 8)
    shift = 3
    f0 = tex[:h, :w]
    f1 = tex[:h, shift:w + shift]  # scene moves left by `shift` px
    pts = np.array([[40.0, 30.0], [60.0, 20.0], [24.0, 48.0]], np.float32)
    new_pts, res = trk.lk_advance(jnp.asarray(f0), jnp.asarray(f1),
                                  jnp.asarray(pts))
    new_pts = np.asarray(new_pts)
    assert np.allclose(new_pts[:, 0], pts[:, 0] - shift, atol=0.35)
    assert np.allclose(new_pts[:, 1], pts[:, 1], atol=0.35)
    assert (np.asarray(res) < 5).all()


def test_lk_track_clip_and_pipeline(tmp_path, rng):
    h, w = 64, 96
    tex = _textured_frame(rng, h, w + 24)
    frames = np.stack([tex[:, i * 2:i * 2 + w] for i in range(8)])
    path = str(tmp_path / "clip.mkv")
    vio.save_rgb_video(frames, path, 24)

    out = track_mod.track_video(path, grid=12, clip_len=5)
    tracks = sidecar.load_tracking(out)
    assert len(tracks) == 8
    dense, ids = sidecar.tracking_to_dense(tracks)
    # surviving tracks must move ~ -2 px/frame in x
    v = dense[:, :, 2]
    full = v.all(axis=0)
    assert full.sum() >= 5
    dx = np.diff(dense[:, full, 0], axis=0)
    assert abs(np.median(dx) + 2.0) < 0.5


def _make_pair_scene(rng, h=48, w=64):
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0),
                   np.float32)
    n = 64
    pts3 = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                     rng.uniform(4, 20, n)], axis=-1).astype(np.float32)
    return k, pts3


def _fill_depth(pts, uv, h, w, bg=50.0):
    """Depth map holding each point's z at its rounded pixel; points whose
    pixel collides with another are invalidated (returned mask)."""
    depth = np.full((h, w), bg, np.float32)
    xi = np.round(uv[:, 0]).astype(int)
    yi = np.round(uv[:, 1]).astype(int)
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    flat = yi * w + xi
    _, first_idx, counts = np.unique(flat, return_index=True,
                                     return_counts=True)
    unique_ok = np.zeros(len(pts), bool)
    unique_ok[first_idx[counts == 1]] = True
    ok = inb & unique_ok
    depth[yi[ok], xi[ok]] = pts[ok, 2]
    return depth, ok


def _project(pts3, k):
    uv = pts3[:, :2] / pts3[:, 2:3] * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
    return uv.astype(np.float32)


def test_two_group_solver_recovers_rotation(rng):
    h, w = 48, 64
    k, pts3 = _make_pair_scene(rng, h, w)
    # camera rotates: points in current frame = R^-1 * ref points
    ang = 0.02
    r = np.asarray(geo.rotation_y(ang))[:3, :3]
    ref_pts = pts3
    cur_pts = ref_pts @ r  # inverse rotation applied to points
    uv_cur = _project(cur_pts, k)
    uv_ref = _project(ref_pts, k)
    depth_cur, ok_c = _fill_depth(cur_pts, uv_cur, h, w)
    depth_ref, ok_r = _fill_depth(ref_pts, uv_ref, h, w)
    valid = (ok_c & ok_r).astype(np.float32)

    m = np.asarray(align_mod.solve_pair_stationary(
        jnp.asarray(uv_cur), jnp.asarray(uv_ref),
        jnp.asarray(depth_cur), jnp.asarray(depth_ref),
        jnp.asarray(k), jnp.asarray(valid)))
    got = np.asarray(geo.rotation_y(ang))[:3, :3]
    assert np.allclose(m[:3, :3], got, atol=5e-3)


def test_hybrid_solver_recovers_translation_and_scale(rng):
    h, w = 48, 64
    k, ref_pts = _make_pair_scene(rng, h, w)
    t_gt = np.array([0.15, -0.05, 0.2], np.float32)
    cur_pts = ref_pts - t_gt  # camera moved by +t
    uv_cur = _project(cur_pts, k)
    uv_ref = _project(ref_pts, k)
    scale_err = 1.25  # current depth map is mis-scaled
    scaled = cur_pts.copy()
    scaled[:, 2] /= scale_err
    depth_cur, ok_c = _fill_depth(scaled, uv_cur, h, w)
    depth_ref, ok_r = _fill_depth(ref_pts, uv_ref, h, w)
    valid = (ok_c & ok_r).astype(np.float32)
    m, scale = align_mod.solve_pair_hybrid(
        jnp.asarray(uv_cur), jnp.asarray(uv_ref), jnp.asarray(depth_cur),
        jnp.asarray(depth_ref), jnp.asarray(k), jnp.asarray(valid))
    m = np.asarray(m)
    # recovered depth scale ~ 1.25, translation ~ t_gt (after scaling)
    assert abs(float(scale) - scale_err) < 0.07
    assert np.allclose(m[:3, 3], t_gt, atol=0.08)
    assert np.allclose(m[:3, :3], np.eye(3), atol=2e-2)


def test_hybrid_solver_rejects_outliers(rng):
    """RANSAC behavior (madpose-class, reference align_3d_points.py:
    123-147): 30% of the current depth samples corrupted by large
    errors must not drag the pose; a plain global Umeyama would."""
    h, w = 48, 64
    k, ref_pts = _make_pair_scene(rng, h, w)
    t_gt = np.array([0.1, 0.04, -0.12], np.float32)
    cur_pts = ref_pts - t_gt
    uv_cur = _project(cur_pts, k)
    uv_ref = _project(ref_pts, k)
    corrupted = cur_pts.copy()
    n = corrupted.shape[0]
    bad = rng.random(n) < 0.3
    corrupted[bad, 2] *= rng.uniform(2.0, 5.0, bad.sum())  # gross errors
    depth_cur, ok_c = _fill_depth(corrupted, uv_cur, h, w)
    depth_ref, ok_r = _fill_depth(ref_pts, uv_ref, h, w)
    valid = (ok_c & ok_r).astype(np.float32)
    m, scale = align_mod.solve_pair_hybrid(
        jnp.asarray(uv_cur), jnp.asarray(uv_ref), jnp.asarray(depth_cur),
        jnp.asarray(depth_ref), jnp.asarray(k), jnp.asarray(valid))
    m = np.asarray(m)
    assert np.allclose(m[:3, 3], t_gt, atol=0.05)
    assert abs(float(scale) - 1.0) < 0.08


def test_triangulation_diagnostics_consistent_geometry(rng):
    """Perfect synthetic two-view geometry -> near-zero triangulation
    residual; the measured and triangulated ranges agree."""
    h, w = 48, 64
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0),
                   np.float32)
    pts3 = np.stack([rng.uniform(-1, 1, 40), rng.uniform(-0.8, 0.8, 40),
                     rng.uniform(4, 9, 40)], -1).astype(np.float32)
    t_cur = np.eye(4, dtype=np.float32)
    t_past = np.eye(4, dtype=np.float32)
    t_past[:3, 3] = [0.5, 0.0, 0.0]  # baseline 0.5 m
    # observations: project points into each camera (w2c = inv(c2w))
    def obs(t_c2w):
        w2c = np.linalg.inv(t_c2w)
        pc = pts3 @ w2c[:3, :3].T + w2c[:3, 3]
        uv = pc[:, :2] / pc[:, 2:3] * [k[0, 0], k[1, 1]] \
            + [k[0, 2], k[1, 2]]
        row = np.concatenate([uv, np.ones((40, 1))], -1).astype(np.float32)
        return row, pc[:, 2].astype(np.float32)
    cur_row, cur_z = obs(t_cur)
    past_row, past_z = obs(t_past)
    st = align_mod._triangulation_diagnostics(
        cur_row, cur_z, past_row, past_z, t_cur, t_past, k)
    assert st is not None and st["n_common"] == 40
    assert st["baseline_m"] == 0.5
    assert st["median_residual_m"] < 0.02
    assert abs(st["median_triangulated_range_m"]
               - st["median_measured_range_m"]) < 0.05


def test_track_video_cotracker3_engine(tmp_path, rng, monkeypatch):
    """The learned-tracker dispatch (reference
    track_points_in_video.py:264-271): track_video(engine='cotracker3')
    runs the CoTracker3-class engine end to end and emits the same
    tracking-json contract as the LK core. Random weights (tiny config)
    — this asserts plumbing and output shape, not tracking quality."""
    from metric_depth_video_toolbox_tpu.models import cotracker as ct
    monkeypatch.setattr(ct, "COTRACKER3", ct.COTRACKER3_TINY)
    h, w = 64, 96
    tex = _textured_frame(rng, h, w + 24)
    frames = np.stack([tex[:, i * 2:i * 2 + w] for i in range(6)])
    path = str(tmp_path / "clip_ct3.mkv")
    vio.save_rgb_video(frames, path, 24)

    out = track_mod.track_video(path, grid=6, clip_len=6,
                                engine="cotracker3")
    tracks = sidecar.load_tracking(out)
    assert len(tracks) == 6
    for rows in tracks:
        rows = np.asarray(rows).reshape(-1, 3)
        if rows.size:
            assert np.isfinite(rows).all()
            assert (rows[:, 1] >= -w) .all() and (rows[:, 1] <= 2 * w).all()
