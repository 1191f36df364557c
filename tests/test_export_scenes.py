"""Exporter (PLY/OBJ/triangulation/rescale), scene detection/splitting,
and point-cloud I/O."""

import os

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import pointcloud as pcio
from metric_depth_video_toolbox_tpu.io import sidecar, video as vio
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.pipeline import export as export_mod
from metric_depth_video_toolbox_tpu.pipeline import scenes as scene_mod


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "a.ply")
    pcio.write_ply(p, pts, cols)
    back_pts, back_cols = pcio.read_ply(p)
    assert np.allclose(back_pts, pts, atol=1e-6)
    assert (back_cols == cols).all()


def test_obj_and_grid_faces(tmp_path):
    verts = np.zeros((6, 3), np.float32)
    faces = pcio.grid_mesh_faces(2, 3)
    assert faces.shape == (4, 3)  # 2*(2-1)*(3-1)
    keep = np.ones((2, 3), bool)
    keep[0, 0] = False
    faces2 = pcio.grid_mesh_faces(2, 3, keep=keep)
    assert len(faces2) < len(faces)
    p = str(tmp_path / "m.obj")
    pcio.write_obj(p, verts, faces)
    assert os.path.getsize(p) > 0


def test_merge_near_points(rng):
    pts = np.array([[0, 0, 0], [0.001, 0, 0], [1, 1, 1]], np.float32)
    merged, _ = export_mod.merge_near_points(pts, radius=0.01)
    assert merged.shape[0] == 2


def test_export_triangulation_recovers_static_points(tmp_path, rng):
    """A static scene viewed by a translating camera: triangulated track
    points must land at their true world position."""
    h, w = 48, 64
    t = 10
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0),
                   np.float32)
    world = np.stack([rng.uniform(-2, 2, 20), rng.uniform(-1.5, 1.5, 20),
                      rng.uniform(5, 12, 20)], -1).astype(np.float32)
    transforms = []
    tracks = []
    depth_frames = np.full((t, h, w), 30.0, np.float32)
    for fi in range(t):
        cam_x = fi * 0.08
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = cam_x
        transforms.append(c2w)
        w2c = np.linalg.inv(c2w)
        pc = world @ w2c[:3, :3].T + w2c[:3, 3]
        uv = pc[:, :2] / pc[:, 2:3] * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
        rows = []
        for gid, (p, q) in enumerate(zip(pc, uv)):
            x, y = int(round(q[0])), int(round(q[1]))
            if 0 <= x < w and 0 <= y < h:
                depth_frames[fi, y, x] = p[2]
                rows.append([gid, q[0], q[1]])
        tracks.append(np.asarray(rows, np.float32))

    dpath = str(tmp_path / "scene_depth.mkv")
    vio.save_depth_video(depth_frames, dpath, 24, 100.0)
    tpath = str(tmp_path / "scene_tracking.json")
    sidecar.save_tracking(tpath, tracks)
    trpath = str(tmp_path / "scene_transformations.json")
    sidecar.save_transformations(trpath, np.stack(transforms))

    out = export_mod.export_video(
        dpath, tracking_file=tpath, transformation_file=trpath,
        xfov=60.0, triangulate=True, min_observations=5,
        save_rescaled_depth=True)
    pts, _ = pcio.read_ply(out["triangulated"])
    assert pts.shape[0] >= 10
    # match each triangulated point to its nearest true point
    d = np.linalg.norm(pts[:, None] - world[None], axis=-1).min(axis=1)
    assert np.median(d) < 0.3
    assert os.path.exists(out["rescaled"])


def test_scene_detection_and_csv(tmp_path, rng):
    h, w = 32, 48
    a = np.full((10, h, w, 3), 30, np.uint8)
    b = np.full((12, h, w, 3), 220, np.uint8)
    b[..., 0] = 10  # strongly different scene
    frames = np.concatenate([a, b])
    path = str(tmp_path / "two_scenes.mkv")
    vio.save_rgb_video(frames, path, 24)
    scenes = scene_mod.detect_scenes(path, min_scene_len=5)
    assert len(scenes) == 2
    assert scenes[1]["Start Frame"] == "10"

    csvp = str(tmp_path / "s.csv")
    scene_mod.write_scene_csv(csvp, scenes)
    back = scene_mod.read_scene_csv(csvp)
    assert len(back) == 2
    assert back[0]["End Frame"] == "9"


def test_split_scenes_caps_length():
    scenes = [{
        "Scene Number": "1", "Start Frame": "0", "End Frame": "99",
        "Start Time (seconds)": "0.0", "End Time (seconds)": "4.0",
        "Start Timecode": "0", "End Timecode": "0",
        "Length (frames)": "100", "Length (seconds)": "4.0",
        "Length (timecode)": "0", "Engine": "vda",
    }]
    out = scene_mod.split_scenes(scenes, max_scene_frames=30)
    assert len(out) == 4
    assert [s["Length (frames)"] for s in out] == ["30", "30", "30", "10"]
    assert all(s["Engine"] == "vda" for s in out)  # extra cols preserved
    assert [s["Scene Number"] for s in out] == ["1", "2", "3", "4"]


def test_mask_filter_tracks_and_strict(tmp_path):
    """Masked observations are invalidated; strict mode kills the whole
    track (reference convert_...py:659-681)."""
    t, n, h, w = 3, 2, 16, 16
    dense = np.zeros((t, n, 3), np.float32)
    dense[:, :, 2] = 1.0          # all valid
    dense[:, 0, :2] = [4.0, 4.0]  # track 0 sits in the masked quadrant
    dense[:, 1, :2] = [12.0, 12.0]
    masks = np.zeros((t, h, w, 3), np.uint8)
    masks[1, :8, :8] = 255        # masked only in frame 1
    mpath = str(tmp_path / "m.mkv")
    vio.save_rgb_video(masks, mpath, 24)

    out = export_mod._mask_filter_tracks(dense, mpath, strict=False)
    assert out[1, 0, 2] == 0.0 and out[0, 0, 2] == 1.0
    assert (out[:, 1, 2] == 1.0).all()

    strict = export_mod._mask_filter_tracks(dense, mpath, strict=True)
    assert (strict[:, 0, 2] == 0.0).all()
    assert (strict[:, 1, 2] == 1.0).all()


def test_export_lock_frame_and_min_frames(tmp_path, rng):
    """--transformation_lock_frame re-bases poses; --min_frames skips
    early frames in every export product."""
    t, h, w = 4, 16, 24
    depth = rng.uniform(2, 8, (t, h, w)).astype(np.float32)
    dpath = str(tmp_path / "d.mkv")
    vio.save_depth_video(depth, dpath, 24, 20.0)
    transforms = []
    for i in range(t):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 0.1 * i
        transforms.append(m)
    tf = str(tmp_path / "t.json")
    sidecar.save_transformations(tf, transforms)

    out = export_mod.export_video(
        dpath, transformation_file=tf, xfov=60.0, max_depth=20.0,
        min_frames=1, lock_frame=2, grayscale=True,
        save_ply_every=1)
    # frames 0 and 1 skipped (reference: min_frames >= frame_n skips)
    assert len(out["ply_frames"]) == t - 2
    n_gray, _, _, _ = vio.video_info(out["grayscale"])
    assert n_gray == t - 2


def test_render_point_cloud_video(tmp_path, rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32) + [0, 0, 5]
    path = str(tmp_path / "turntable.mkv")
    export_mod.render_point_cloud_video([(pts, None)], path, n_frames=4,
                                        out_hw=(32, 48))
    n, w, h, _ = vio.video_info(path)
    assert n == 4 and (w, h) == (48, 32)


def test_export_save_normals_writes_unit_normals(tmp_path, rng):
    """--save_normals: exported clouds carry KNN-covariance normals
    (ops/knn.py, the UniDepth KNN-op role). A planar synthetic cloud
    must get near-axis normals."""
    h, w = 32, 48
    t = 6
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0),
                   np.float32)
    # points on the z=8 plane
    world = np.stack([rng.uniform(-2, 2, 30), rng.uniform(-1.5, 1.5, 30),
                      np.full(30, 8.0)], -1).astype(np.float32)
    transforms, tracks = [], []
    depth_frames = np.full((t, h, w), 30.0, np.float32)
    for fi in range(t):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = fi * 0.1
        transforms.append(c2w)
        w2c = np.linalg.inv(c2w)
        pc = world @ w2c[:3, :3].T + w2c[:3, 3]
        uv = pc[:, :2] / pc[:, 2:3] * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
        rows = [[gid, q[0], q[1]] for gid, (p, q) in enumerate(zip(pc, uv))
                if 0 <= int(round(q[0])) < w and 0 <= int(round(q[1])) < h]
        tracks.append(np.asarray(rows, np.float32))

    dpath = str(tmp_path / "pl_depth.mkv")
    vio.save_depth_video(depth_frames, dpath, 24, 100.0)
    tpath = str(tmp_path / "pl_tracking.json")
    sidecar.save_tracking(tpath, tracks)
    trpath = str(tmp_path / "pl_transformations.json")
    sidecar.save_transformations(trpath, np.stack(transforms))

    out = export_mod.export_video(
        dpath, tracking_file=tpath, transformation_file=trpath,
        xfov=60.0, triangulate=True, min_observations=3,
        save_normals=True)
    head = open(out["triangulated"], "rb").read(500)
    assert b"nx" in head and b"ny" in head and b"nz" in head
    pts, _, normals = pcio.read_ply(out["triangulated"],
                                    return_normals=True)
    assert normals is not None and normals.shape == pts.shape
    lens = np.linalg.norm(normals, axis=1)
    assert np.allclose(lens, 1.0, atol=1e-3)
    # plane at z=8 viewed from -z side: normals ~ (0, 0, -1)
    assert np.median(np.abs(normals[:, 2])) > 0.9
