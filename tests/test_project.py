"""Headless project manager: create, overrides, scene split with
artifact renames, status."""

import os

import numpy as np

from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.pipeline import project as proj_mod


def _movie(tmp_path, rng):
    a = np.full((16, 32, 48, 3), 30, np.uint8)
    b = np.full((18, 32, 48, 3), 200, np.uint8)
    b[..., 2] = 20
    path = str(tmp_path / "movie.mkv")
    vio.save_rgb_video(np.concatenate([a, b]), path, 24)
    return path


def test_create_and_overrides(tmp_path, rng):
    movie = _movie(tmp_path, rng)
    root = str(tmp_path / "proj")
    proj = proj_mod.create_project(root, movie, depth_engine="vda",
                                   xfov=60.0)
    assert os.path.exists(os.path.join(root, "project_config.json"))
    scenes = proj.scenes()
    assert len(scenes) == 2

    proj_mod.set_scene_override(proj, 2, "Engine", "da3")
    proj_mod.set_scene_override(proj, 1, "Infill", "No")
    scenes = proj.scenes()
    assert scenes[1]["Engine"] == "da3"
    assert scenes[0]["Infill"] == "No"

    reopened = proj_mod.open_project(root)
    assert reopened.config["xfov"] == 60.0

    rows = proj_mod.status(proj)
    assert len(rows) == 2 and rows[1]["engine"] == "da3"
    assert not rows[0]["depth"]


def test_split_scene_renames_artifacts(tmp_path, rng):
    movie = _movie(tmp_path, rng)
    root = str(tmp_path / "proj")
    proj = proj_mod.create_project(root, movie)
    # fake an artifact for scene 2 that must be renamed to scene 3
    open(os.path.join(root, "scene_2.mkv"), "wb").write(b"x" * 10)
    open(os.path.join(root, "scene_2.mkv_depth.mkv"), "wb").write(b"y")

    out = proj_mod.split_scene(proj, 1, at_frame=8)
    assert len(out) == 3
    assert [s["Scene Number"] for s in out] == ["1", "2", "3"]
    assert out[0]["End Frame"] == "7"
    assert out[1]["Start Frame"] == "8"
    # scene 2's artifacts now belong to scene 3
    assert os.path.exists(os.path.join(root, "scene_3.mkv"))
    assert os.path.exists(os.path.join(root, "scene_3.mkv_depth.mkv"))
    assert not os.path.exists(os.path.join(root, "scene_2.mkv"))
