"""Stereo background-accumulation mode: mask-driven clean-plate cloud,
save/load, and rendering."""

import os

import numpy as np

from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.pipeline import stereo


def _scene(tmp_path, t=6, h=48, w=64):
    depth = np.full((t, h, w), 8.0, np.float32)
    color = np.full((t, h, w, 3), 90, np.uint8)
    color[:, :, :w // 2] = [30, 120, 200]
    mask = np.zeros((t, h, w, 3), np.uint8)
    mask[:, 10:30, 20:40] = 255  # moving foreground subject
    dpath = str(tmp_path / "bg_depth.mkv")
    cpath = str(tmp_path / "bg.mkv")
    mpath = str(tmp_path / "bg_mask.mkv")
    vio.save_depth_video(depth, dpath, 24, 100.0)
    vio.save_rgb_video(color, cpath, 24)
    vio.save_rgb_video(mask, mpath, 24)
    return dpath, cpath, mpath


def test_save_background_accumulates_cloud(tmp_path):
    dpath, cpath, mpath = _scene(tmp_path)
    out = stereo.render_stereo_video(
        dpath, color_video=cpath, mask_video=mpath, xfov=60.0,
        save_background=True)
    assert out.endswith("_background.npy")
    pts, cols = np.load(out, allow_pickle=True)
    assert pts.shape[0] > 100
    assert pts.shape[1] == 3 and cols.shape[1] == 3
    # all accumulated points are background depth (~8 m)
    assert np.abs(np.asarray(pts)[:, 2].mean() - 8.0) < 0.5


def test_background_render_from_loaded_cloud(tmp_path):
    dpath, cpath, mpath = _scene(tmp_path)
    bg = stereo.render_stereo_video(
        dpath, color_video=cpath, mask_video=mpath, xfov=60.0,
        save_background=True)
    out = stereo.render_stereo_video(
        dpath, color_video=cpath, xfov=60.0, load_background=bg,
        infill_mask=True, max_frames=2)
    frames, _ = vio.read_video_frames(out)
    assert frames.shape[2] == 2 * 64  # SBS
    # the rendered background must show the left-half color split
    left_eye = frames[0, :, :64]
    assert left_eye.mean() > 5  # something rendered
    assert os.path.exists(out + "_infillmask.mkv")
