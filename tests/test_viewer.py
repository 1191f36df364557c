"""Interactive 3D viewer: server + wire-format round-trip
(reference 3d_view_depthfile.py live-window mode, re-served as a
zero-dependency web app)."""

import json
import struct
import urllib.request

import numpy as np

from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.pipeline import viewer


def _make_videos(tmp_path, t=3, h=24, w=32):
    depth = np.full((t, h, w), 4.0, np.float32)
    depth[:, 8:16, 12:24] = 2.0
    color = np.full((t, h, w, 3), 90, np.uint8)
    color[:, 8:16, 12:24] = [200, 40, 40]
    dpath = str(tmp_path / "d.mkv")
    cpath = str(tmp_path / "c.mkv")
    vio.save_depth_video(depth, dpath, 24, 20.0)
    vio.save_rgb_video(color, cpath, 24)
    return dpath, cpath


def _fetch(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=30) as r:
        return r.read()


def test_viewer_serves_meta_page_and_frames(tmp_path):
    dpath, cpath = _make_videos(tmp_path)
    srv, src, port = viewer.serve_background(
        dpath, cpath, xfov=60.0, max_depth=20.0, remove_edges=False,
        max_points=1000)
    try:
        page = _fetch(port, "/").decode()
        assert "webgl" in page or "WebGL" in page or "getContext" in page
        meta = json.loads(_fetch(port, "/api/meta"))
        assert meta["frames"] == 3
        assert meta["grid"][0] * meta["grid"][1] <= 1000

        blob = _fetch(port, "/frame/1")
        magic, gh, gw = struct.unpack_from("<IHH", blob, 0)
        assert magic == viewer.MAGIC
        assert (gh, gw) == tuple(meta["grid"])
        lo = struct.unpack_from("<3f", blob, 8)
        span = struct.unpack_from("<3f", blob, 20)
        off = 32
        q = np.frombuffer(blob, "<u2", gh * gw * 3, off).reshape(gh, gw, 3)
        off += gh * gw * 6
        cols = np.frombuffer(blob, np.uint8, gh * gw * 3,
                             off).reshape(gh, gw, 3)
        off += gh * gw * 3
        frus = np.frombuffer(blob, "<f4", 24, off).reshape(8, 3)
        # dequantize: all valid points must sit near 2 m or 4 m depth
        valid = q[..., 2] != 65535
        assert valid.mean() > 0.9
        z = lo[2] + span[2] * q[..., 2][valid] / 65534.0
        near = np.isclose(z, 2.0, atol=0.2)
        far = np.isclose(z, 4.0, atol=0.2)
        assert (near | far).mean() > 0.95
        assert near.any() and far.any()
        # the foreground box keeps its color through the pipeline
        assert (cols[q[..., 2] != 65535][:, 0] > 150).any()
        # frustum corners: 4 near + 4 far, far at the 95th pct depth
        assert frus.shape == (8, 3)
        assert frus[4:, 2].max() > frus[:4, 2].max()

        # out-of-range frame -> 404
        try:
            _fetch(port, "/frame/99")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        src.close()


def test_viewer_mask_filtering(tmp_path):
    dpath, cpath = _make_videos(tmp_path)
    mask = np.zeros((3, 24, 32, 3), np.uint8)
    mask[:, 8:16, 12:24] = 255  # foreground box masked out
    mpath = str(tmp_path / "m.mkv")
    vio.save_rgb_video(mask, mpath, 24)
    srv, src, port = viewer.serve_background(
        dpath, cpath, mask_video=mpath, xfov=60.0, max_depth=20.0,
        remove_edges=False, max_points=4000)
    try:
        blob = _fetch(port, "/frame/0")
        _, gh, gw = struct.unpack_from("<IHH", blob, 0)
        q = np.frombuffer(blob, "<u2", gh * gw * 3, 32).reshape(gh, gw, 3)
        lo = struct.unpack_from("<3f", blob, 8)
        span = struct.unpack_from("<3f", blob, 20)
        valid = q[..., 2] != 65535
        z = lo[2] + span[2] * q[..., 2][valid] / 65534.0
        # masked foreground (2 m) points are gone
        assert not np.isclose(z, 2.0, atol=0.2).any()
    finally:
        srv.shutdown()
        src.close()


def test_viewer_background_ply(tmp_path):
    from metric_depth_video_toolbox_tpu.io import pointcloud as pcio
    dpath, cpath = _make_videos(tmp_path)
    pts = np.random.default_rng(0).uniform(-1, 1, (500, 3)).astype(
        np.float32)
    ply = str(tmp_path / "bg.ply")
    pcio.write_ply(ply, pts, np.full((500, 3), 128, np.uint8))
    srv, src, port = viewer.serve_background(
        dpath, cpath, background_ply=ply, xfov=60.0, max_depth=20.0,
        max_points=1000)
    try:
        meta = json.loads(_fetch(port, "/api/meta"))
        assert meta["background"]
        blob = _fetch(port, "/background")
        n = struct.unpack_from("<I", blob, 0)[0]
        assert n == 500
        assert len(blob) == 4 + 24 + n * 6 + n * 3
    finally:
        srv.shutdown()
        src.close()
