"""Web project GUI: page serve, status API, overrides, split, run
(the reference MDVT_gui.py affordances over http.server)."""

import json
import time
import urllib.request

import numpy as np

from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.pipeline import gui, project


def _req(port, path, data=None):
    url = f"http://127.0.0.1:{port}{path}"
    body = json.dumps(data).encode() if data is not None else None
    try:
        with urllib.request.urlopen(url, data=body, timeout=10) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:  # json error bodies (4xx)
        return json.loads(e.read())


def _make_project(tmp_path, rng):
    a = np.full((8, 24, 32, 3), 30, np.uint8)
    b = np.full((8, 24, 32, 3), 220, np.uint8)
    b[..., 0] = 10
    clip = str(tmp_path / "movie.mkv")
    vio.save_rgb_video(np.concatenate([a, b]), clip, 24)
    root = str(tmp_path / "proj")
    project.create_project(root, clip, depth_engine="vda")
    return root


def test_gui_status_and_overrides(tmp_path, rng):
    root = _make_project(tmp_path, rng)
    srv, state, port = gui.serve_background(root)
    try:
        # page serves
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/",
                                    timeout=10) as r:
            page = r.read().decode()
        assert "MDVT project" in page

        st = _req(port, "/api/status")
        assert st["root"] == root
        assert len(st["scenes"]) >= 1
        assert st["running"] is False

        # per-scene override via the API
        _req(port, "/api/set", {"scene": 1, "column": "Engine",
                                "value": "da3"})
        st = _req(port, "/api/status")
        assert st["scenes"][0]["engine"] == "da3"

        # logs endpoint contract
        logs = _req(port, "/api/logs?start=0")
        assert "lines" in logs and "total" in logs

        # bad requests surface as json errors, not 500 crashes
        err = _req(port, "/api/set", {"scene": 999, "column": "Engine",
                                      "value": "x"})
        assert "error" in err
    finally:
        srv.shutdown()


def test_gui_split_scene(tmp_path, rng):
    root = _make_project(tmp_path, rng)
    srv, state, port = gui.serve_background(root)
    try:
        st = _req(port, "/api/status")
        n0 = len(st["scenes"])
        first = st["scenes"][0]
        if int(first["frames"]) >= 4:
            _req(port, "/api/split", {"scene": 1, "at_frame": 2})
            st = _req(port, "/api/status")
            assert len(st["scenes"]) == n0 + 1
    finally:
        srv.shutdown()


def test_gui_log_buffer():
    buf = gui._LogBuffer(max_lines=4)
    buf.write("a\nb\nc\n")
    lines, total = buf.tail(0)
    assert lines == ["a", "b", "c"] and total == 3
    buf.write("d\ne\nf\n")
    lines, total = buf.tail(0)
    assert len(lines) == 4  # ring cap
    assert lines[-1] == "f"
    # partial lines buffer until the newline
    buf.write("partial")
    assert buf.tail(0)[0][-1] == "f"
    buf.write(" done\n")
    assert buf.tail(0)[0][-1] == "partial done"


def test_gui_scene_playback(tmp_path, rng):
    """Scene player endpoints (the reference GUI's QMediaPlayer role,
    MDVT_gui.py:326-394): file listing, JPEG frame scrub, MJPEG
    stream, and the path-traversal guard."""
    root = _make_project(tmp_path, rng)
    # produce a 'clip' artifact at the planned scene path
    frames = np.zeros((6, 24, 32, 3), np.uint8)
    for i in range(6):
        frames[i, :, : 4 + 4 * i] = (40 * (i + 1)) % 255
    import os
    vio.save_rgb_video(frames, os.path.join(root, "scene_1.mkv"), 24)

    srv, state, port = gui.serve_background(root)
    try:
        sf = _req(port, "/api/scene_files?scene=1")
        assert sf["files"]["clip"] == "scene_1.mkv"
        assert "sbs" not in sf["files"]  # not produced yet
        assert sf["meta"]["clip"]["frames"] == 6
        assert sf["meta"]["clip"]["width"] == 32

        # single-frame scrub returns a JPEG
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/video/frame?f=scene_1.mkv&i=3",
                timeout=10) as r:
            assert r.headers["Content-Type"] == "image/jpeg"
            jpg = r.read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG SOI

        # MJPEG stream: read the first two multipart frames
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/video/stream?f=scene_1.mkv&start=0",
            timeout=10)
        assert "multipart/x-mixed-replace" in req.headers["Content-Type"]
        head = req.read(64)
        assert b"--mdvtframe" in head and b"image/jpeg" in head
        req.close()

        # traversal guard: ../ escapes are rejected (404, no file leak)
        err = _req(port, "/api/scene_files?scene=99")
        assert "error" in err
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/video/frame?f=../movie.mkv",
                timeout=10) as r:
            pass
    except urllib.error.HTTPError as e:
        assert e.code == 404  # the traversal attempt must 404
    finally:
        state.player.close()
        srv.shutdown()
