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
