"""Host video I/O: FFV1 losslessness, atomic commit, depth video contract,
sidecar round-trips."""

import os

import numpy as np
import pytest

from metric_depth_video_toolbox_tpu.io import sidecar, video


def test_video_roundtrip_lossless(tmp_path, rng):
    path = str(tmp_path / "t.mkv")
    frames = rng.integers(0, 255, (5, 32, 48, 3), np.uint8)
    assert video.save_rgb_video(frames, path, fps=24)
    out, fps = video.read_video_frames(path)
    assert fps == 24
    assert (out == frames).all()


def test_writer_commit_verifies_count(tmp_path):
    path = str(tmp_path / "v.mkv")
    w = video.VideoWriter(path, 24, 48, 32)
    w.write(np.zeros((32, 48, 3), np.uint8))
    assert not w.commit(expected_frames=5)  # wrong expectation -> no move
    assert not os.path.exists(path)

    rng = np.random.default_rng(1)
    w = video.VideoWriter(path, 24, 48, 32)
    for _ in range(3):  # noise frames so the file exceeds the 2 KB floor
        w.write(rng.integers(0, 255, (32, 48, 3), np.uint8))
    assert w.commit()
    assert os.path.exists(path)
    assert video.is_valid_video(path)


def test_depth_video_contract(tmp_path, rng):
    path = str(tmp_path / "d_depth.mkv")
    depth = rng.uniform(0.5, 90.0, (4, 32, 48)).astype(np.float32)
    assert video.save_depth_video(depth, path, fps=30, max_depth=100.0)
    r = video.DepthVideoReader(path, max_depth=100.0)
    got = r.read_depth_batch(4)
    r.close()
    step = 65536 * 100 / 255**4
    assert np.abs(got - depth).max() <= 2 * step


def test_prefetching_reader(tmp_path, rng):
    path = str(tmp_path / "p.mkv")
    frames = rng.integers(0, 255, (10, 16, 16, 3), np.uint8)
    video.save_rgb_video(frames, path, fps=24)
    r = video.PrefetchingBatchReader(path, batch_size=4)
    got = np.concatenate(list(r), axis=0)
    assert (got == frames).all()


def test_sidecar_roundtrips(tmp_path, rng):
    t = rng.normal(size=(5, 4, 4)).astype(np.float32)
    p = str(tmp_path / "x_transformations.json")
    sidecar.save_transformations(p, t)
    assert np.allclose(sidecar.load_transformations(p), t)

    xf = str(tmp_path / "x_xfovs.json")
    sidecar.save_xfovs(xf, [50.0, 51.0])
    assert np.allclose(sidecar.load_xfovs(xf), [50.0, 51.0])

    cv = str(tmp_path / "x_convergence_depths.json")
    sidecar.save_convergence_depths(cv, [2.0, np.float32(3.0)])
    assert np.allclose(sidecar.load_convergence_depths(cv), [2.0, 3.0])

    tr = str(tmp_path / "x_tracking.json")
    frames = [np.array([[1, 5.0, 6.0], [2, 7.0, 8.0]]),
              np.array([[2, 9.0, 1.0]])]
    sidecar.save_tracking(tr, frames)
    back = sidecar.load_tracking(tr)
    assert np.allclose(back[0], frames[0]) and np.allclose(back[1], frames[1])

    dense, ids = sidecar.tracking_to_dense(back)
    assert dense.shape == (2, 2, 3)
    assert list(ids) == [1, 2]
    assert dense[1, 0, 2] == 0.0  # track 1 missing in frame 1
    assert dense[1, 1, 2] == 1.0 and dense[1, 1, 0] == 9.0


def test_missing_video_raises():
    with pytest.raises(FileNotFoundError):
        video.VideoReader("/nonexistent/file.mkv")


def test_lossless_fourcc_selection(tmp_path, rng, monkeypatch):
    # HuffYUV (fast path) only where byte-exact: even width AND height;
    # odd dims fall back to FFV1. MDVT_LOSSLESS_CODEC overrides both.
    assert video.lossless_fourcc(48, 32) == "HFYU"
    assert video.lossless_fourcc(47, 32) == "FFV1"
    assert video.lossless_fourcc(48, 31) == "FFV1"
    monkeypatch.setenv("MDVT_LOSSLESS_CODEC", "FFV1")
    assert video.lossless_fourcc(48, 32) == "FFV1"


def test_default_codec_roundtrip_exact(tmp_path, rng):
    # the default (codec_fourcc=None) writer must stay byte-exact on
    # the HFYU fast path (odd dims are truncated to even by cv2 for
    # every lossless codec — a limitation shared with the reference's
    # cv2+FFV1 writers, hence untestable for exactness)
    w, h = 48, 32
    path = str(tmp_path / f"rt{w}x{h}.mkv")
    frames = rng.integers(0, 255, (4, h, w, 3), np.uint8)
    wr = video.VideoWriter(path, 24, w, h)
    for f in frames:
        wr.write(f)
    assert wr.commit()
    out, _ = video.read_video_frames(path)
    assert (out == frames).all()
