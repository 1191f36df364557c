"""Native Matroska StereoMode remux (io/mkv.py): the tag must be
written without ffmpeg, the video payload must stay bit-identical, and
seeking must survive the regenerated Cues (reference emits this tag via
ffmpeg, movie_2_3D.py:752-762)."""

import numpy as np
import cv2
import pytest

from metric_depth_video_toolbox_tpu.io import mkv
from metric_depth_video_toolbox_tpu.io import video as vio


@pytest.fixture
def sample(tmp_path, rng):
    frames = rng.integers(0, 255, (10, 32, 64, 3)).astype(np.uint8)
    path = str(tmp_path / "s.mkv")
    vio.save_rgb_video(frames, path, 24)
    return path, frames


def test_tag_roundtrip_and_payload_identical(sample):
    path, frames = sample
    assert mkv.get_stereo_mode(path) is None
    out = mkv.set_stereo_mode(path)
    assert out == path
    assert mkv.get_stereo_mode(path) == mkv.STEREO_SBS_LEFT_FIRST

    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    for i in range(10):
        ok, fr = cap.read()
        assert ok
        assert np.array_equal(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB),
                              frames[i])
    cap.release()


def test_seek_survives_regenerated_cues(sample):
    path, frames = sample
    mkv.set_stereo_mode(path)
    cap = cv2.VideoCapture(path)
    cap.set(cv2.CAP_PROP_POS_FRAMES, 6)
    ok, fr = cap.read()
    cap.release()
    assert ok
    assert np.array_equal(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB), frames[6])


def test_retag_replaces_existing(sample):
    path, _ = sample
    mkv.set_stereo_mode(path, mkv.STEREO_SBS_LEFT_FIRST)
    mkv.set_stereo_mode(path, mkv.STEREO_TOP_BOTTOM_LEFT_FIRST)
    assert mkv.get_stereo_mode(path) == mkv.STEREO_TOP_BOTTOM_LEFT_FIRST
    # still exactly one StereoMode element -> decodable
    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    cap.release()


def test_non_mkv_rejected(tmp_path):
    p = tmp_path / "x.mkv"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        mkv.set_stereo_mode(str(p))


def test_step7_concat_tags_stereo_mode(tmp_path, rng):
    """movie step7 must emit a StereoMode-tagged MKV even without an
    ffmpeg binary (reference relies on ffmpeg for the tag)."""
    from metric_depth_video_toolbox_tpu.pipeline import movie

    scenes = []
    total = 0
    for i, n in enumerate((4, 6)):
        frames = rng.integers(0, 255, (n, 32, 128, 3)).astype(np.uint8)
        sbs = str(tmp_path / f"scene_{i}_sbs.mkv")
        vio.save_rgb_video(frames, sbs, 24)
        scenes.append({"sbs": sbs, "infilled": sbs + "_missing.mkv"})
        total += n
    color = str(tmp_path / "movie.mkv")
    vio.save_rgb_video(rng.integers(0, 255, (total, 32, 64, 3))
                       .astype(np.uint8), color, 24)
    out = movie.step7_concat(scenes, color,
                             output=str(tmp_path / "final_SBS.mkv"))
    assert mkv.get_stereo_mode(out) == mkv.STEREO_SBS_LEFT_FIRST
    n, w, h, _ = vio.video_info(out)
    assert (n, w, h) == (total, 128, 32)
