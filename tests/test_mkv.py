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


# --- native audio passthrough (mux_audio) ----------------------------------

def _make_audio_mkv(path, n_blocks=20, block_ms=100, scale=1_000_000,
                    use_groups=False):
    """Hand-built minimal Matroska file with ONE PCM audio track
    (A_PCM/INT/LIT, 8 kHz mono s16) and ``n_blocks`` SimpleBlocks of
    ``block_ms`` each — this host has no ffmpeg to synthesize audio
    fixtures, so the test builds the EBML directly."""
    import struct

    el = mkv._element
    header = el(0x1A45DFA3,
                el(0x4286, b"\x01") + el(0x42F7, b"\x01")
                + el(0x42F2, b"\x04") + el(0x42F3, b"\x08")
                + el(0x4282, b"matroska")
                + el(0x4287, b"\x04") + el(0x4285, b"\x02"))
    info = el(mkv.INFO,
              el(mkv.TIMESTAMP_SCALE, mkv._encode_uint(scale)))
    audio_el = el(0xE1, el(0xB5, struct.pack(">f", 8000.0))
                  + el(0x9F, b"\x01") + el(0x6264, b"\x10"))
    entry = el(mkv.TRACK_ENTRY,
               el(mkv.TRACK_NUMBER, b"\x01")
               + el(mkv.TRACK_UID, b"\x07")
               + el(mkv.TRACK_TYPE, b"\x02")
               + el(0x86, b"A_PCM/INT/LIT") + audio_el)
    tracks = el(mkv.TRACKS, entry)
    ms_per_tick = scale / 1_000_000
    clusters = b""
    payloads = []
    for i in range(n_blocks):
        pcm = bytes([(i * 7 + j) % 256
                     for j in range(int(8000 * 2 * block_ms / 1000))])
        payloads.append(pcm)
        ts = int(round(i * block_ms / ms_per_tick))
        body = b"\x81" + (0).to_bytes(2, "big", signed=True) \
            + b"\x80" + pcm
        if use_groups:
            dur = int(round(block_ms / ms_per_tick))
            blk = el(mkv.BLOCK_GROUP,
                     el(mkv.BLOCK, b"\x81"
                        + (0).to_bytes(2, "big", signed=True)
                        + b"\x00" + pcm)
                     + el(mkv.BLOCK_DURATION, mkv._encode_uint(dur)))
        else:
            blk = el(mkv.SIMPLE_BLOCK, body)
        clusters += el(mkv.CLUSTER,
                       el(mkv.CLUSTER_TIMESTAMP, mkv._encode_uint(ts))
                       + blk)
    body = info + tracks + clusters
    with open(path, "wb") as f:
        f.write(header)
        f.write(mkv._encode_id(mkv.SEGMENT)
                + mkv._encode_size(len(body), 8))
        f.write(body)
    return payloads


def test_has_audio_track(sample, tmp_path):
    path, _ = sample
    assert not mkv.has_audio_track(path)
    asrc = str(tmp_path / "a.mkv")
    _make_audio_mkv(asrc)
    assert mkv.has_audio_track(asrc)


def test_mux_audio_blocks_and_video_intact(sample, tmp_path):
    """Audio blocks are copied verbatim (remux, no transcode), the
    video payload stays decodable, and the StereoMode tag can ride the
    same rewrite (reference mux: movie_2_3D.py:752-762)."""
    path, frames = sample
    asrc = str(tmp_path / "a.mkv")
    payloads = _make_audio_mkv(asrc, n_blocks=6, block_ms=50)
    out = mkv.mux_audio(path, asrc,
                        stereo_mode=mkv.STEREO_SBS_LEFT_FIRST)
    assert out == path
    assert mkv.has_audio_track(path)
    assert mkv.get_stereo_mode(path) == mkv.STEREO_SBS_LEFT_FIRST

    # audio side: every source PCM payload present, bit-identical
    with open(path, "rb") as f:
        buf = f.read()
    _scale, atracks, blocks = mkv._collect_audio(buf, path)
    assert len(atracks) == 1 and atracks[0][0] != 1  # renumbered
    got = [rest[1:] for _ts, _n, _g, rest, _e in blocks]  # strip flags
    assert got == payloads

    # video side: all frames still decode bit-exactly
    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    for i in range(10):
        ok, fr = cap.read()
        assert ok and np.array_equal(
            cv2.cvtColor(fr, cv2.COLOR_BGR2RGB), frames[i])
    cap.release()


def test_mux_audio_timestamp_scale_conversion(sample, tmp_path):
    """A source with a non-default TimestampScale must land its blocks
    at the same absolute times in the dest's scale."""
    path, _ = sample
    asrc = str(tmp_path / "a.mkv")
    _make_audio_mkv(asrc, n_blocks=4, block_ms=100, scale=500_000)
    mkv.mux_audio(path, asrc)
    with open(path, "rb") as f:
        buf = f.read()
    scale, _atracks, blocks = mkv._collect_audio(buf, path)
    assert scale == 1_000_000
    ts = sorted(b[0] for b in blocks)
    assert ts == [0, 100, 200, 300]


def test_mux_audio_block_groups(sample, tmp_path):
    """BlockGroup-wrapped audio (Block + BlockDuration) survives the
    remux with durations rescaled."""
    path, _ = sample
    asrc = str(tmp_path / "a.mkv")
    _make_audio_mkv(asrc, n_blocks=3, block_ms=40, scale=500_000,
                    use_groups=True)
    mkv.mux_audio(path, asrc)
    with open(path, "rb") as f:
        buf = f.read()
    _scale, _atracks, blocks = mkv._collect_audio(buf, path)
    assert len(blocks) == 3 and all(b[2] for b in blocks)  # groups
    for _ts, _n, _g, _rest, extra in blocks:
        durs = [int.from_bytes(p, "big") for i, p in extra
                if i == mkv.BLOCK_DURATION]
        assert durs == [40]  # 80 src ticks at 0.5 ms -> 40 ms dest


def test_mux_audio_no_audio_raises(sample, tmp_path):
    path, _ = sample
    other = str(tmp_path / "v2.mkv")
    vio.save_rgb_video(np.zeros((3, 32, 64, 3), np.uint8), other, 24)
    with pytest.raises(ValueError):
        mkv.mux_audio(path, other)


def test_step7_native_audio_passthrough(tmp_path, rng):
    """movie step7 must carry the source's audio into the final SBS
    movie without ffmpeg (reference movie_2_3D.py:723-778)."""
    from metric_depth_video_toolbox_tpu.pipeline import movie

    frames = rng.integers(0, 255, (6, 32, 128, 3)).astype(np.uint8)
    sbs = str(tmp_path / "scene_0_sbs.mkv")
    vio.save_rgb_video(frames, sbs, 24)
    color = str(tmp_path / "movie.mkv")
    vio.save_rgb_video(rng.integers(0, 255, (6, 32, 64, 3))
                       .astype(np.uint8), color, 24)
    asrc = str(tmp_path / "a.mkv")
    _make_audio_mkv(asrc, n_blocks=3, block_ms=80)
    mkv.mux_audio(color, asrc)  # audio-bearing source movie
    assert mkv.has_audio_track(color)

    out = movie.step7_concat(
        [{"sbs": sbs, "infilled": sbs + "_missing.mkv"}], color,
        output=str(tmp_path / "final_SBS.mkv"))
    assert mkv.has_audio_track(out)
    assert mkv.get_stereo_mode(out) == mkv.STEREO_SBS_LEFT_FIRST
    n, w, h, _ = vio.video_info(out)
    assert (n, w, h) == (6, 128, 32)


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
