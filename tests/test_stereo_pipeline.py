"""End-to-end stereo rerender on a tiny synthetic scene: geometry of the
output disparity is checked analytically."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.ops import codec
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.pipeline import stereo


def _make_scene_videos(tmp_path, t=4, h=48, w=64):
    depth = np.full((t, h, w), 8.0, np.float32)
    depth[:, 16:32, 24:40] = 3.0  # foreground box
    color = np.zeros((t, h, w, 3), np.uint8)
    color[...] = 40
    color[:, 16:32, 24:40] = [200, 30, 30]
    dpath = str(tmp_path / "clip_depth.mkv")
    cpath = str(tmp_path / "clip.mkv")
    vio.save_depth_video(depth, dpath, 24, 100.0)
    vio.save_rgb_video(color, cpath, 24)
    return dpath, cpath, depth, color


def test_stereo_frame_device_step():
    h, w = 32, 48
    cfg = stereo.StereoConfig(width=w, height=h, out_width=w, out_height=h,
                              max_depth=100.0)
    depth = np.full((h, w), 5.0, np.float32)
    rgb = np.asarray(codec.encode_depth_frame(jnp.asarray(depth), 100.0))
    color = np.full((h, w, 3), 128, np.uint8)
    k = geo.camera_matrix_from_fov(w, h, xfov_deg=60.0)
    out = stereo.stereo_frame(jnp.asarray(rgb), jnp.asarray(color), k, k,
                              jnp.eye(4), jnp.asarray(0.0),
                              jnp.asarray(1.0), cfg)
    img = np.asarray(out["image"])
    assert img.shape == (h, 2 * w, 3)
    # majority of both eyes covered with the flat plane's color
    assert (np.abs(img[:, :w].astype(int) - 128) < 3).mean() > 0.85
    assert (np.abs(img[:, w:].astype(int) - 128) < 3).mean() > 0.85
    dl = np.asarray(out["depth_left"])
    assert np.isclose(np.median(dl[dl < 1e30]), 5.0, atol=0.05)


def test_render_stereo_video_end_to_end(tmp_path):
    dpath, cpath, depth, color = _make_scene_videos(tmp_path)
    out = stereo.render_stereo_video(
        dpath, color_video=cpath, xfov=60.0, batch_size=2,
        remove_edges=True, do_basic_infill=True, infill_mask=True)
    assert out.endswith("_stereo.mkv")
    frames, fps = vio.read_video_frames(out)
    assert frames.shape[0] == 4
    assert frames.shape[2] == 2 * 64
    import os
    assert os.path.exists(out + "_infillmask.mkv")  # tiny file < 2KB floor

    # Disparity check: the foreground box (3 m) must be displaced between
    # the eyes by ~ ipd * fx / z relative to the background.
    k = np.asarray(geo.camera_matrix_from_fov(64, 48, xfov_deg=60.0))
    # master-FOV depth scaling changes absolute depth but disparity in
    # pixels for the box stays ipd/2 * fx / z on each eye.
    left = frames[0, :, :64].astype(float)
    right = frames[0, :, 64:].astype(float)
    row = 24
    cols = np.arange(64)
    wl = np.maximum(left[row, :, 0] - 60.0, 0.0)
    wr = np.maximum(right[row, :, 0] - 60.0, 0.0)
    assert wl.sum() > 0 and wr.sum() > 0
    # left eye sees the box shifted right, right eye shifted left;
    # intensity-weighted centroid is robust to subpixel resampling blur
    shift = (cols * wl).sum() / wl.sum() - (cols * wr).sum() / wr.sum()
    # expected ~ ipd * fx / z = 0.063 * 55.4 / 3 ~ 1.16 px
    assert 0.4 < shift < 3.0


def test_create_sbs_depth_output(tmp_path):
    """--create_sbs_depth emits an RGB-encoded SBS depth video whose
    decode matches the rendered scene depth (reference
    stereo_rerender.py --create_sbs_depth). The encode now happens on
    device (uint8 out) so the driver never fetches float32 depth."""
    dpath, cpath, depth, color = _make_scene_videos(tmp_path, t=2)
    out = stereo.render_stereo_video(
        dpath, color_video=cpath, xfov=60.0, batch_size=2,
        remove_edges=False, place_edge_points=False,
        create_sbs_depth=True, master_xfov=60.0)
    frames, _ = vio.read_video_frames(out + "_depth.mkv")
    assert frames.shape == (2, 48, 2 * 64, 3)
    dec = np.asarray(codec.decode_depth_frame(
        jnp.asarray(frames[0, :, :64]), 100.0))
    # background plane is 8 m; rendered+encoded+decoded must round-trip
    assert np.isclose(np.median(dec[dec > 0.1]), 8.0, atol=0.2)


def test_touchly1_layout(tmp_path):
    dpath, cpath, depth, color = _make_scene_videos(tmp_path, t=2)
    out = stereo.render_stereo_video(
        dpath, color_video=cpath, xfov=60.0, batch_size=2, touchly1=True,
        remove_edges=False, place_edge_points=False)
    assert out.endswith("_Touchly1.mkv")
    frames, _ = vio.read_video_frames(out)
    assert frames.shape[1] == 2 * 48 and frames.shape[2] == 64
    # bottom half is the reversed depth panel: foreground box (3 m, clipped
    # to touchly_max_depth 5) must be *brighter* (nearer = higher value)
    panel = frames[0, 48:]
    assert panel[24, 32, 0] > panel[8, 8, 0]


def test_mask_pack_roundtrip():
    """Sparse mask transfer encoding: bitmap + compacted values must
    reconstruct the dense mask exactly; frames whose hole count
    exceeds the cap are flagged via count."""
    rng = np.random.default_rng(7)
    h, w = 40, 56  # w divisible by 8
    mask = np.zeros((2, h, w, 3), np.uint8)
    hole0 = rng.random((h, w)) < 0.08
    mask[0][hole0] = rng.integers(1, 255, (hole0.sum(), 3))
    hole1 = rng.random((h, w)) < 0.6  # overflows H*W//5 cap
    mask[1][hole1] = rng.integers(1, 255, (hole1.sum(), 3))
    packed = {k: np.asarray(v) for k, v in
              stereo._pack_mask_batch(jnp.asarray(mask)).items()}
    cap = (h * w) // stereo.MASK_PACK_FRAC
    assert packed["mask_count"][0] == hole0.sum() <= cap
    assert packed["mask_count"][1] == hole1.sum() > cap
    rec = stereo._unpack_mask_frame(packed["mask_bits"][0],
                                    packed["mask_vals"][0],
                                    int(packed["mask_count"][0]), h, w)
    np.testing.assert_array_equal(rec, mask[0])


def test_smooth_convergence_handles_nans():
    vals = [np.nan, 2.0, 2.1, np.nan, 2.3, 2.2, np.nan]
    out = stereo.smooth_convergence(vals)
    assert out.shape == (7,)
    assert np.isfinite(out).all()
    assert 1.5 < out.mean() < 2.6


def test_touchly0_layout(tmp_path):
    """Touchly0: 3-panel (left | right | depth) at the render eye size
    (reference stereo_rerender.py:417-418)."""
    depth = np.full((3, 16, 24), 4.0, np.float32)
    color = np.zeros((3, 16, 24, 3), np.uint8)
    dpath = str(tmp_path / "d.mkv")
    cpath = str(tmp_path / "c.mkv")
    vio.save_depth_video(depth, dpath, 24, 20.0)
    vio.save_rgb_video(color, cpath, 24)
    out = stereo.render_stereo_video(
        dpath, color_video=cpath, xfov=60.0, batch_size=2, touchly0=True,
        max_depth=20.0, vr180_eye_size=64)
    n, w, h, _ = vio.video_info(out)
    assert out.endswith("_Touchly0.mkv")
    assert (n, w, h) == (3, 64 * 3, 64)


def test_vr180_equirect_output(tmp_path):
    depth = np.full((2, 16, 24), 4.0, np.float32)
    color = np.full((2, 16, 24, 3), 128, np.uint8)
    dpath = str(tmp_path / "d.mkv")
    cpath = str(tmp_path / "c.mkv")
    vio.save_depth_video(depth, dpath, 24, 20.0)
    vio.save_rgb_video(color, cpath, 24)
    out = stereo.render_stereo_video(
        dpath, color_video=cpath, xfov=60.0, batch_size=2, vr180=True,
        max_depth=20.0, vr180_eye_size=64)
    n, w, h, _ = vio.video_info(out)
    assert (n, w, h) == (2, 64 * 2, 64)


def test_packed_image_path_matches_dense(tmp_path, monkeypatch):
    """The tunneled-runtime transfer packings (sparse mask + image
    tile-bitpack, ops/tilepack.py) must be invisible in the output:
    byte-identical SBS + mask videos vs the dense fetch path."""
    dpath, cpath, _, _ = _make_scene_videos(tmp_path)

    dense = stereo.render_stereo_video(
        dpath, color_video=cpath, output=str(tmp_path / "dense.mkv"),
        xfov=60.0, batch_size=2, infill_mask=True)
    dense_frames, _ = vio.read_video_frames(dense)
    dense_mask, _ = vio.read_video_frames(dense + "_infillmask.mkv")

    monkeypatch.setattr(stereo, "_tunneled_runtime", lambda: True)
    packed = stereo.render_stereo_video(
        dpath, color_video=cpath, output=str(tmp_path / "packed.mkv"),
        xfov=60.0, batch_size=2, infill_mask=True)
    packed_frames, _ = vio.read_video_frames(packed)
    packed_mask, _ = vio.read_video_frames(packed + "_infillmask.mkv")

    assert np.array_equal(dense_frames, packed_frames)
    assert np.array_equal(dense_mask, packed_mask)


def test_tilepack_roundtrip_exact_and_batched():
    """Tile-bitpack codec: exact over mixed content (flat, gradient,
    noise), non-multiple-of-256 widths, and batch > 1."""
    import jax

    from metric_depth_video_toolbox_tpu.ops import tilepack

    rng = np.random.default_rng(0)
    for (b, h, w, c) in [(2, 16, 300, 3), (1, 8, 256, 3), (3, 4, 37, 1)]:
        img = np.zeros((b, h, w, c), np.uint8)
        img[:, :, : w // 3] = 77
        img[:, :, w // 3:] = np.linspace(
            0, 200, w - w // 3)[None, None, :, None].astype(np.uint8)
        img[:, h // 2:] += rng.integers(
            0, 255, (b, h - h // 2, w, c)).astype(np.uint8)
        layout = tilepack.PackLayout(b, h, w, c)
        out = jax.jit(lambda x, lo=layout: tilepack.pack(x, lo))(img)
        out = {k: np.asarray(v) for k, v in out.items()}
        buckets = tilepack.fetch_buckets(out, out, np.asarray)
        rec = tilepack.unpack(out["bids"], buckets, layout)
        assert np.array_equal(rec, img), (b, h, w, c)
