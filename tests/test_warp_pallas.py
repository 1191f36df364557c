"""Pallas disparity-sweep kernel (interpret mode on CPU): shift
correctness, occlusion ordering, hole semantics."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import rasterize
from metric_depth_video_toolbox_tpu.ops import warp_pallas


def test_disparity_sweep_constant_depth_shift():
    h, w = 16, 256
    depth = np.full((h, w), 4.0, np.float32)
    color = np.zeros((3, h, w), np.float32)
    color[0] = np.linspace(0, 1, w)[None, :]
    pad_l, pad_r = warp_pallas.pad_widths(w, 128)
    dpad = np.pad(depth, ((0, 0), (pad_l, pad_r)))
    cpad = np.pad(color, ((0, 0), (0, 0), (pad_l, pad_r)))
    # single plane at z=4 with disparity +10.25
    best_z, col, found = warp_pallas.disparity_sweep(
        jnp.asarray(dpad), jnp.asarray(cpad),
        jnp.asarray([10], np.int32), jnp.asarray([0.25], np.float32),
        jnp.asarray([4.0], np.float32), jnp.asarray([0.5], np.float32),
        num_planes=1, pad_left=pad_l, interpret=True)
    found = np.asarray(found)
    col = np.asarray(col)
    # interior pixels: target x samples source x+10.25
    xs = np.arange(0, w - 12)
    expected = (xs + 10.25) / (w - 1)
    assert found[:, : w - 12].all()
    assert np.allclose(col[5, xs, 0], expected, atol=1e-3)
    # beyond the right edge the source is zero padding -> no hit
    assert not found[:, -2:].any()


def test_disparity_sweep_front_plane_wins():
    h, w = 8, 128
    depth = np.full((h, w), 8.0, np.float32)
    depth[:, 40:80] = 2.0
    color = np.ones((3, h, w), np.float32)
    pad_l, pad_r = warp_pallas.pad_widths(w, 128)
    dpad = np.pad(depth, ((0, 0), (pad_l, pad_r)))
    cpad = np.pad(color, ((0, 0), (0, 0), (pad_l, pad_r)))
    # two planes, front first (z=2 then z=8), zero disparity
    best_z, col, found = warp_pallas.disparity_sweep(
        jnp.asarray(dpad), jnp.asarray(cpad),
        jnp.asarray([0, 0], np.int32), jnp.asarray([0.0, 0.0], np.float32),
        jnp.asarray([2.0, 8.0], np.float32),
        jnp.asarray([0.3, 0.3], np.float32),
        num_planes=2, pad_left=pad_l, interpret=True)
    bz = np.asarray(best_z)
    assert np.allclose(bz[:, 45:75], 2.0, atol=0.05)
    assert np.allclose(bz[:, :35], 8.0, atol=0.05)
    assert np.asarray(found).all()


def test_stereo_sweep_warp_identity():
    h, w = 32, 192
    k = geo.camera_matrix_from_fov(w, h, xfov_deg=60.0)
    depth = np.full((h, w), 5.0, np.float32)
    color = np.zeros((h, w, 3), np.float32)
    color[..., 1] = np.linspace(0, 1, h)[:, None]
    res = rasterize.stereo_sweep_warp(
        jnp.asarray(depth), jnp.asarray(color), k, jnp.eye(4),
        num_planes=32, remove_edges=False, neutralize_rotation=False,
        interpret=True)
    mask = np.asarray(res.mask)
    assert mask.mean() > 0.99
    assert np.abs(np.asarray(res.depth)[mask] - 5.0).max() < 0.2
    got = np.asarray(res.color)
    want = np.broadcast_to(color[..., 1], (h, w))
    assert np.abs(got[..., 1][mask] - want[mask]).max() < 0.02


def test_stereo_sweep_warp_eye_shift_disparity():
    h, w = 32, 256
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0))
    depth = np.full((h, w), 4.0, np.float32)
    color = np.zeros((h, w, 3), np.float32)
    color[:, 100:120] = [1.0, 0, 0]
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 0.2  # points move +x
    res = rasterize.stereo_sweep_warp(
        jnp.asarray(depth), jnp.asarray(color), jnp.asarray(k),
        jnp.asarray(m), num_planes=64, remove_edges=False,
        neutralize_rotation=False, interpret=True)
    col = np.asarray(res.color)
    # expected pixel shift = fx * tx / z
    shift = k[0, 0] * 0.2 / 4.0
    red_cols = np.where(col[16, :, 0] > 0.5)[0]
    assert red_cols.size > 0
    assert abs(red_cols.mean() - (109.5 + shift)) < 1.5


def test_dual_sweep_matches_two_call_path():
    """The fused main+anchor sweep must reproduce the main surface of
    stereo_sweep_warp and render the culled edge pixels into the anchor
    layer (with the edge-only payload channels carried through)."""
    rng = np.random.default_rng(3)
    h, w = 48, 256
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0))
    depth = np.full((h, w), 8.0, np.float32)
    depth[:, 90:150] = 2.5  # a foreground slab -> silhouette edges
    color = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    extra = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 0.1

    main, a_color, a_extra, a_found = rasterize.stereo_sweep_warp_dual(
        jnp.asarray(depth), jnp.asarray(color), jnp.asarray(extra),
        jnp.asarray(k), jnp.asarray(m), num_planes=64,
        neutralize_rotation=False, interpret=True)
    ref = rasterize.stereo_sweep_warp(
        jnp.asarray(depth), jnp.asarray(color), jnp.asarray(k),
        jnp.asarray(m), num_planes=64, remove_edges=True,
        neutralize_rotation=False, interpret=True)

    # main surface identical to the single-sweep path (same plane set:
    # edge depths lie within the full-depth range here)
    assert np.array_equal(np.asarray(main.mask), np.asarray(ref.mask))
    mk = np.asarray(main.mask)
    assert np.allclose(np.asarray(main.depth)[mk],
                       np.asarray(ref.depth)[mk], atol=1e-5)
    assert np.allclose(np.asarray(main.color)[mk],
                       np.asarray(ref.color)[mk], atol=1e-5)

    # anchor layer: edge pixels land near their shifted positions with
    # BOTH payloads (color and extra) carried
    af = np.asarray(a_found)
    assert af.any(), "edge anchors should land somewhere"
    em = np.asarray(main.edge_mask)
    assert em.any()
    # anchors only exist where some edge pixel projected: the foreground
    # slab borders shift by fx*tx/z
    ac = np.asarray(a_color)[af]
    ae = np.asarray(a_extra)[af]
    assert (ac >= 0).all() and (ac <= 1).all()
    assert (ae > 0).any()  # extra payload carried, not zeroed


def test_dual_sweep_stereo_frame_anchor_seeds():
    """End-to-end TRUE-config stereo_frame: anchor seeds appear inside
    disocclusion holes (image not black where an anchor landed)."""
    from functools import partial
    import jax
    from metric_depth_video_toolbox_tpu.ops import codec
    from metric_depth_video_toolbox_tpu.pipeline import stereo

    h, w = 64, 256
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0))
    depth = np.full((h, w), 12.0, np.float32)
    depth[:, 100:160] = 2.0
    color = np.full((h, w, 3), 200, np.uint8)
    cfg = stereo.StereoConfig(
        width=w, height=h, out_width=w, out_height=h, max_depth=100.0,
        remove_edges=True, place_edge_points=True, make_infill_mask=True,
        warp_method="sweep", has_convergence=True,
        fused_anchor_sweep=True)
    enc = jax.jit(lambda d: codec.encode_depth_frame(d, 100.0))
    drgb = np.asarray(enc(jnp.asarray(depth[None])))[0]
    out = stereo.stereo_frame(
        jnp.asarray(drgb), jnp.asarray(color), jnp.asarray(k),
        jnp.asarray(k), jnp.eye(4), jnp.asarray(2.0), jnp.asarray(1.0),
        cfg=cfg)
    img = np.asarray(out["image"])
    mask = np.asarray(out["infill_mask"])
    assert img.shape == (h, 2 * w, 3)
    # the mask must mark disocclusion holes on at least one eye
    assert (mask > 0).any()


def test_dual_sweep_rotation_neutralized_matches_single():
    """Fused dual sweep with a toe-in rotation (neutralize_rotation):
    the main surface must match the single-sweep rotate path."""
    rng = np.random.default_rng(5)
    h, w = 48, 256
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0))
    depth = np.full((h, w), 10.0, np.float32)
    depth[:, 120:170] = 3.0
    color = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    extra = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    m = np.asarray(geo.rotation_y(np.radians(1.0)) @
                   geo.translation_matrix(0.05, 0.0, 0.0), np.float32)

    main, a_color, a_extra, a_found = rasterize.stereo_sweep_warp_dual(
        jnp.asarray(depth), jnp.asarray(color), jnp.asarray(extra),
        jnp.asarray(k), jnp.asarray(m), num_planes=64,
        neutralize_rotation=True, interpret=True)
    ref = rasterize.stereo_sweep_warp(
        jnp.asarray(depth), jnp.asarray(color), jnp.asarray(k),
        jnp.asarray(m), num_planes=64, remove_edges=True,
        neutralize_rotation=True, interpret=True)

    mk = np.asarray(main.mask) & np.asarray(ref.mask)
    assert mk.mean() > 0.8
    assert np.allclose(np.asarray(main.depth)[mk],
                       np.asarray(ref.depth)[mk], atol=1e-4)
    assert np.allclose(np.asarray(main.color)[mk],
                       np.asarray(ref.color)[mk], atol=1e-4)
    assert np.asarray(a_found).any()
