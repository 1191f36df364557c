"""Forward-warp z-buffer: identity reproduction, disparity shift,
occlusion ordering, edge culling — against analytically known results."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import rasterize


def _scene(h=48, w=64, depth_bg=10.0):
    k = geo.camera_matrix_from_fov(w, h, xfov_deg=60.0)
    depth = np.full((h, w), depth_bg, np.float32)
    color = np.zeros((h, w, 3), np.float32)
    color[..., 0] = np.linspace(0, 1, w)[None, :]
    color[..., 1] = np.linspace(0, 1, h)[:, None]
    return k, depth, color


def test_identity_warp_reproduces_input():
    k, depth, color = _scene()
    res = rasterize.forward_warp(
        jnp.asarray(depth), jnp.asarray(color), k, k, jnp.eye(4),
        depth.shape, subsample=1, remove_edges=False, of_by_one=False)
    assert bool(np.asarray(res.mask).all())
    assert np.allclose(np.asarray(res.depth), depth, atol=1e-3)
    assert np.allclose(np.asarray(res.color), color, atol=1e-3)


def test_translation_produces_expected_disparity():
    # Camera moves +x by b: points shift in image by -b*fx/z pixels.
    h, w = 48, 64
    k, depth, color = _scene(h, w, depth_bg=5.0)
    b = 0.5
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = -b  # move points -x == camera +x
    res = rasterize.forward_warp(
        jnp.asarray(depth), jnp.asarray(color), k, k, jnp.asarray(t),
        (h, w), subsample=2, remove_edges=False, of_by_one=False)
    fx = float(np.asarray(k)[0, 0])
    shift = b * fx / 5.0
    out = np.asarray(res.color)
    mask = np.asarray(res.mask)
    # Column x in the output should hold the color of source column
    # x + shift. Check a middle row away from boundaries.
    row = h // 2
    for x in range(5, w - int(np.ceil(shift)) - 5):
        src = int(round(x + shift))
        assert mask[row, x]
        assert abs(out[row, x, 0] - color[row, src, 0]) < 0.05


def test_occlusion_near_wins():
    h, w = 32, 32
    k, depth, color = _scene(h, w, depth_bg=10.0)
    # Foreground square at 2 m painted red.
    depth[12:20, 12:20] = 2.0
    color[12:20, 12:20] = [1.0, 0.0, 0.0]
    res = rasterize.forward_warp(
        jnp.asarray(depth), jnp.asarray(color), k, k, jnp.eye(4),
        (h, w), subsample=1, remove_edges=True, of_by_one=False)
    out_d = np.asarray(res.depth)
    assert np.allclose(out_d[14:18, 14:18], 2.0, atol=1e-2)
    assert (np.asarray(res.color)[14:18, 14:18, 0] > 0.9).all()


def test_edge_mask_marks_depth_discontinuity():
    h, w = 32, 32
    k, depth, _ = _scene(h, w, depth_bg=10.0)
    depth[:, 16:] = 2.0  # vertical depth cliff
    pts = geo.unproject_depth(jnp.asarray(depth), k)
    edge = np.asarray(rasterize.cell_edge_mask(pts))
    # cells spanning the cliff (last row's cells are degenerate/clamped)
    assert edge[:-1, 15].all()
    assert not edge[:, 5].any() and not edge[:, 25].any()


def test_remove_edges_creates_holes_for_infill():
    h, w = 32, 32
    k, depth, color = _scene(h, w, depth_bg=10.0)
    depth[:, 16:] = 2.0
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = -0.3
    res = rasterize.forward_warp(
        jnp.asarray(depth), jnp.asarray(color), k, k, jnp.asarray(t),
        (h, w), subsample=2, remove_edges=True, of_by_one=False)
    mask = np.asarray(res.mask)
    assert not mask.all()  # disocclusion holes exist
    # Points shift -x (camera moves +x): the foreground (2 m) shifts ~4 px,
    # the background (10 m) ~1 px, so background is revealed on the right
    # flank of the frame where the foreground slab slid away.
    hole_cols = np.where(~mask[h // 2])[0]
    assert hole_cols.size > 0 and (hole_cols >= 20).any()


def test_splat_points_zbuffer():
    h, w = 16, 16
    k = geo.camera_matrix_from_fov(w, h, xfov_deg=60.0)
    # Two points projecting to the same pixel: nearer one must win.
    pts = np.array([[0.0, 0.0, 5.0], [0.0, 0.0, 2.0]], np.float32)
    pay = np.array([[1.0], [2.0]], np.float32)
    img, dep, mask = rasterize.splat_points(
        jnp.asarray(pts), jnp.asarray(pay), k, (h, w))
    assert np.isclose(float(dep[8, 8]), 2.0, atol=1e-5)
    assert np.isclose(float(img[8, 8, 0]), 2.0)
    assert mask[8, 8] and np.asarray(mask).sum() == 1


def test_plane_sweep_identity_reproduces_input():
    k, depth, color = _scene()
    res = rasterize.plane_sweep_warp(
        jnp.asarray(depth), jnp.asarray(color), k, k, jnp.eye(4),
        depth.shape, num_planes=64, remove_edges=False, of_by_one=False)
    mask = np.asarray(res.mask)
    assert mask.mean() > 0.99
    got = np.asarray(res.color)
    assert np.abs(got[mask] - color[mask]).max() < 0.02
    d = np.asarray(res.depth)
    assert np.abs(d[mask] - depth[mask]).max() < 0.2


def test_plane_sweep_matches_forward_warp_on_translation():
    h, w = 48, 64
    k, depth, color = _scene(h, w, depth_bg=5.0)
    depth[10:30, 20:40] = 2.5
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = -0.2
    ps = rasterize.plane_sweep_warp(
        jnp.asarray(depth), jnp.asarray(color), k, k, jnp.asarray(t),
        (h, w), num_planes=96, remove_edges=True, of_by_one=False)
    fw = rasterize.forward_warp(
        jnp.asarray(depth), jnp.asarray(color), k, k, jnp.asarray(t),
        (h, w), subsample=2, remove_edges=True, of_by_one=False)
    mp = np.asarray(ps.mask)
    mf = np.asarray(fw.mask)
    both = mp & mf
    # coverage agrees except near edges; depths agree where both landed
    assert (mp == mf).mean() > 0.9
    dd = np.abs(np.asarray(ps.depth)[both] - np.asarray(fw.depth)[both])
    assert np.median(dd) < 0.05
    # occlusion ordering: foreground square depth preserved
    assert abs(np.median(np.asarray(ps.depth)[15:25, 15:35]) - 2.5) < 0.1


def test_plane_sweep_reveals_holes():
    h, w = 32, 32
    k, depth, color = _scene(h, w, depth_bg=10.0)
    depth[:, 16:] = 2.0
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = -0.3
    res = rasterize.plane_sweep_warp(
        jnp.asarray(depth), jnp.asarray(color), k, k, jnp.asarray(t),
        (h, w), num_planes=96, remove_edges=True, of_by_one=False)
    mask = np.asarray(res.mask)
    assert not mask.all()
    hole_cols = np.where(~mask[h // 2])[0]
    assert hole_cols.size > 0 and (hole_cols >= 20).any()


def test_pixel_id_warp_and_remap():
    """warp_pixel_ids + remap_ids_to_img: an identity warp's ids map every
    output pixel back to its own source color; a chained remap follows
    two passes (reference depth_map_tools.py:487-539 semantics)."""
    h, w = 12, 16
    k = geo.camera_matrix_from_fov(w, h, xfov_deg=60.0)
    depth = jnp.full((h, w), 5.0)
    rgb = jnp.arange(h * w * 3, dtype=jnp.uint8).reshape(h, w, 3)

    ids, dep = rasterize.warp_pixel_ids(depth, k, k, jnp.eye(4), (h, w),
                                        of_by_one=False)
    ids_np = np.asarray(ids)
    assert (ids_np >= 0).mean() > 0.95  # identity warp: all land

    out = np.asarray(rasterize.remap_ids_to_img(rgb, [ids]))
    land = ids_np >= 0
    assert (out[land] == np.asarray(rgb)[land]).all()

    # two-pass chain: second pass ids index into the first pass's image
    ids2, _ = rasterize.warp_pixel_ids(depth, k, k, jnp.eye(4), (h, w),
                                       of_by_one=False)
    out2 = np.asarray(rasterize.remap_ids_to_img(rgb, [ids, ids2]))
    assert (out2[land] == np.asarray(rgb)[land]).all()

    # invalid ids produce the invalid color
    bad = jnp.full((h, w), -1, jnp.int32)
    out3 = np.asarray(rasterize.remap_ids_to_img(rgb, [bad],
                                                 invalid_color=(9, 9, 9)))
    assert (out3 == 9).all()
