"""Frustum math, disparity steepness, focal estimation, voxel
downsampling, drift correction, scene scheduler."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import drift
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import voxel
from metric_depth_video_toolbox_tpu.parallel import scheduler


def test_frustum_contains_visible_points():
    k = geo.camera_matrix_from_fov(64, 48, xfov_deg=60.0)
    planes = geo.frustum_planes(k, 64, 48, 0.5, 50.0)
    inside = jnp.asarray([[0.0, 0.0, 5.0], [0.1, 0.1, 1.0]])
    outside = jnp.asarray([[0.0, 0.0, 0.1],     # nearer than near plane
                           [0.0, 0.0, 100.0],   # beyond far
                           [100.0, 0.0, 5.0]])  # far off-axis
    assert np.asarray(geo.points_in_frustum(inside, planes)).all()
    assert not np.asarray(geo.points_in_frustum(outside, planes)).any()


def test_frustums_intersect():
    k = geo.camera_matrix_from_fov(64, 48, xfov_deg=60.0)
    pa = geo.frustum_planes(k, 64, 48, 0.5, 20.0)
    ca = geo.frustum_corners(k, 64, 48, 0.5, 20.0)
    far_cam = jnp.eye(4).at[0, 3].set(100.0)  # far to the side
    pb = geo.frustum_planes(k, 64, 48, 0.5, 20.0, cam_to_world=far_cam)
    cb = geo.frustum_corners(k, 64, 48, 0.5, 20.0, cam_to_world=far_cam)
    assert bool(geo.frustums_intersect(pa, ca, pa, ca))
    assert not bool(geo.frustums_intersect(pa, ca, pb, cb))


def test_disparity_steepness_mask():
    k = geo.camera_matrix_from_fov(64, 48, xfov_deg=60.0)
    depth = np.full((48, 64), 10.0, np.float32)
    depth[:, 32:] = 2.0
    m = np.asarray(geo.disparity_steepness_mask(jnp.asarray(depth), k,
                                            threshold_px=1.0))
    assert m[:, 31].all()
    assert not m[:, 10].any() and not m[:, 50].any()


def test_estimate_focal_from_points():
    h, w = 48, 64
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=55.0))
    depth = jnp.asarray(np.random.default_rng(0).uniform(
        2, 10, (h, w)).astype(np.float32))
    pts = geo.unproject_depth(depth, jnp.asarray(k))
    fx, fy = geo.estimate_focal_from_points(pts, h, w)
    assert abs(float(fx) - k[0, 0]) / k[0, 0] < 0.02
    assert abs(float(fy) - k[1, 1]) / k[1, 1] < 0.02


def test_voxel_downsample_merges(rng):
    pts = np.array([[0, 0, 1], [0.001, 0, 1], [5, 5, 5]], np.float32)
    cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    out, oc = voxel.voxel_downsample(pts, cols, 0.01)
    assert out.shape[0] == 2
    merged = out[np.argmin(out[:, 0])]
    assert np.allclose(merged, [0.0005, 0, 1], atol=1e-4)


def test_perspective_aware_downsample_scales_with_depth(rng):
    # two pairs with the same spatial separation: the far pair merges,
    # the near pair survives
    pts = np.array([[0, 0, 1.0], [0.02, 0, 1.0],
                    [0, 0, 50.0], [0.02, 0, 50.0]], np.float32)
    out, _ = voxel.perspective_aware_downsample(pts, None, voxel_size=0.005)
    near = (out[:, 2] < 2).sum()
    far = (out[:, 2] > 10).sum()
    assert near == 2 and far == 1


def test_drift_correct_recovers_translation(rng):
    h, w = 64, 96
    base = rng.integers(0, 255, (h // 4, (w + 16) // 4, 3), np.uint8)
    tex = np.kron(base, np.ones((4, 4, 1), np.uint8)).astype(np.uint8)
    ref = tex[:h, :w]
    gen = tex[:h, 5:w + 5]  # generated frame drifted 5 px
    shifts, peak = drift.phase_correlation_grid(
        jnp.asarray(ref), jnp.asarray(gen), grid=2)
    s = np.asarray(shifts)
    assert np.allclose(s[..., 0], 5.0, atol=1.0)  # gen is +5 vs ref
    corrected = np.asarray(drift.drift_correct_frame(
        jnp.asarray(gen), jnp.asarray(ref), grid=2))
    err_before = np.abs(gen[8:-8, 8:-8].astype(int)
                        - ref[8:-8, 8:-8].astype(int)).mean()
    err_after = np.abs(corrected[8:-8, 8:-8].astype(int)
                       - ref[8:-8, 8:-8].astype(int)).mean()
    assert err_after < err_before * 0.3


def test_scheduler_threaded_overlaps_and_continues_on_error():
    done = []

    def fn(scene, gate):
        if scene == 2:
            raise RuntimeError("boom")
        with gate:
            done.append(scene)
        return scene * 10

    results = scheduler.run_scenes_threaded(fn, [1, 2, 3], workers=2)
    ok = {s: r for s, r in results if not isinstance(r, Exception)}
    bad = [s for s, r in results if isinstance(r, Exception)]
    assert ok == {1: 10, 3: 30}
    assert bad == [2]


def test_scheduler_shard_scenes():
    scenes = list(range(10))
    a = scheduler.shard_scenes(scenes, host_index=0, host_count=3)
    b = scheduler.shard_scenes(scenes, host_index=1, host_count=3)
    c = scheduler.shard_scenes(scenes, host_index=2, host_count=3)
    assert sorted(a + b + c) == scenes
    assert not (set(a) & set(b))
