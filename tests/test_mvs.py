"""MVS plane-sweep engine: sweep geometry correctness, model shapes,
and the pose-conditioned pipeline engine (reference video_mvsa.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import mvs
from metric_depth_video_toolbox_tpu.ops import geometry as geo


def _k(w, h, f=40.0):
    return jnp.asarray([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]],
                       jnp.float32)


def test_sweep_identity_pose_maps_to_self():
    """With src == ref camera, every hypothesis maps each pixel to
    itself (the homography is the identity for any plane depth)."""
    h, w = 12, 16
    k = _k(w, h)
    inv_k = jnp.linalg.inv(k)
    poses = jnp.eye(4)[None]
    inv_depths = jnp.asarray([1.0 / 50, 1.0 / 2.0])
    xy, in_front = mvs.sweep_coords(k, inv_k, poses, inv_depths, h, w)
    assert bool(in_front.all())
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    expect = np.stack([gx, gy], -1).astype(np.float32)
    assert np.abs(np.asarray(xy) - expect[None, None]).max() < 1e-3


def test_sweep_translated_camera_shifts_by_disparity():
    """A src camera translated by baseline b along +x sees the point at
    depth d shifted by the classic disparity f*b/d."""
    h, w = 12, 16
    f, b, d = 40.0, 0.5, 4.0
    k = _k(w, h, f)
    # ref-cam -> src-cam: src is at +x in ref coords => coords shift -x
    pose = jnp.asarray(np.block(
        [[np.eye(3), np.array([[-b], [0], [0]])], [np.zeros((1, 3)), 1]]
    ).astype(np.float32))[None]
    xy, _ = mvs.sweep_coords(k, jnp.linalg.inv(k), pose,
                             jnp.asarray([1.0 / d]), h, w)
    gx, _ = np.meshgrid(np.arange(w), np.arange(h))
    disp = np.asarray(xy)[0, 0, ..., 0] - gx
    assert np.abs(disp + f * b / d).max() < 1e-3


def test_mvsnet_shapes_and_finiteness(rng):
    cfg = mvs.MVS_TINY
    model = mvs.MVSNet(cfg)
    hh, ww, v = 24, 32, 2
    ref = jnp.asarray(rng.uniform(0, 1, (hh, ww, 3)).astype(np.float32))
    src = jnp.asarray(rng.uniform(0, 1, (v, hh, ww, 3)).astype(np.float32))
    k_feat = _k(ww // 4, hh // 4, f=10.0)
    poses = jnp.tile(jnp.eye(4), (v, 1, 1))
    valid = jnp.asarray([1.0, 0.0])
    params = model.init(jax.random.PRNGKey(0), ref, src, k_feat, poses,
                        valid)
    out = model.apply(params, ref, src, k_feat, poses, valid)
    assert out["depth"].shape == (hh, ww)
    assert out["depth_cv"].shape == (hh, ww)
    assert np.isfinite(np.asarray(out["depth"])).all()
    d = np.asarray(out["depth"])
    assert (d >= cfg.min_depth - 1e-3).all() and (d <= cfg.max_depth).all()


def test_mvs_engine_end_to_end(tmp_path, rng):
    from metric_depth_video_toolbox_tpu.io import sidecar
    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage

    frames = rng.integers(0, 255, (5, 24, 32, 3)).astype(np.uint8)
    clip = str(tmp_path / "c.mkv")
    vio.save_rgb_video(frames, clip, 24)
    transforms = []
    for i in range(5):
        t = np.eye(4, dtype=np.float32)
        t[0, 3] = 0.02 * i  # slow dolly
        transforms.append(t)
    tf = str(tmp_path / "c_transformations.json")
    sidecar.save_transformations(tf, transforms)

    outs = dstage.run_batch("mvsa", clip, max_depth=20.0, xfov=60.0,
                            transformation_file=tf,
                            size="tiny", window=3, resize_w=32, batch=2)
    assert vio.is_valid_video(outs[0])
    r = vio.DepthVideoReader(outs[0], 20.0)
    d = r.read_depth_batch(5)
    r.close()
    assert d.shape == (5, 24, 32)
    assert np.isfinite(d).all() and (d >= 0).all()


def test_window_indices_edges():
    eng = object.__new__(__import__(
        "metric_depth_video_toolbox_tpu.pipeline.depth",
        fromlist=["depth"]).MVSEngine)
    eng.half_w = 2
    idx, val = eng._window_indices(0, 10)
    assert len(idx) == 4 and len(val) == 4
    assert all(0 <= j < 10 for j in idx)
    assert val.count(1.0) == 2  # only the two right-side neighbors real
    idx, val = eng._window_indices(5, 10)
    assert idx == [3, 4, 6, 7] and val == [1.0] * 4
