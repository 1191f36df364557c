"""Model smoke tests on tiny configs: shapes, dtype discipline, windowed
video-depth stitching."""

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import depth_anything as da
from metric_depth_video_toolbox_tpu.models import video_depth as vd
from metric_depth_video_toolbox_tpu.models import vit as vit_mod


def test_vit_feature_shapes():
    cfg = vit_mod.VIT_TINY
    model = vit_mod.ViT(cfg)
    x = jnp.zeros((2, 28, 42, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats, cls = model.apply(params, x)
    assert len(feats) == 4
    assert feats[0].shape == (2, 2, 3, cfg.embed_dim)
    assert cls.shape == (2, cfg.embed_dim)


def test_depth_anything_forward_metric():
    cfg = da.TINY
    model = da.DepthAnything(cfg)
    x = jnp.zeros((1, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    d = model.apply(params, x)
    assert d.shape == (1, 28, 28)
    assert d.dtype == jnp.float32
    dn = np.asarray(d)
    assert (dn >= 0).all() and (dn <= cfg.max_depth).all()


def test_infer_depth_resizes():
    cfg = da.TINY
    model = da.DepthAnything(cfg)
    x0 = jnp.zeros((1, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), x0)
    imgs = jnp.zeros((2, 33, 47, 3), jnp.uint8)
    out = da.infer_depth(lambda p, v: model.apply(p, v), params, imgs,
                         (33, 47), (28, 28))
    assert out.shape == (2, 33, 47)


def test_working_resolution_patch_multiple():
    h, w = da.working_resolution(1080, 1920, 518, 14)
    assert h % 14 == 0 and w % 14 == 0
    assert abs(h / w - 1080 / 1920) < 0.05


def test_video_depth_forward_and_stitch():
    cfg = vd.TINY
    model = vd.VideoDepthAnything(cfg)
    frames = jnp.zeros((4, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), frames)
    d = model.apply(params, frames)
    assert d.shape == (4, 28, 28)

    # stitching: second window is an affine-disparity version of the first
    rng = np.random.default_rng(0)
    a = rng.uniform(0.2, 1.0, (6, 8, 8)).astype(np.float32)
    b = np.concatenate([a[-2:], rng.uniform(0.2, 1.0, (4, 8, 8))
                        .astype(np.float32)], axis=0)
    b_scaled = b * 0.5 + 0.1  # window 2 came back mis-scaled
    full = vd.stitch_windows([a, b_scaled], window=6, overlap=2, total=10)
    assert full.shape == (10, 8, 8)
    # overlap frames must agree with window 1 after alignment
    assert np.allclose(full[4:6], a[4:6], atol=1e-4)


def test_scale_shift_align_to_metric():
    rng = np.random.default_rng(0)
    metric = rng.uniform(1.0, 30.0, (4, 16, 16)).astype(np.float32)
    rel = 1.0 / metric * 3.0 + 0.25  # disparity with scale+shift
    aligned, (s, t) = da.scale_shift_align_to_metric(
        jnp.asarray(rel), jnp.asarray(metric))
    assert np.allclose(np.asarray(aligned), metric, rtol=1e-3, atol=1e-2)
