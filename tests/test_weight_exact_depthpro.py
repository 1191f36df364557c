"""Weight-exactness for DepthPro against the REAL transformers
DepthProForDepthEstimation (random-init tiny config): multi-scale patch
split/merge, intermediate hooks, fusion pyramid, depth head, FOV head
(reference depthpro_video.py:154-159 reads predicted_depth +
focallength_px from exactly this model)."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from metric_depth_video_toolbox_tpu.models import (  # noqa: E402
    convert, depthpro, vit)


def _tiny_pair(use_fov):
    dino = transformers.Dinov2Config(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        image_size=32, patch_size=8)  # mlp_ratio default 4 (ours too)
    hf_cfg = transformers.DepthProConfig(
        patch_size=32,
        intermediate_hook_ids=[3, 1], intermediate_feature_dims=[16, 16],
        scaled_images_ratios=[0.25, 0.5, 1.0],
        scaled_images_overlap_ratios=[0.0, 0.5, 0.25],
        scaled_images_feature_dims=[16, 16, 16],
        fusion_hidden_size=16, use_fov_model=use_fov,
        image_model_config=dino, patch_model_config=dino,
        fov_model_config=dino)
    torch.manual_seed(0)
    tm = transformers.DepthProForDepthEstimation(hf_cfg).eval()

    cfg = dataclasses.replace(depthpro.DEPTHPRO_TINY, use_fov=use_fov)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert.convert_depthpro_hf(sd, cfg)
    return tm, cfg, params


@pytest.mark.parametrize("use_fov", [True, False])
def test_depthpro_forward_equivalence(use_fov):
    tm, cfg, params = _tiny_pair(use_fov)
    # 128px: min ratio 0.25 -> 32 = patch size; the 1.0 scale makes the
    # same 5x5=25-patch grid as production 1536px (35 patches total)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.5, (2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    depth, fov = depthpro.DepthProNet(cfg).apply(params, jnp.asarray(x))
    ref_d = ref.predicted_depth.numpy()
    err = np.max(np.abs(np.asarray(depth) - ref_d))
    scale = max(1.0, np.abs(ref_d).max())
    assert err < 3e-4 * scale, err
    if use_fov:
        ref_f = ref.field_of_view.numpy()
        assert np.max(np.abs(np.asarray(fov) - ref_f)) < 3e-4, (
            np.asarray(fov), ref_f)
    else:
        assert fov is None


def test_depthpro_patch_split_merge_roundtrip():
    """The split/merge pair must tile patch-major exactly like torch
    unfold + HF merge (interior-edge trimming)."""
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    pt = depthpro._split_patches(jnp.asarray(x), 32, 0.5)  # stride 16
    assert pt.shape == (2 * 9, 32, 32, 3)
    # patch-major: first two entries are batch 0/1 of the top-left patch
    np.testing.assert_array_equal(np.asarray(pt[0]), x[0, :32, :32])
    np.testing.assert_array_equal(np.asarray(pt[1]), x[1, :32, :32])
    merged = depthpro._merge_patches(pt, 2, 8)  # trim 8 interior px
    # per dim: 3 patches of 32 trim (8 | 8+8 | 8) -> 24+16+24 = 64
    assert merged.shape == (2, 64, 64, 3)
    # non-overlapping split (overlap 0) + zero padding = exact roundtrip
    pt0 = depthpro._split_patches(jnp.asarray(x), 32, 0.0)
    back = depthpro._merge_patches(pt0, 2, 0)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_depthpro_engine_end_to_end():
    """SingleFrameEngine(variant='depthpro') with a converted checkpoint
    runs the REAL DepthPro graph and reproduces the HF post-processing
    (canonical inverse depth * 2 tan(fov/2), inverted, clipped)."""
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    tm, cfg, params = _tiny_pair(True)
    eng = dstage.SingleFrameEngine(size="vitt", params=params,
                                   variant="depthpro", max_depth=50.0,
                                   data_parallel=False)
    assert eng._depthpro_cfg is not None and eng.estimates_fov
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (2, 128, 128, 3), np.uint8)
    d, fovs = eng.infer_video(frames, batch=2, return_fov=True)

    xn = (frames.astype(np.float32) / 255.0 - 0.5) / 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(xn.transpose(0, 3, 1, 2)))
    fov_ref = ref.field_of_view.numpy()
    inv = ref.predicted_depth.numpy() * (
        2.0 * np.tan(np.radians(fov_ref) / 2.0))[:, None, None]
    # the engine (like HF post_process) interpolates to the video size
    # before inverting (tiny model emits 2x resolution: 256 -> 128)
    import jax
    inv = np.asarray(jax.image.resize(inv, (2, 128, 128), "bilinear"))
    exp = np.minimum(1.0 / np.clip(inv, 1e-4, 1e4), 50.0)
    assert d.shape == (2, 128, 128)
    np.testing.assert_allclose(np.asarray(fovs), fov_ref, atol=3e-4)
    np.testing.assert_allclose(d, exp, rtol=2e-3, atol=2e-3)


def test_depthpro_working_size():
    assert depthpro.working_size(depthpro.DEPTHPRO_L) == 1536
    assert depthpro.working_size(depthpro.DEPTHPRO_TINY) == 128
