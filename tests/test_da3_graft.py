import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metric_depth_video_toolbox_tpu.models import da3 as da3_mod


def test_da3_backbone_graft(tmp_path):
    eng_a = da3_mod.DA3Engine(cfg=da3_mod.DA3_TINY, images_per_batch=4,
                              num_ref_frames=0, overlap=2, resolution=56,
                              rng_seed=0)
    frames = np.random.default_rng(0).integers(
        0, 255, (4, 56, 56, 3), np.uint8)
    eng_a.infer_video(frames)  # forces init
    src_bb = jax.tree.map(lambda x: np.asarray(x) + 0.25,
                          eng_a._params["params"]["backbone"])

    eng_b = da3_mod.DA3Engine(cfg=da3_mod.DA3_TINY, images_per_batch=4,
                              num_ref_frames=0, overlap=2, resolution=56,
                              rng_seed=1, backbone={"backbone": src_bb})
    assert eng_b._pending_backbone is not None
    d, c2w, fov = eng_b.infer_video(frames)  # init + graft
    got = eng_b._params["params"]["backbone"]
    for ka, kb in zip(jax.tree.leaves(src_bb), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(ka), np.asarray(kb))
    assert np.isfinite(d).all() and d.shape == (4, 56, 56)


def test_da3_backbone_graft_rejects_wrong_width():
    import dataclasses
    from metric_depth_video_toolbox_tpu.models import vit as vit_mod
    eng = da3_mod.DA3Engine(cfg=da3_mod.DA3_TINY, images_per_batch=2,
                            num_ref_frames=0, overlap=1, resolution=56)
    frames = np.zeros((2, 56, 56, 3), np.uint8)
    eng.infer_video(frames)
    bad = jax.tree.map(lambda x: np.asarray(x),
                       eng._params["params"]["backbone"])
    bad = dict(bad)
    bad["cls_token"] = np.zeros((1, 1, 999), np.float32)
    with pytest.raises(ValueError, match="backbone shape mismatch"):
        eng.load_backbone({"backbone": bad})


def test_da3_known_fov_conditioning():
    """--xfov/--xfov_file conditioning (reference video_da3.py:87-112):
    patch-center rays embed into the tokens, the output xfovs sidecar
    carries the given values verbatim, and the conditioned forward
    differs from the unconditioned one (the rays actually flow in)."""
    frames = np.random.default_rng(1).integers(
        0, 255, (4, 56, 56, 3), np.uint8)
    base = dict(cfg=da3_mod.DA3_TINY, images_per_batch=4,
                num_ref_frames=0, overlap=2, resolution=56, rng_seed=0)
    fovs = [48.0, 52.0, 55.0, 60.0]
    eng_c = da3_mod.DA3Engine(xfovs=fovs, **base)
    d_c, _, fov_c = eng_c.infer_video(frames)
    assert np.allclose(fov_c, fovs)
    assert np.isfinite(d_c).all()

    eng_u = da3_mod.DA3Engine(**base)
    d_u, _, fov_u = eng_u.infer_video(frames)
    # model-estimated fovs are not the given list
    assert not np.allclose(fov_u, fovs)

    # scalar --xfov variant
    eng_s = da3_mod.DA3Engine(xfov=50.0, **base)
    _, _, fov_s = eng_s.infer_video(frames)
    assert np.allclose(fov_s, 50.0)
