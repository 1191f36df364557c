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
