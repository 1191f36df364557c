"""Weight-exactness for the CLIP vision tower against the REAL
transformers CLIPVisionModelWithProjection (random-init tiny config) —
the strongest form of converter verification available in-environment:
the reference torch graph itself, not a hand mirror."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from metric_depth_video_toolbox_tpu.models import clip, convert  # noqa: E402


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_vision_forward_equivalence(act):
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=16, hidden_act=act)
    torch.manual_seed(0)
    tm = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    cfg = clip.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
        image_size=32, patch_size=8, projection_dim=16, hidden_act=act)
    params = convert.convert_clip_vision(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).image_embeds.numpy()
    out = np.asarray(clip.CLIPVisionTower(cfg).apply(
        params, jnp.asarray(x)))
    assert np.max(np.abs(out - ref)) < 2e-5, np.max(np.abs(out - ref))


def test_clip_preprocess_shapes():
    x = np.random.default_rng(1).uniform(0, 1, (3, 40, 60, 3)).astype(
        np.float32)
    out = np.asarray(clip.preprocess(jnp.asarray(x), 32))
    assert out.shape == (3, 32, 32, 3)
    # normalization applied (mean-shifted away from [0,1])
    assert out.min() < -0.5
