"""Numerical weight-exactness: converted torch checkpoints must produce
the SAME OUTPUT through our Flax graphs as through the original torch
graphs — not just a matching param tree.

Ground truth here is the real HuggingFace torch implementation
(transformers.models.depth_anything / prompt_depth_anything), randomly
initialized at tiny dims, run on CPU in float32. The reference toolbox
downloads torch checkpoints for every engine (reference
download_weights.py:80-133); these tests prove our op order (attention,
LayerScale placement, align_corners semantics, fusion upsample order,
sigmoid-metric head) is drop-in weight-exact, so real checkpoints load
the day they're available.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _precise_matmul():
    """XLA:CPU default matmul/conv precision is bf16-class (~1e-2 abs
    error vs a float64 oracle, measured); weight-exactness comparisons
    need real float32 accumulation."""
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import depth_anything as da
from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _randomize(module, seed=0):
    """Fill every param/buffer of a torch module with small random
    values so the comparison exercises every weight."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    new = {}
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            new[k] = torch.randn(v.shape, generator=g) * 0.05
        else:
            new[k] = v
    module.load_state_dict(new)
    module.eval()
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _hf_da2(depth_estimation_type="relative", max_depth=None):
    from transformers import DepthAnythingConfig, Dinov2Config
    from transformers import DepthAnythingForDepthEstimation
    backbone = Dinov2Config(
        image_size=56, patch_size=14, num_hidden_layers=4, hidden_size=32,
        num_attention_heads=2, intermediate_size=128,
        out_indices=[1, 2, 3, 4], apply_layernorm=True,
        reshape_hidden_states=False)
    cfg = DepthAnythingConfig(
        backbone_config=backbone, reassemble_hidden_size=32,
        fusion_hidden_size=16,
        neck_hidden_sizes=[8, 16, 24, 32],
        reassemble_factors=[4, 2, 1, 0.5], patch_size=14,
        head_hidden_size=32,
        depth_estimation_type=depth_estimation_type,
        max_depth=max_depth if max_depth else 1)
    return DepthAnythingForDepthEstimation(cfg)


def _our_da2_cfg(metric, max_depth, head_act):
    vit_cfg = dataclasses.replace(
        vit_mod.VIT_TINY, embed_dim=32, depth=4, num_heads=2,
        out_indices=(0, 1, 2, 3), dtype="float32", attention_impl="xla")
    dpt_cfg = dpt_mod.DPTConfig(
        features=16, out_channels=(8, 16, 24, 32), dtype="float32",
        fast_head=False, torch_resize=True, head_act=head_act)
    return da.DepthAnythingConfig(vit=vit_cfg, dpt=dpt_cfg, metric=metric,
                                  max_depth=max_depth)


@pytest.mark.parametrize("kind", ["relative", "metric"])
def test_da2_forward_equivalence_vs_hf_torch(kind):
    """Our ViT+DPT with HF-converted weights == HF torch forward."""
    tmodel = _hf_da2(kind, max_depth=20.0 if kind == "metric" else None)
    sd = _randomize(tmodel, seed=3)

    rng = np.random.default_rng(7)
    img = rng.uniform(0.1, 0.9, size=(1, 56, 56, 3)).astype(np.float32)
    timg = (img - IMAGENET_MEAN) / IMAGENET_STD
    timg = torch.from_numpy(timg.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        want = tmodel(timg).predicted_depth.numpy()

    cfg = _our_da2_cfg(metric=kind == "metric", max_depth=20.0,
                       head_act="sigmoid" if kind == "metric" else "relu")
    params = convert.convert_da2_hf(sd, cfg.vit)
    got = np.asarray(da.DepthAnything(cfg).apply(params, jnp.asarray(img)))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_da2_original_layout_matches_hf_layout():
    """The original-repo-layout converter (fused qkv, depth_head.* keys)
    lands on the same params as the HF converter given equivalent
    weights — proving both checkpoint families load identically."""
    tmodel = _hf_da2("relative")
    sd = _randomize(tmodel, seed=11)

    # re-express the HF state dict in the original DA-V2 layout
    orig = {}
    orig["pretrained.cls_token"] = sd["backbone.embeddings.cls_token"]
    orig["pretrained.pos_embed"] = \
        sd["backbone.embeddings.position_embeddings"]
    orig["pretrained.patch_embed.proj.weight"] = \
        sd["backbone.embeddings.patch_embeddings.projection.weight"]
    orig["pretrained.patch_embed.proj.bias"] = \
        sd["backbone.embeddings.patch_embeddings.projection.bias"]
    orig["pretrained.norm.weight"] = sd["backbone.layernorm.weight"]
    orig["pretrained.norm.bias"] = sd["backbone.layernorm.bias"]
    for i in range(4):
        b = f"backbone.encoder.layer.{i}"
        o = f"pretrained.blocks.{i}"
        orig[f"{o}.norm1.weight"] = sd[f"{b}.norm1.weight"]
        orig[f"{o}.norm1.bias"] = sd[f"{b}.norm1.bias"]
        orig[f"{o}.attn.qkv.weight"] = np.concatenate(
            [sd[f"{b}.attention.attention.{n}.weight"]
             for n in ("query", "key", "value")], axis=0)
        orig[f"{o}.attn.qkv.bias"] = np.concatenate(
            [sd[f"{b}.attention.attention.{n}.bias"]
             for n in ("query", "key", "value")], axis=0)
        orig[f"{o}.attn.proj.weight"] = \
            sd[f"{b}.attention.output.dense.weight"]
        orig[f"{o}.attn.proj.bias"] = sd[f"{b}.attention.output.dense.bias"]
        orig[f"{o}.ls1.gamma"] = sd[f"{b}.layer_scale1.lambda1"]
        orig[f"{o}.norm2.weight"] = sd[f"{b}.norm2.weight"]
        orig[f"{o}.norm2.bias"] = sd[f"{b}.norm2.bias"]
        orig[f"{o}.mlp.fc1.weight"] = sd[f"{b}.mlp.fc1.weight"]
        orig[f"{o}.mlp.fc1.bias"] = sd[f"{b}.mlp.fc1.bias"]
        orig[f"{o}.mlp.fc2.weight"] = sd[f"{b}.mlp.fc2.weight"]
        orig[f"{o}.mlp.fc2.bias"] = sd[f"{b}.mlp.fc2.bias"]
        orig[f"{o}.ls2.gamma"] = sd[f"{b}.layer_scale2.lambda1"]
    for i in range(4):
        orig[f"depth_head.projects.{i}.weight"] = \
            sd[f"neck.reassemble_stage.layers.{i}.projection.weight"]
        orig[f"depth_head.projects.{i}.bias"] = \
            sd[f"neck.reassemble_stage.layers.{i}.projection.bias"]
        orig[f"depth_head.scratch.layer{i + 1}_rn.weight"] = \
            sd[f"neck.convs.{i}.weight"]
    for i in (0, 1, 3):
        orig[f"depth_head.resize_layers.{i}.weight"] = \
            sd[f"neck.reassemble_stage.layers.{i}.resize.weight"]
        orig[f"depth_head.resize_layers.{i}.bias"] = \
            sd[f"neck.reassemble_stage.layers.{i}.resize.bias"]
    # HF fusion layers[0] = coarsest = original refinenet4
    for hf_i, rn in ((0, 4), (1, 3), (2, 2), (3, 1)):
        fl = f"neck.fusion_stage.layers.{hf_i}"
        base = f"depth_head.scratch.refinenet{rn}"
        for unit, hf_unit in ((1, "residual_layer1"), (2, "residual_layer2")):
            for cv in (1, 2):
                orig[f"{base}.resConfUnit{unit}.conv{cv}.weight"] = \
                    sd[f"{fl}.{hf_unit}.convolution{cv}.weight"]
                orig[f"{base}.resConfUnit{unit}.conv{cv}.bias"] = \
                    sd[f"{fl}.{hf_unit}.convolution{cv}.bias"]
        orig[f"{base}.out_conv.weight"] = sd[f"{fl}.projection.weight"]
        orig[f"{base}.out_conv.bias"] = sd[f"{fl}.projection.bias"]
    orig["depth_head.scratch.output_conv1.weight"] = sd["head.conv1.weight"]
    orig["depth_head.scratch.output_conv1.bias"] = sd["head.conv1.bias"]
    orig["depth_head.scratch.output_conv2.0.weight"] = sd["head.conv2.weight"]
    orig["depth_head.scratch.output_conv2.0.bias"] = sd["head.conv2.bias"]
    orig["depth_head.scratch.output_conv2.2.weight"] = sd["head.conv3.weight"]
    orig["depth_head.scratch.output_conv2.2.bias"] = sd["head.conv3.bias"]

    cfg = _our_da2_cfg(metric=False, max_depth=20.0, head_act="relu")
    p_hf = convert.convert_da2_hf(sd, cfg.vit)
    p_orig = convert.convert_da2(orig, cfg.vit)
    jax.tree.map(np.testing.assert_allclose, p_hf, p_orig)


def test_promptda_forward_equivalence_vs_hf_torch():
    """Our PromptDA (prompt branches in every fusion level, sigmoid
    head, min/max prompt normalization) == HF torch forward."""
    from transformers import Dinov2Config, PromptDepthAnythingConfig
    from transformers import PromptDepthAnythingForDepthEstimation
    from metric_depth_video_toolbox_tpu.models import promptda

    backbone = Dinov2Config(
        image_size=56, patch_size=14, num_hidden_layers=4, hidden_size=32,
        num_attention_heads=2, intermediate_size=128,
        out_indices=[1, 2, 3, 4], apply_layernorm=True,
        reshape_hidden_states=False)
    cfg = PromptDepthAnythingConfig(
        backbone_config=backbone, reassemble_hidden_size=32,
        fusion_hidden_size=16, neck_hidden_sizes=[8, 16, 24, 32],
        reassemble_factors=[4, 2, 1, 0.5], patch_size=14,
        head_hidden_size=32, depth_estimation_type="metric", max_depth=1)
    tmodel = PromptDepthAnythingForDepthEstimation(cfg)
    sd = _randomize(tmodel, seed=21)

    rng = np.random.default_rng(13)
    img = rng.uniform(0.1, 0.9, size=(1, 56, 56, 3)).astype(np.float32)
    prompt = rng.uniform(0.5, 8.0, size=(1, 12, 16)).astype(np.float32)
    timg = (img - IMAGENET_MEAN) / IMAGENET_STD
    timg = torch.from_numpy(timg.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        want = tmodel(timg, prompt_depth=torch.from_numpy(
            prompt[:, None]).clone()).predicted_depth.numpy()

    vit_cfg = dataclasses.replace(
        vit_mod.VIT_TINY, embed_dim=32, depth=4, num_heads=2,
        out_indices=(0, 1, 2, 3), dtype="float32", attention_impl="xla")
    dpt_cfg = dpt_mod.DPTConfig(
        features=16, out_channels=(8, 16, 24, 32), dtype="float32",
        fast_head=False, torch_resize=True, head_act="sigmoid")
    ours = promptda.PromptDA(promptda.PromptDAConfig(vit=vit_cfg,
                                                     dpt=dpt_cfg))
    params = convert.convert_promptda_hf(sd, vit_cfg)
    got = np.asarray(ours.apply(params, jnp.asarray(img),
                                jnp.asarray(prompt)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-5 * float(np.abs(want).max()))


def test_pos_embed_interpolation_matches_torch_bicubic():
    rng = np.random.default_rng(5)
    d = 8
    pos = rng.normal(size=(1, 4 * 4 + 1, d)).astype(np.float32)
    got = convert.interpolate_pos_embed(pos, (4, 4), (7, 5))
    grid = torch.from_numpy(pos[:, 1:].reshape(1, 4, 4, d)
                            .transpose(0, 3, 1, 2).copy())
    want = torch.nn.functional.interpolate(
        grid, size=(7, 5), mode="bicubic", align_corners=False)
    want = want.permute(0, 2, 3, 1).reshape(1, 35, d).numpy()
    np.testing.assert_allclose(got[:, 1:], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[:, :1], pos[:, :1])


def test_align_corners_resize_matches_torch():
    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    got = np.asarray(dpt_mod.resize_align_corners(jnp.asarray(x), (11, 4)))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    want = torch.nn.functional.interpolate(
        t, size=(11, 4), mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
