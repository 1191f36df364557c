"""m2svid (sgm/Hi3D) checkpoint conversion: weight-exactness.

The reference loads ``ckpts/m2svid_weights.pt`` into an sgm
VideoUNet (m2svid_infill.py:485-488). That graph is tensor-for-tensor
the SVD spatio-temporal UNet in ldm naming. This test builds the torch
SVD mirror (the one test_weight_exact_svd.py already proves against
models.svd), re-keys its state dict into the sgm layout — the rename
table below is written in the diffusers->sgm direction, independent of
the converter's sgm->diffusers walk — wraps it under
``model.diffusion_model.`` like the real checkpoint, and proves
``convert.convert_m2svid_sgm`` reproduces the torch forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from metric_depth_video_toolbox_tpu.models import convert, svd  # noqa: E402

from test_weight_exact_svd import TSVDUNet, _sd  # noqa: E402


def _res_to_sgm(rest):
    """diffusers spatio-temporal resblock leaf -> sgm VideoResBlock leaf
    (ldm ResBlock naming: in_layers/emb_layers/out_layers Sequentials,
    skip_connection, and the temporal half under .time_stack)."""
    leaf = {"norm1": "in_layers.0", "conv1": "in_layers.2",
            "time_emb_proj": "emb_layers.1", "norm2": "out_layers.0",
            "conv2": "out_layers.3", "conv_shortcut": "skip_connection"}
    if rest.startswith("spatial_res_block."):
        name, tail = (rest[len("spatial_res_block."):].split(".", 1) + [""])[:2]
        return leaf[name] + ("." + tail if tail else "")
    if rest.startswith("temporal_res_block."):
        name, tail = (rest[len("temporal_res_block."):].split(".", 1) + [""])[:2]
        return "time_stack." + leaf[name] + ("." + tail if tail else "")
    assert rest.startswith("time_mixer."), rest
    return rest


def _attn_to_sgm(rest):
    """diffusers SpatialVideoTransformer leaf -> sgm naming."""
    if rest.startswith("temporal_transformer_blocks."):
        return "time_stack." + rest[len("temporal_transformer_blocks."):]
    if rest.startswith("time_pos_embed.linear_1."):
        return "time_pos_embed.0." + rest.rsplit(".", 1)[1]
    if rest.startswith("time_pos_embed.linear_2."):
        return "time_pos_embed.2." + rest.rsplit(".", 1)[1]
    return rest  # norm, proj_in/out, transformer_blocks.*, time_mixer


def _diffusers_key_to_sgm(key):
    """Full-key rename for the SVD_TINY topology:
    block_out_channels=(32, 64), layers_per_block=1, attention at the
    finest level only. ldm input/output block indexing written out
    literally (the sgm ground truth this test pins)."""
    top = {"time_embedding.linear_1": "time_embed.0",
           "time_embedding.linear_2": "time_embed.2",
           "add_embedding.linear_1": "label_emb.0.0",
           "add_embedding.linear_2": "label_emb.0.2",
           "conv_in": "input_blocks.0.0",
           "conv_norm_out": "out.0",
           "conv_out": "out.2"}
    res = {"down_blocks.0.resnets.0": "input_blocks.1.0",
           "down_blocks.1.resnets.0": "input_blocks.3.0",
           "mid_block.resnets.0": "middle_block.0",
           "mid_block.resnets.1": "middle_block.2",
           "up_blocks.0.resnets.0": "output_blocks.0.0",
           "up_blocks.0.resnets.1": "output_blocks.1.0",
           "up_blocks.1.resnets.0": "output_blocks.2.0",
           "up_blocks.1.resnets.1": "output_blocks.3.0"}
    attn = {"down_blocks.0.attentions.0": "input_blocks.1.1",
            "mid_block.attentions.0": "middle_block.1",
            "up_blocks.1.attentions.0": "output_blocks.2.1",
            "up_blocks.1.attentions.1": "output_blocks.3.1"}
    other = {"down_blocks.0.downsamplers.0.conv": "input_blocks.2.0.op",
             # level-1 up block has no attention -> Upsample is module 1
             "up_blocks.0.upsamplers.0.conv": "output_blocks.1.1.conv"}
    for pre, dst in top.items():
        if key.startswith(pre + "."):
            return dst + key[len(pre):]
    for pre, dst in other.items():
        if key.startswith(pre + "."):
            return dst + key[len(pre):]
    for pre, dst in res.items():
        if key.startswith(pre + "."):
            return f"{dst}.{_res_to_sgm(key[len(pre) + 1:])}"
    for pre, dst in attn.items():
        if key.startswith(pre + "."):
            return f"{dst}.{_attn_to_sgm(key[len(pre) + 1:])}"
    raise AssertionError(f"unmapped diffusers key: {key}")


def test_m2svid_sgm_checkpoint_forward_equivalence():
    cfg = svd.SVD_TINY
    torch.manual_seed(3)
    tm = TSVDUNet(cfg).eval()

    sgm_sd = {"model.diffusion_model." + _diffusers_key_to_sgm(k): v
              for k, v in _sd(tm).items()}
    # plus wrapper keys a real sgm checkpoint carries (must be ignored)
    sgm_sd["conditioner.embedders.0.dummy"] = np.zeros(1, np.float32)
    sgm_sd["first_stage_model.dummy"] = np.zeros(1, np.float32)

    params = convert.convert_m2svid_sgm(sgm_sd, cfg)

    rng = np.random.default_rng(3)
    f, hh, ww = 3, 16, 16
    x = rng.normal(0, 1, (f, cfg.in_channels, hh, ww)).astype(np.float32)
    ctx = rng.normal(0, 1, (1, 1, cfg.cross_attention_dim)).astype(
        np.float32)
    add_ids = np.array([6.0, 127.0, 0.02], np.float32)
    c_noise = np.float32(0.7)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.tensor(c_noise),
                 torch.from_numpy(ctx),
                 torch.from_numpy(add_ids)).numpy()

    out = svd.SVDUNet(cfg).apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(c_noise), jnp.asarray(ctx), jnp.asarray(add_ids))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert np.max(np.abs(out - ref)) < 2e-4, np.max(np.abs(out - ref))


def test_m2svid_registry_and_kind():
    assert convert.WEIGHT_REGISTRY["m2svid"]["kind"] == "m2svid_sgm"
