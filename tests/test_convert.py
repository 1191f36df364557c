"""Checkpoint conversion: a synthetic torch-layout DA-V2 state dict must
convert onto the exact param tree of DepthAnything(torch_resize mode)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import depth_anything as da
from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod


def _synth_da2_state_dict(rng, vit_cfg, dpt_cfg, n_tokens):
    """numpy state dict with the torch DA-V2 layout/shapes."""
    d = vit_cfg.embed_dim
    sd = {}

    def w(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02

    sd["pretrained.patch_embed.proj.weight"] = w(d, 3, 14, 14)
    sd["pretrained.patch_embed.proj.bias"] = w(d)
    sd["pretrained.cls_token"] = w(1, 1, d)
    sd["pretrained.pos_embed"] = w(1, n_tokens + 1, d)
    sd["pretrained.norm.weight"] = w(d)
    sd["pretrained.norm.bias"] = w(d)
    for i in range(vit_cfg.depth):
        b = f"pretrained.blocks.{i}"
        sd[f"{b}.norm1.weight"] = w(d)
        sd[f"{b}.norm1.bias"] = w(d)
        sd[f"{b}.attn.qkv.weight"] = w(3 * d, d)
        sd[f"{b}.attn.qkv.bias"] = w(3 * d)
        sd[f"{b}.attn.proj.weight"] = w(d, d)
        sd[f"{b}.attn.proj.bias"] = w(d)
        sd[f"{b}.ls1.gamma"] = w(d)
        sd[f"{b}.norm2.weight"] = w(d)
        sd[f"{b}.norm2.bias"] = w(d)
        sd[f"{b}.mlp.fc1.weight"] = w(4 * d, d)
        sd[f"{b}.mlp.fc1.bias"] = w(4 * d)
        sd[f"{b}.mlp.fc2.weight"] = w(d, 4 * d)
        sd[f"{b}.mlp.fc2.bias"] = w(d)
        sd[f"{b}.ls2.gamma"] = w(d)

    chans = dpt_cfg.out_channels
    feat = dpt_cfg.features
    for i, ch in enumerate(chans):
        sd[f"depth_head.projects.{i}.weight"] = w(ch, d, 1, 1)
        sd[f"depth_head.projects.{i}.bias"] = w(ch)
        sd[f"depth_head.scratch.layer{i + 1}_rn.weight"] = w(feat, ch, 3, 3)
    sd["depth_head.resize_layers.0.weight"] = w(chans[0], chans[0], 4, 4)
    sd["depth_head.resize_layers.0.bias"] = w(chans[0])
    sd["depth_head.resize_layers.1.weight"] = w(chans[1], chans[1], 2, 2)
    sd["depth_head.resize_layers.1.bias"] = w(chans[1])
    sd["depth_head.resize_layers.3.weight"] = w(chans[3], chans[3], 3, 3)
    sd["depth_head.resize_layers.3.bias"] = w(chans[3])
    for rn in range(1, 5):
        base = f"depth_head.scratch.refinenet{rn}"
        for unit in (1, 2):
            for cv in (1, 2):
                sd[f"{base}.resConfUnit{unit}.conv{cv}.weight"] = \
                    w(feat, feat, 3, 3)
                sd[f"{base}.resConfUnit{unit}.conv{cv}.bias"] = w(feat)
        sd[f"{base}.out_conv.weight"] = w(feat, feat, 1, 1)
        sd[f"{base}.out_conv.bias"] = w(feat)
    sd["depth_head.scratch.output_conv1.weight"] = w(feat // 2, feat, 3, 3)
    sd["depth_head.scratch.output_conv1.bias"] = w(feat // 2)
    sd["depth_head.scratch.output_conv2.0.weight"] = w(32, feat // 2, 3, 3)
    sd["depth_head.scratch.output_conv2.0.bias"] = w(32)
    sd["depth_head.scratch.output_conv2.2.weight"] = w(1, 32, 1, 1)
    sd["depth_head.scratch.output_conv2.2.bias"] = w(1)
    return sd


def test_da2_conversion_matches_param_tree(rng, tmp_path):
    vit_cfg = vit_mod.VIT_TINY
    dpt_cfg = dataclasses.replace(dpt_mod.DPT_TINY, torch_resize=True,
                                  fast_head=False)
    cfg = da.DepthAnythingConfig(vit=vit_cfg, dpt=dpt_cfg, metric=True,
                                 max_depth=20.0)
    model = da.DepthAnything(cfg)
    x = jnp.zeros((1, 28, 28, 3))  # 2x2 token grid
    ref_params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    sd = _synth_da2_state_dict(rng, vit_cfg, dpt_cfg, n_tokens=4)
    params = convert.convert_da2(sd, vit_cfg)

    ref_shapes = jax.tree.map(lambda a: a.shape, ref_params)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes, (
        f"param tree mismatch:\nref={ref_shapes}\ngot={got_shapes}")

    # converted params must actually run
    out = model.apply(params, x)
    assert out.shape == (1, 28, 28)
    assert np.isfinite(np.asarray(out)).all()

    # checkpoint save/load round-trip preserves the tree
    path = str(tmp_path / "da2.msgpack")
    convert.save_checkpoint(path, params)
    back = convert.load_checkpoint(path)
    assert jax.tree.map(lambda a: a.shape, back) == got_shapes


def test_linear_conv_conventions(rng):
    """Transposition conventions: torch Linear (out,in) -> flax (in,out);
    torch Conv (out,in,kh,kw) -> flax (kh,kw,in,out)."""
    sd = {"l.weight": rng.normal(size=(6, 4)).astype(np.float32),
          "l.bias": np.zeros(6, np.float32),
          "c.weight": rng.normal(size=(8, 3, 5, 5)).astype(np.float32),
          "ct.weight": rng.normal(size=(3, 8, 2, 2)).astype(np.float32)}
    assert convert.linear(sd, "l")["kernel"].shape == (4, 6)
    assert convert.conv(sd, "c")["kernel"].shape == (5, 5, 3, 8)
    assert convert.conv_transpose(sd, "ct")["kernel"].shape == (2, 2, 3, 8)
