"""Video-Depth-Anything weight-exactness (head level).

The VDA backbone is DINOv2 (already proven weight-exact against HF
torch in test_weight_exact.py); what is new in VDA is DPTHeadTemporal —
the DA-V2 DPT head with four AnimateDiff-style temporal transformer
modules (upstream video_depth_anything/dpt_temporal.py +
motion_module.py). This test re-implements that head in torch with the
upstream module names/op order and checks our Flax head produces the
same output from converted weights:

- motion modules at layer_3/layer_4 (post-resize, pre-scratch) and
  path_4/path_3 (post-refinenet4/refinenet3)
- TemporalTransformer3DModel: GroupNorm(eps 1e-6) -> Linear proj_in ->
  [2x (LayerNorm -> temporal self-attn + residual) -> LayerNorm ->
  GEGLU FF + residual] -> Linear proj_out -> residual
- temporal attention: tokens = frames per spatial location, sinusoidal
  positional encoding added before qkv, diffusers CrossAttention layout
  (bias-free to_q/k/v, to_out.0 projection)
"""

import dataclasses
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import video_depth as vd
from metric_depth_video_toolbox_tpu.models import vit as vit_mod


@pytest.fixture(autouse=True)
def _precise_matmul():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


class TPositionalEncoding(tnn.Module):
    def __init__(self, d_model, max_len=64):
        super().__init__()
        pe = torch.zeros(1, max_len, d_model)
        position = torch.arange(max_len).unsqueeze(1).float()
        div = torch.exp(torch.arange(0, d_model, 2).float()
                        * (-math.log(10000.0) / d_model))
        pe[0, :, 0::2] = torch.sin(position * div)
        pe[0, :, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return x + self.pe[:, : x.size(1)]


class TVersatileAttention(tnn.Module):
    """diffusers CrossAttention, Temporal_Self mode."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(dim, dim, bias=False)
        self.to_v = tnn.Linear(dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim),
                                      tnn.Dropout(0.0)])
        self.pos_encoder = TPositionalEncoding(dim)

    def forward(self, x):
        # x: (B*H*W, T, C) — already rearranged to temporal tokens
        x = self.pos_encoder(x)
        b, t, c = x.shape
        h = self.heads
        q = self.to_q(x).view(b, t, h, c // h).transpose(1, 2)
        k = self.to_k(x).view(b, t, h, c // h).transpose(1, 2)
        v = self.to_v(x).view(b, t, h, c // h).transpose(1, 2)
        att = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c // h),
                            dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, t, c)
        return self.to_out[1](self.to_out[0](out))


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TTemporalTransformerBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.attention_blocks = tnn.ModuleList(
            [TVersatileAttention(dim, heads) for _ in range(2)])
        self.norms = tnn.ModuleList(
            [tnn.LayerNorm(dim) for _ in range(2)])
        self.ff = tnn.Sequential()  # placeholder; replaced below
        self.ff = tnn.ModuleList()
        net = tnn.ModuleList([TGEGLU(dim, dim * 4), tnn.Dropout(0.0),
                              tnn.Linear(dim * 4, dim)])
        self.ff = tnn.Module()
        self.ff.net = net
        self.ff_norm = tnn.LayerNorm(dim)

    def forward(self, x):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = attn(norm(x)) + x
        y = self.ff_norm(x)
        y = self.ff.net[2](self.ff.net[1](self.ff.net[0](y)))
        return x + y


class TTemporalTransformer3D(tnn.Module):
    def __init__(self, dim, heads, groups, n_blocks=1):
        super().__init__()
        self.norm = tnn.GroupNorm(min(groups, dim), dim, eps=1e-6)
        self.proj_in = tnn.Linear(dim, dim)
        self.transformer_blocks = tnn.ModuleList(
            [TTemporalTransformerBlock(dim, heads)
             for _ in range(n_blocks)])
        self.proj_out = tnn.Linear(dim, dim)

    def forward(self, x, t):
        # x: (T, C, H, W) (batch of frames, video batch = 1)
        residual = x
        n, c, h, w = x.shape
        y = self.norm(x)
        y = y.permute(0, 2, 3, 1).reshape(n, h * w, c)
        y = self.proj_in(y)
        # temporal rearrange: (b f) d c -> (b d) f c
        y = y.reshape(t, h * w, c).permute(1, 0, 2)
        for blk in self.transformer_blocks:
            y = blk(y)
        y = y.permute(1, 0, 2).reshape(n, h * w, c)
        y = self.proj_out(y)
        y = y.reshape(n, h, w, c).permute(0, 3, 1, 2)
        return y + residual


class TMotionModule(tnn.Module):
    def __init__(self, dim, heads, groups):
        super().__init__()
        self.temporal_transformer = TTemporalTransformer3D(
            dim, heads, groups)

    def forward(self, x, t):
        return self.temporal_transformer(x, t)


class TResConfUnit(tnn.Module):
    def __init__(self, feat):
        super().__init__()
        self.conv1 = tnn.Conv2d(feat, feat, 3, padding=1)
        self.conv2 = tnn.Conv2d(feat, feat, 3, padding=1)

    def forward(self, x):
        y = F.relu(x)
        y = self.conv1(y)
        y = F.relu(y)
        y = self.conv2(y)
        return x + y


class TFusion(tnn.Module):
    def __init__(self, feat):
        super().__init__()
        self.resConfUnit1 = TResConfUnit(feat)
        self.resConfUnit2 = TResConfUnit(feat)
        self.out_conv = tnn.Conv2d(feat, feat, 1)

    def forward(self, x, skip=None, size=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        kw = {"scale_factor": 2} if size is None else {"size": size}
        x = F.interpolate(x, mode="bilinear", align_corners=True, **kw)
        return self.out_conv(x)


class THeadTemporal(tnn.Module):
    """upstream DPTHeadTemporal op order, video batch = 1."""

    def __init__(self, d, chans, feat, heads, groups):
        super().__init__()
        self.projects = tnn.ModuleList(
            [tnn.Conv2d(d, ch, 1) for ch in chans])
        self.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(chans[0], chans[0], 4, 4),
            tnn.ConvTranspose2d(chans[1], chans[1], 2, 2),
            tnn.Identity(),
            tnn.Conv2d(chans[3], chans[3], 3, 2, 1)])
        self.motion_modules = tnn.ModuleList([
            TMotionModule(chans[2], heads, groups),
            TMotionModule(chans[3], heads, groups),
            TMotionModule(feat, heads, groups),
            TMotionModule(feat, heads, groups)])

        class Scratch(tnn.Module):
            pass
        self.scratch = Scratch()
        for i, ch in enumerate(chans):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    tnn.Conv2d(ch, feat, 3, padding=1, bias=False))
        for i in range(1, 5):
            setattr(self.scratch, f"refinenet{i}", TFusion(feat))
        self.scratch.output_conv1 = tnn.Conv2d(feat, feat // 2, 3,
                                               padding=1)
        self.scratch.output_conv2 = tnn.Sequential(
            tnn.Conv2d(feat // 2, 32, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(32, 1, 1), tnn.ReLU())

    def forward(self, feats, t, patch):
        # feats: list of (T, gh, gw, D) -> NCHW
        outs = []
        for i, f in enumerate(feats):
            x = f.permute(0, 3, 1, 2)
            x = self.projects[i](x)
            x = self.resize_layers[i](x)
            if i == 2:
                x = self.motion_modules[0](x, t)
            elif i == 3:
                x = self.motion_modules[1](x, t)
            outs.append(x)
        l1 = self.scratch.layer1_rn(outs[0])
        l2 = self.scratch.layer2_rn(outs[1])
        l3 = self.scratch.layer3_rn(outs[2])
        l4 = self.scratch.layer4_rn(outs[3])
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p4 = self.motion_modules[2](p4, t)
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p3 = self.motion_modules[3](p3, t)
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        gh = feats[0].shape[1]
        gw = feats[0].shape[2]
        out = F.interpolate(out, (gh * patch, gw * patch),
                            mode="bilinear", align_corners=True)
        return self.scratch.output_conv2(out)


def test_vda_temporal_head_equivalence():
    t, gh, gw, d = 4, 4, 4, 16
    chans = (8, 16, 24, 32)
    feat = 16
    heads = 2
    groups = 4
    tmodel = THeadTemporal(d, chans, feat, heads, groups)
    g = torch.Generator().manual_seed(31)
    new = {k: (torch.randn(v.shape, generator=g) * 0.05
               if v.dtype.is_floating_point else v)
           for k, v in tmodel.state_dict().items()}
    tmodel.load_state_dict(new)
    tmodel.eval()
    # prefix keys like the real checkpoint (head.*)
    sd = {"head." + k: v.detach().numpy()
          for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(29)
    feats = [rng.normal(size=(t, gh, gw, d)).astype(np.float32) * 0.3
             for _ in range(4)]
    with torch.no_grad():
        want = tmodel([torch.from_numpy(f) for f in feats], t,
                      patch=14)[:, 0].numpy()

    vit_cfg = dataclasses.replace(
        vit_mod.VIT_TINY, embed_dim=d, dtype="float32",
        attention_impl="xla")
    dpt_cfg = dpt_mod.DPTConfig(features=feat, out_channels=chans,
                                dtype="float32", torch_resize=True,
                                fast_head=False)
    cfg = vd.VideoDepthConfig(vit=vit_cfg, dpt=dpt_cfg,
                              temporal_heads=heads, temporal_layers=1,
                              norm_groups=groups)
    head = vd.DPTHeadTemporal(cfg)
    hp = convert._dpt_head_from(
        {k[len("head."):]: v for k, v in sd.items()}, vit_cfg)
    for i in range(4):
        hp[f"motion{i}"] = convert._motion_module(
            {k[len("head."):]: v for k, v in sd.items()},
            f"motion_modules.{i}")
    got = np.asarray(head.apply({"params": hp},
                                [jnp.asarray(f) for f in feats]))[..., 0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_convert_vda_full_tree_runs():
    """convert_vda maps a full synthetic upstream state dict onto the
    VideoDepthAnything param tree (backbone + temporal head) and the
    converted model runs."""
    cfg = vd.VideoDepthConfig(
        vit=dataclasses.replace(vit_mod.VIT_TINY, dtype="float32",
                                attention_impl="xla"),
        dpt=dpt_mod.DPTConfig(features=32, out_channels=(16, 32, 48, 64),
                              dtype="float32", torch_resize=True,
                              fast_head=False),
        temporal_heads=2, temporal_layers=1, norm_groups=4,
        window=4, overlap=1)
    d = cfg.vit.embed_dim
    # torch-side synthetic: DINOv2 backbone + temporal head
    head = THeadTemporal(d, tuple(cfg.dpt.out_channels),
                         cfg.dpt.features, 2, 4)
    sd = {"head." + k: v.detach().numpy()
          for k, v in head.state_dict().items()}
    rng = np.random.default_rng(3)

    def w(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02
    sd["pretrained.patch_embed.proj.weight"] = w(d, 3, 14, 14)
    sd["pretrained.patch_embed.proj.bias"] = w(d)
    sd["pretrained.cls_token"] = w(1, 1, d)
    sd["pretrained.pos_embed"] = w(1, 5, d)
    sd["pretrained.norm.weight"] = w(d)
    sd["pretrained.norm.bias"] = w(d)
    for i in range(cfg.vit.depth):
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

    params = convert.convert_vda(sd, cfg)
    model = vd.VideoDepthAnything(cfg)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                         jnp.zeros((4, 28, 28, 3)))
    assert jax.tree.map(lambda a: np.shape(a), params) == \
        jax.tree.map(lambda a: a.shape, ref)
    out = model.apply(params, jnp.zeros((4, 28, 28, 3)))
    assert out.shape == (4, 28, 28)
    assert np.isfinite(np.asarray(out)).all()
