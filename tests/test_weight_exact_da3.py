"""DA3 weight-exactness: our Flax DA3 with converted weights must
reproduce a torch mirror of the Depth-Anything-3 graph numerically.

The upstream package (depth_anything_3, reference video_da3.py:6) is not
installed in this image, so the ground truth is a torch re-implementation
of the published DA3 architecture with module names matching the
checkpoint layout ``convert_da3`` consumes:

- backbone: plain DINOv2 ViT (patch_embed.proj, cls_token, pos_embed,
  blocks.N.{norm1, attn.qkv/proj, ls1/ls2.gamma, norm2, mlp.fc1/fc2},
  norm; LayerNorm eps 1e-6, exact-erf GELU, LayerScale residuals) with
  DA3's input-adaptive cross-view self-attention: alternating blocks
  attend over the CONCATENATED tokens of all views — same weights, pure
  input reshape, the core DA3 architectural idea;
- head.depth / head.ray: one DA-V2-layout DPT decode per branch
  (projects.N, resize_layers.N, scratch.layerN_rn, scratch.refinenetN,
  scratch.output_conv1/2) — depth 1ch + final ReLU, ray map 6ch raw
  (world ray origin + direction, the DA3 depth-ray target).

The multi-view test is the important one: it proves the cross-view token
mixing (not just the per-view graph) is weight-exact.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from torch_mirrors import TDino, normalize_imagenet

from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import da3 as da3_mod
from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod


@pytest.fixture(autouse=True)
def _precise_matmul():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


D, DEPTH, HEADS, PATCH = 32, 4, 4, 14
CHANS = (8, 16, 24, 32)
FEAT = 16
CROSS = (1, 3)  # odd blocks, DA3's alternating cross-view pattern
OUT_IDX = (0, 1, 2, 3)
MAX_DEPTH = 100.0


class TResConfUnit(tnn.Module):
    def __init__(self, feat):
        super().__init__()
        self.conv1 = tnn.Conv2d(feat, feat, 3, padding=1)
        self.conv2 = tnn.Conv2d(feat, feat, 3, padding=1)

    def forward(self, x):
        y = self.conv1(F.relu(x))
        return x + self.conv2(F.relu(y))


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


class TDPT(tnn.Module):
    """DA-V2 DPT branch (upstream op order), n_out output channels."""

    def __init__(self, d, chans, feat, n_out, final_relu):
        super().__init__()
        self.final_relu = final_relu
        self.projects = tnn.ModuleList(
            [tnn.Conv2d(d, ch, 1) for ch in chans])
        self.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(chans[0], chans[0], 4, 4),
            tnn.ConvTranspose2d(chans[1], chans[1], 2, 2),
            tnn.Identity(),
            tnn.Conv2d(chans[3], chans[3], 3, 2, 1)])

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
            tnn.Conv2d(32, n_out, 1))

    def forward(self, feats, patch):
        outs = []
        for i, f in enumerate(feats):
            x = f.permute(0, 3, 1, 2)
            x = self.projects[i](x)
            x = self.resize_layers[i](x)
            outs.append(x)
        l1 = self.scratch.layer1_rn(outs[0])
        l2 = self.scratch.layer2_rn(outs[1])
        l3 = self.scratch.layer3_rn(outs[2])
        l4 = self.scratch.layer4_rn(outs[3])
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        gh, gw = feats[0].shape[1], feats[0].shape[2]
        out = F.interpolate(out, (gh * patch, gw * patch),
                            mode="bilinear", align_corners=True)
        out = self.scratch.output_conv2(out)
        return F.relu(out) if self.final_relu else out


class TDA3(tnn.Module):
    def __init__(self, n_tok):
        super().__init__()
        self.backbone = TDino(D, DEPTH, HEADS, PATCH, n_tok,
                              OUT_IDX, cross=CROSS)

        class Head(tnn.Module):
            pass
        self.head = Head()
        self.head.depth = TDPT(D, CHANS, FEAT, 1, final_relu=True)
        self.head.ray = TDPT(D, CHANS, FEAT, 6, final_relu=False)

    def forward(self, frames):
        """frames: (V, H, W, 3) in [0, 1]."""
        grids = self.backbone(normalize_imagenet(frames))
        depth = self.head.depth(grids, PATCH)[:, 0]
        depth = torch.clamp(depth, 0.0, MAX_DEPTH)
        rays = self.head.ray(grids, PATCH).permute(0, 2, 3, 1)
        return depth, rays


def _pair():
    hw = 2 * PATCH  # 2x2 patch grid
    n_tok = 4
    torch.manual_seed(7)
    tm = TDA3(n_tok)
    # non-degenerate weights (default zero cls/pos stay meaningful via
    # randn reload, matching the VDA test recipe)
    g = torch.Generator().manual_seed(11)
    sd = {k: (torch.randn(v.shape, generator=g) * 0.08
              if v.dtype.is_floating_point else v)
          for k, v in tm.state_dict().items()}
    tm.load_state_dict(sd)
    tm.eval()

    vit_cfg = dataclasses.replace(
        vit_mod.VIT_TINY, embed_dim=D, depth=DEPTH, num_heads=HEADS,
        out_indices=OUT_IDX, cross_view_indices=CROSS,
        dtype="float32", attention_impl="xla")
    dpt_cfg = dpt_mod.DPTConfig(
        features=FEAT, out_channels=CHANS, dtype="float32",
        torch_resize=True, fast_head=False)
    cfg = da3_mod.DA3Config(vit=vit_cfg, dpt=dpt_cfg,
                            max_depth=MAX_DEPTH)
    params = convert.convert_da3(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, cfg)
    return tm, cfg, params, hw


@pytest.mark.parametrize("views", [1, 3])
def test_da3_forward_equivalence(views):
    tm, cfg, params, hw = _pair()
    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 1, (views, hw, hw, 3)).astype(np.float32)
    with torch.no_grad():
        want_d, want_r = tm(torch.from_numpy(frames))
    out = da3_mod.DA3(cfg).apply(params, jnp.asarray(frames))
    got_d = np.asarray(out["depth"])
    got_r = np.asarray(out["rays"])
    np.testing.assert_allclose(got_d, want_d.numpy(), rtol=3e-4,
                               atol=3e-5)
    np.testing.assert_allclose(got_r, want_r.numpy(), rtol=3e-4,
                               atol=3e-5)
    # cameras come from the (now weight-exact) ray map, closed form
    assert np.isfinite(np.asarray(out["w2c"])).all()
    assert np.isfinite(np.asarray(out["xfov_deg"])).all()


def test_da3_cross_view_actually_mixes():
    """The mirror pair must agree AND the multi-view forward must differ
    from per-view forwards — i.e. the equivalence above genuinely
    covers cross-view token mixing."""
    tm, cfg, params, hw = _pair()
    rng = np.random.default_rng(6)
    frames = rng.uniform(0, 1, (2, hw, hw, 3)).astype(np.float32)
    # probe the converted BACKBONE features (small random-init attention
    # logits make softmax near-uniform, so the view-mixing signal is
    # ~1e-5 at feature level and the conv head attenuates it further —
    # the features are where mixing must provably happen)
    vit = vit_mod.ViT(cfg.vit)
    bb = {"params": params["params"]["backbone"]}
    fj, _ = vit.apply(bb, jnp.asarray(frames), view_group=2)
    fs, _ = vit.apply(bb, jnp.asarray(frames[:1]), view_group=1)
    deltas = [np.abs(np.asarray(a)[0] - np.asarray(b)[0]).max()
              for a, b in zip(fj, fs)]
    # level 0 taps block 0 (pre-cross): must NOT mix; later levels must
    assert deltas[0] < 1e-7, deltas
    assert max(deltas[1:]) > 1e-6, deltas


def test_convert_da3_tree_matches_init():
    """Converted tree has exactly the module init's structure/shapes
    (so real-checkpoint loading cannot silently drop parameters)."""
    tm, cfg, params, hw = _pair()
    model = da3_mod.DA3(cfg)
    frames = jnp.zeros((2, hw, hw, 3))
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), frames))
    got_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(params)}
    want_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                  jax.tree_util.tree_leaves_with_path(ref)}
    assert got_paths == want_paths
