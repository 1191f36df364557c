"""MoGe weight-exactness: our Flax MoGeNet with converted weights must
reproduce a torch mirror of the MoGe graph numerically.

The upstream package (moge, reference moge_video.py:13) is not installed
in this image, so the ground truth is a torch re-implementation of the
MoGe point-map architecture with module names matching the checkpoint
layout ``convert_moge`` consumes (documented in models/moge.py):
DINOv2 backbone + summed level projections + UV-conditioned x2 upsample
stages with GroupNorm residual conv blocks + a 4ch (xyz + mask) output
block. The metric solve upstream ``infer()`` performs on top of the raw
point map — focal/z-shift recovery honoring fov_x — is covered by
``test_recovered_intrinsics_match_groundtruth`` below (the
output['intrinsics'] contract of reference moge_video.py:162-176).
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
from metric_depth_video_toolbox_tpu.models import moge as moge_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod
from metric_depth_video_toolbox_tpu.ops import geometry as geo


@pytest.fixture(autouse=True)
def _precise_matmul():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


D, DEPTH, HEADS, PATCH = 32, 4, 4, 14
OUT_IDX = (0, 1, 2, 3)
DIM_PROJ = 16
DIM_UP = (12, 8)
NRES = 1
GROUPS = 4
LASTC = 8


def _uv(h, w):
    span = max(h, w)
    u = (2.0 * (torch.arange(w, dtype=torch.float32) + 0.5) - w) / span
    v = (2.0 * (torch.arange(h, dtype=torch.float32) + 0.5) - h) / span
    return torch.stack(torch.broadcast_tensors(u[None, :], v[:, None]),
                       dim=0)  # (2, h, w)


def _cat_uv(x):
    b, _, h, w = x.shape
    uv = _uv(h, w).expand(b, -1, -1, -1)
    return torch.cat([x, uv], dim=1)


class TResBlock(tnn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, ch, eps=1e-5)
        self.conv1 = tnn.Conv2d(ch, ch, 3, padding=1)
        self.norm2 = tnn.GroupNorm(groups, ch, eps=1e-5)
        self.conv2 = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return x + y


class TMoGeHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.projects = tnn.ModuleList(
            [tnn.Conv2d(D, DIM_PROJ, 1) for _ in OUT_IDX])
        ups = []
        cin = DIM_PROJ
        for ch in DIM_UP:
            stage = [tnn.ConvTranspose2d(cin + 2, ch, 2, 2),
                     tnn.Conv2d(ch, ch, 3, padding=1)]
            stage += [TResBlock(ch, GROUPS) for _ in range(NRES)]
            ups.append(tnn.Sequential(*stage))
            cin = ch
        self.upsample_blocks = tnn.ModuleList(ups)
        self.output_block = tnn.Sequential(
            tnn.Conv2d(cin + 2, LASTC, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(LASTC, 4, 1))

    def forward(self, grids):
        x = sum(p(g.permute(0, 3, 1, 2))
                for p, g in zip(self.projects, grids))
        for blk in self.upsample_blocks:
            x = blk[0](_cat_uv(x))
            for m in list(blk)[1:]:
                x = m(x)
        return self.output_block(_cat_uv(x))


class TMoGe(tnn.Module):
    def __init__(self, n_tok):
        super().__init__()
        self.backbone = TDino(D, DEPTH, HEADS, PATCH, n_tok, OUT_IDX)
        self.head = TMoGeHead()

    def forward(self, frames):
        """frames: (B, H, W, 3) [0,1] -> (points, mask_logit) at full
        resolution (bilinear, as our MoGeNet resizes)."""
        h, w = frames.shape[1], frames.shape[2]
        out = self.head(self.backbone(normalize_imagenet(frames)))
        out = F.interpolate(out, (h, w), mode="bilinear",
                            align_corners=False, antialias=False)
        return out[:, :3].permute(0, 2, 3, 1), out[:, 3]


def _pair():
    hw = 2 * PATCH
    n_tok = 4
    torch.manual_seed(3)
    tm = TMoGe(n_tok)
    g = torch.Generator().manual_seed(13)
    sd = {k: (torch.randn(v.shape, generator=g) * 0.1
              if v.dtype.is_floating_point else v)
          for k, v in tm.state_dict().items()}
    tm.load_state_dict(sd)
    tm.eval()

    vit_cfg = dataclasses.replace(
        vit_mod.VIT_TINY, embed_dim=D, depth=DEPTH, num_heads=HEADS,
        out_indices=OUT_IDX, dtype="float32", attention_impl="xla")
    cfg = moge_mod.MoGeConfig(
        vit=vit_cfg, dim_proj=DIM_PROJ, dim_upsample=DIM_UP,
        num_res_blocks=NRES, norm_groups=GROUPS,
        last_conv_channels=LASTC)
    params = convert.convert_moge(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, cfg)
    return tm, cfg, params, hw


def test_moge_forward_equivalence():
    tm, cfg, params, hw = _pair()
    rng = np.random.default_rng(8)
    frames = rng.uniform(0, 1, (2, hw, hw, 3)).astype(np.float32)
    with torch.no_grad():
        want_p, want_m = tm(torch.from_numpy(frames))
    got_p, got_m = moge_mod.MoGeNet(cfg).apply(params,
                                               jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(got_p), want_p.numpy(),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(),
                               rtol=3e-4, atol=3e-5)


def test_convert_moge_tree_matches_init():
    tm, cfg, params, hw = _pair()
    frames = jnp.zeros((1, hw, hw, 3))
    ref = jax.eval_shape(lambda: moge_mod.MoGeNet(cfg).init(
        jax.random.PRNGKey(0), frames))
    got = {jax.tree_util.keystr(p): v.shape for p, v in
           jax.tree_util.tree_leaves_with_path(params)}
    want = {jax.tree_util.keystr(p): v.shape for p, v in
            jax.tree_util.tree_leaves_with_path(ref)}
    assert got == want


def test_recovered_intrinsics_match_groundtruth():
    """The upstream infer() contract on top of the raw point map
    (reference moge_video.py:162-176, output['intrinsics'] /
    output['depth']): build a synthetic affine point map from a known
    camera, shift z by an arbitrary constant, and require
    recover_focal_shift to return the true focal (and xfov) and the
    shift that restores metric z."""
    h, w = 36, 48
    xfov_true = 62.0
    f_norm = float(geo.normalized_focal_from_xfov(xfov_true, h, w))
    uv = np.asarray(geo.normalized_uv(h, w, jnp.float32))
    rngl = np.random.default_rng(4)
    z = rngl.uniform(2.0, 6.0, (h, w)).astype(np.float32)
    x = uv[..., 0] / f_norm * z
    y = uv[..., 1] / f_norm * z
    shift_true = -1.3
    pts = np.stack([x, y, z + shift_true], axis=-1)
    focal, shift, _ = geo.recover_focal_shift(jnp.asarray(pts))
    assert abs(float(focal) - f_norm) < 2e-2 * f_norm
    assert abs(float(shift) - (-shift_true)) < 5e-2
    xfov = float(geo.xfov_from_normalized_focal(focal, h, w))
    assert abs(xfov - xfov_true) < 1.0
    # fov_x given (reference passes --xfov through): shift-only solve
    focal2, shift2, _ = geo.recover_focal_shift(
        jnp.asarray(pts), focal=f_norm)
    assert float(focal2) == pytest.approx(f_norm)
    assert abs(float(shift2) - (-shift_true)) < 2e-2
