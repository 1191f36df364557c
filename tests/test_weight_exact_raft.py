"""RAFT weight-exactness: our Flax RAFT with converted weights must
reproduce the torchvision ``raft_large`` graph numerically.

torchvision is not installed in this image, so the ground truth here is
a torch re-implementation of the torchvision op order (module names
match the published checkpoint layout exactly, so ``convert_raft``
consumes this state dict the same way it would consume the real
``Raft_Large_Weights.C_T_SKHT_V2`` file):

- Conv2dNormActivation: conv (bias only when no norm) -> norm -> ReLU
- ResidualBlock: two conv-norm-relu, 1x1-conv downsample path when
  strided, ReLU applied AFTER the residual sum
- feature encoder InstanceNorm2d (affine=False), context encoder
  BatchNorm2d (eval: running stats)
- 4-level all-pairs correlation pyramid / sqrt(C), avg-pool-2 levels
- lookups: grid_sample(align_corners=True, padding_mode='zeros') at
  centroids/2^level + meshgrid(di, dj) offsets
- motion encoder -> cat(context, motion) -> convgru(1x5) -> convgru(5x1)
  -> flow head; convex upsampling with softmaxed 9-tap masks * 0.25
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import raft as raft_mod


@pytest.fixture(autouse=True)
def _precise_matmul():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


def _cna(cin, cout, k, stride=1, norm=None, act=True):
    """Conv2dNormActivation clone: Sequential(conv[, norm][, relu])."""
    if isinstance(k, int):
        k = (k, k)
    pad = (k[0] // 2, k[1] // 2)
    layers = [tnn.Conv2d(cin, cout, k, stride, pad, bias=norm is None)]
    if norm == "instance":
        layers.append(tnn.InstanceNorm2d(cout))
    elif norm == "batch":
        layers.append(tnn.BatchNorm2d(cout))
    if act:
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class TResidualBlock(tnn.Module):
    def __init__(self, cin, cout, norm, stride):
        super().__init__()
        self.convnormrelu1 = _cna(cin, cout, 3, stride, norm)
        self.convnormrelu2 = _cna(cout, cout, 3, 1, norm)
        if stride == 1:
            self.downsample = tnn.Identity()
        else:
            self.downsample = tnn.Sequential(
                _cna(cin, cout, 1, stride, norm, act=False))
        self.relu = tnn.ReLU()

    def forward(self, x):
        y = self.convnormrelu1(x)
        y = self.convnormrelu2(y)
        x = self.downsample(x)
        return self.relu(x + y)


class TEncoder(tnn.Module):
    def __init__(self, stem, layers, out, norm):
        super().__init__()
        self.convnormrelu = _cna(3, stem, 7, 2, norm)
        widths = [stem] + list(layers)
        for li, stride in zip((1, 2, 3), (1, 2, 2)):
            blocks = tnn.Sequential(
                TResidualBlock(widths[li - 1], widths[li], norm, stride),
                TResidualBlock(widths[li], widths[li], norm, 1))
            setattr(self, f"layer{li}", blocks)
        self.conv = tnn.Conv2d(layers[-1], out, 1)

    def forward(self, x):
        x = self.convnormrelu(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.conv(x)


class TConvGRU(tnn.Module):
    def __init__(self, hidden, inp, k, pad):
        super().__init__()
        self.convz = tnn.Conv2d(hidden + inp, hidden, k, padding=pad)
        self.convr = tnn.Conv2d(hidden + inp, hidden, k, padding=pad)
        self.convq = tnn.Conv2d(hidden + inp, hidden, k, padding=pad)

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class TMotionEncoder(tnn.Module):
    def __init__(self, corr_ch, cc, cf, out):
        super().__init__()
        self.convcorr1 = _cna(corr_ch, cc[0], 1)
        self.convcorr2 = _cna(cc[0], cc[1], 3)
        self.convflow1 = _cna(2, cf[0], 7)
        self.convflow2 = _cna(cf[0], cf[1], 3)
        self.conv = _cna(cc[1] + cf[1], out - 2, 3)

    def forward(self, flow, corr):
        c = self.convcorr2(self.convcorr1(corr))
        f = self.convflow2(self.convflow1(flow))
        cf = self.conv(torch.cat([c, f], dim=1))
        return torch.cat([cf, flow], dim=1)


class TRecurrentBlock(tnn.Module):
    def __init__(self, hidden, inp):
        super().__init__()
        self.convgru1 = TConvGRU(hidden, inp, (1, 5), (0, 2))
        self.convgru2 = TConvGRU(hidden, inp, (5, 1), (2, 0))

    def forward(self, h, x):
        h = self.convgru1(h, x)
        return self.convgru2(h, x)


class TFlowHead(tnn.Module):
    def __init__(self, hidden, mid):
        super().__init__()
        self.conv1 = tnn.Conv2d(hidden, mid, 3, padding=1)
        self.conv2 = tnn.Conv2d(mid, 2, 3, padding=1)
        self.relu = tnn.ReLU()

    def forward(self, x):
        return self.conv2(self.relu(self.conv1(x)))


class TUpdateBlock(tnn.Module):
    def __init__(self, cfg, corr_ch):
        super().__init__()
        self.motion_encoder = TMotionEncoder(
            corr_ch, cfg.motion_corr, cfg.motion_flow, cfg.motion_out)
        self.recurrent_block = TRecurrentBlock(
            cfg.hidden_dim, cfg.context_dim + cfg.motion_out)
        self.flow_head = TFlowHead(cfg.hidden_dim, cfg.flow_head_hidden)

    def forward(self, hidden, context, corr, flow):
        m = self.motion_encoder(flow, corr)
        x = torch.cat([context, m], dim=1)
        hidden = self.recurrent_block(hidden, x)
        return hidden, self.flow_head(hidden)


class TMaskPredictor(tnn.Module):
    def __init__(self, hidden, mid):
        super().__init__()
        self.convrelu = _cna(hidden, mid, 3)
        self.conv = tnn.Conv2d(mid, 8 * 8 * 9, 1)

    def forward(self, x):
        return 0.25 * self.conv(self.convrelu(x))


def _t_grid_sample(vol, xs, ys):
    """torchvision _utils.grid_sample: align_corners=True, zeros pad.
    vol (N, 1, h, w); xs/ys (N, A, B) pixel coords."""
    h, w = vol.shape[2], vol.shape[3]
    xg = 2 * xs / (w - 1) - 1
    yg = 2 * ys / (h - 1) - 1
    grid = torch.stack([xg, yg], dim=-1)
    return F.grid_sample(vol, grid, mode="bilinear",
                         padding_mode="zeros", align_corners=True)


class TRaft(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.feature_encoder = TEncoder(cfg.stem, cfg.layers,
                                        cfg.feat_dim, "instance")
        self.context_encoder = TEncoder(
            cfg.stem, cfg.layers, cfg.hidden_dim + cfg.context_dim,
            "batch")
        corr_ch = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
        self.update_block = TUpdateBlock(cfg, corr_ch)
        self.mask_predictor = TMaskPredictor(cfg.hidden_dim,
                                             cfg.flow_head_hidden)

    def _corr_pyramid(self, f1, f2):
        b, c, h, w = f1.shape
        corr = torch.einsum("bcx,bcy->bxy", f1.reshape(b, c, h * w),
                            f2.reshape(b, c, h * w))
        corr = corr / torch.sqrt(torch.tensor(float(c)))
        pyr = [corr.reshape(b * h * w, 1, h, w)]
        for _ in range(self.cfg.corr_levels - 1):
            pyr.append(F.avg_pool2d(pyr[-1], 2, 2))
        return pyr

    def _lookup(self, pyr, coords):
        r = self.cfg.corr_radius
        b, _, h, w = coords.shape
        di = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(di, di, indexing="ij"),
                            dim=-1)  # (2r+1, 2r+1, 2)
        out = []
        for lvl, vol in enumerate(pyr):
            cent = coords.permute(0, 2, 3, 1).reshape(
                b * h * w, 1, 1, 2) / 2 ** lvl
            sc = cent + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
            v = _t_grid_sample(vol, sc[..., 0], sc[..., 1])
            out.append(v.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2)

    def _upsample_flow(self, flow, up_mask):
        b, _, h, w = flow.shape
        up_mask = up_mask.view(b, 1, 9, 8, 8, h, w)
        up_mask = torch.softmax(up_mask, dim=2)
        up_flow = F.unfold(8 * flow, 3, padding=1).view(
            b, 2, 9, 1, 1, h, w)
        up_flow = (up_mask * up_flow).sum(dim=2)
        return up_flow.permute(0, 1, 4, 2, 5, 3).reshape(
            b, 2, 8 * h, 8 * w)

    def forward(self, img1, img2, iters):
        f1 = self.feature_encoder(img1)
        f2 = self.feature_encoder(img2)
        ctx = self.context_encoder(img1)
        hd = self.cfg.hidden_dim
        hidden = torch.tanh(ctx[:, :hd])
        context = torch.relu(ctx[:, hd:])
        pyr = self._corr_pyramid(f1, f2)
        b, _, h, w = f1.shape
        gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                torch.arange(w, dtype=torch.float32),
                                indexing="ij")
        coords0 = torch.stack([gx, gy])[None].repeat(b, 1, 1, 1)
        coords1 = coords0.clone()
        up = None
        for _ in range(iters):
            corr = self._lookup(pyr, coords1)
            flow = coords1 - coords0
            hidden, delta = self.update_block(hidden, context, corr, flow)
            coords1 = coords1 + delta
            mask = self.mask_predictor(hidden)
            up = self._upsample_flow(coords1 - coords0, mask)
        return up


def test_raft_forward_equivalence():
    cfg = raft_mod.RAFT_TINY
    tmodel = TRaft(cfg)
    g = torch.Generator().manual_seed(5)
    sd = tmodel.state_dict()
    new = {k: (torch.randn(v.shape, generator=g) * 0.05
               if v.dtype.is_floating_point else v)
           for k, v in sd.items()}
    # make BN running stats non-trivial
    for k in new:
        if k.endswith("running_var"):
            new[k] = torch.rand(new[k].shape, generator=g) + 0.5
        elif k.endswith("running_mean"):
            new[k] = torch.randn(new[k].shape, generator=g) * 0.1
    tmodel.load_state_dict(new)
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(4)
    a = rng.integers(0, 255, (2, 48, 64, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (2, 48, 64, 3)).astype(np.uint8)

    def norm(x):
        return torch.from_numpy(
            ((x.astype(np.float32) / 255.0) * 2 - 1)
            .transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        want = tmodel(norm(a), norm(b), iters=cfg.iters).numpy()
    want = want.transpose(0, 2, 3, 1)

    params = convert.convert_raft(sd_np)
    ours = raft_mod.RAFT(cfg)
    got = np.asarray(ours.apply(params, jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == want.shape
    scale = float(np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5 * scale)


def test_raft_checkpoint_roundtrip(tmp_path):
    """convert_torch_file('raft') loads a saved torch checkpoint."""
    cfg = raft_mod.RAFT_TINY
    tmodel = TRaft(cfg)
    path = str(tmp_path / "raft.pth")
    torch.save(tmodel.state_dict(), path)
    params = convert.convert_torch_file(path, "raft")
    a = jnp.zeros((1, 16, 16, 3), jnp.uint8)
    out = raft_mod.RAFT(cfg).apply(params, a, a)
    assert out.shape == (1, 16, 16, 2)
    assert np.isfinite(np.asarray(out)).all()
