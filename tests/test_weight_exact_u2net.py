"""U2Net weight-exactness: our Flax U²-Net with converted weights must
reproduce the original u2net.py torch graph numerically.

The torch side re-implements the original op order with the original
module names (REBNCONV conv_s1/bn_s1, stage{1..6}[d], ceil-mode pools,
bilinear upsampling, side outputs fused by outconv), so
``convert_u2net`` consumes this state dict exactly like the published
u2net.pth / u2netp.pth files (reference generate_video_mask.py wraps
rembg, which runs this same graph via onnx)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import segmentation as seg


@pytest.fixture(autouse=True)
def _precise_matmul():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


class TREBNCONV(tnn.Module):
    def __init__(self, cin, cout, dirate=1):
        super().__init__()
        self.conv_s1 = tnn.Conv2d(cin, cout, 3, padding=dirate,
                                  dilation=dirate)
        self.bn_s1 = tnn.BatchNorm2d(cout)
        self.relu_s1 = tnn.ReLU()

    def forward(self, x):
        return self.relu_s1(self.bn_s1(self.conv_s1(x)))


def _up_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear")


class TRSU(tnn.Module):
    def __init__(self, height, cin, mid, cout):
        super().__init__()
        self.height = height
        self.rebnconvin = TREBNCONV(cin, cout)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
        setattr(self, "rebnconv1", TREBNCONV(cout, mid))
        for i in range(2, height):
            setattr(self, f"rebnconv{i}", TREBNCONV(mid, mid))
        setattr(self, f"rebnconv{height}", TREBNCONV(mid, mid, dirate=2))
        for i in range(height - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", TREBNCONV(mid * 2, mid))
        self.rebnconv1d = TREBNCONV(mid * 2, cout)

    def forward(self, x):
        hl = self.height
        hxin = self.rebnconvin(x)
        enc = []
        hx = hxin
        for i in range(1, hl):
            hx = getattr(self, f"rebnconv{i}")(hx)
            enc.append(hx)
            if i < hl - 1:
                hx = self.pool(hx)
        hx = getattr(self, f"rebnconv{hl}")(hx)
        for i in range(hl - 1, 0, -1):
            skip = enc[i - 1]
            if hx.shape[2:] != skip.shape[2:]:
                hx = _up_like(hx, skip)
            hx = getattr(self, f"rebnconv{i}d")(
                torch.cat([hx, skip], dim=1))
        return hx + hxin


class TRSU4F(tnn.Module):
    def __init__(self, cin, mid, cout):
        super().__init__()
        self.rebnconvin = TREBNCONV(cin, cout)
        self.rebnconv1 = TREBNCONV(cout, mid, 1)
        self.rebnconv2 = TREBNCONV(mid, mid, 2)
        self.rebnconv3 = TREBNCONV(mid, mid, 4)
        self.rebnconv4 = TREBNCONV(mid, mid, 8)
        self.rebnconv3d = TREBNCONV(mid * 2, mid, 4)
        self.rebnconv2d = TREBNCONV(mid * 2, mid, 2)
        self.rebnconv1d = TREBNCONV(mid * 2, cout, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        h1 = self.rebnconv1(hxin)
        h2 = self.rebnconv2(h1)
        h3 = self.rebnconv3(h2)
        h4 = self.rebnconv4(h3)
        h3d = self.rebnconv3d(torch.cat([h4, h3], dim=1))
        h2d = self.rebnconv2d(torch.cat([h3d, h2], dim=1))
        h1d = self.rebnconv1d(torch.cat([h2d, h1], dim=1))
        return h1d + hxin


def _t_stage(spec, cin):
    height, mid, out = spec
    if height == 0:
        return TRSU4F(cin, mid, out)
    return TRSU(height, cin, mid, out)


class TU2NET(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
        cin = 3
        for i, spec in enumerate(cfg.stages):
            setattr(self, f"stage{i + 1}", _t_stage(spec, cin))
            cin = spec[2]
        outs = [s[2] for s in cfg.stages]
        dec_in = [outs[5] + outs[4], None, None, None, None]
        prev = outs[5]
        for k, spec in enumerate(cfg.dec_stages):
            si = len(cfg.dec_stages) - 1 - k  # 4..0
            setattr(self, f"stage{si + 1}d",
                    _t_stage(spec, prev + outs[si]))
            prev = spec[2]
        dec_outs = {}
        prev = outs[5]
        side_ch = [None] * 6
        side_ch[5] = outs[5]
        for k, spec in enumerate(cfg.dec_stages):
            si = len(cfg.dec_stages) - 1 - k
            side_ch[si] = spec[2]
        for i in range(1, 7):
            setattr(self, f"side{i}",
                    tnn.Conv2d(side_ch[i - 1], 1, 3, padding=1))
        self.outconv = tnn.Conv2d(6, 1, 1)
        del dec_in, dec_outs

    def forward(self, x):
        encs = []
        hx = x
        for i in range(1, 7):
            hx = getattr(self, f"stage{i}")(hx)
            encs.append(hx)
            if i < 6:
                hx = self.pool(hx)
        sides = [None] * 6
        sides[5] = self.side6(encs[5])
        d = encs[5]
        for si in range(4, -1, -1):
            skip = encs[si]
            d = _up_like(d, skip)
            d = getattr(self, f"stage{si + 1}d")(
                torch.cat([d, skip], dim=1))
            sides[si] = getattr(self, f"side{si + 1}")(d)
        ups = [sides[0]] + [_up_like(s, sides[0]) for s in sides[1:]]
        d0 = self.outconv(torch.cat(ups, dim=1))
        return torch.sigmoid(d0)


def test_u2net_forward_equivalence():
    cfg = seg.SEG_TINY
    tmodel = TU2NET(cfg)
    g = torch.Generator().manual_seed(17)
    sd = tmodel.state_dict()
    new = {}
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            new[k] = v
        elif k.endswith("running_var"):
            new[k] = torch.rand(v.shape, generator=g) + 0.5
        elif k.endswith("running_mean"):
            new[k] = torch.randn(v.shape, generator=g) * 0.1
        else:
            new[k] = torch.randn(v.shape, generator=g) * 0.05
    tmodel.load_state_dict(new)
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(23)
    img = rng.uniform(0.05, 1.0, size=(2, 64, 96, 3)).astype(np.float32)
    # torch side gets rembg-preprocessed input (our model does it inside)
    xin = img / img.max(axis=(1, 2, 3), keepdims=True)
    xin = (xin - np.array(seg.IMAGENET_MEAN, np.float32)) / \
        np.array(seg.IMAGENET_STD, np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            xin.transpose(0, 3, 1, 2).copy()))[:, 0].numpy()

    params = convert.convert_u2net(sd_np)
    got = np.asarray(seg.U2Net(cfg).apply(params, jnp.asarray(img)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_u2net_full_layout_converts():
    """The SEG_FULL/SEG_SMALL configs mirror the published u2net/u2netp
    channel plans; a u2netp-layout state dict converts onto SEG_SMALL's
    param tree exactly."""
    cfg = seg.SEG_SMALL
    tmodel = TU2NET(cfg)
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert.convert_u2net(sd_np)
    model = seg.U2Net(cfg)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)))
    got_shapes = jax.tree.map(lambda a: np.shape(a), params)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    assert got_shapes == ref_shapes
