"""DROID-class tracker weight-exactness: our Flax DroidNet with
converted weights must reproduce a torch mirror of the graph.

The upstream package (droid_slam / Mega-SAM, reference
sam_track_video.py:169-206) is not installed in this image, so the
ground truth is a torch re-implementation with module names matching
the checkpoint layout ``convert_droid`` consumes (documented in
models/droid.py): BasicEncoders (instance-norm fnet / norm-free cnet),
the global-context ConvGRU, and the update module's corr/flow encoders,
delta/weight heads and GraphAgg (per-source-frame mean -> damping +
upsample mask). Plus an end-to-end run of the learned front-end
(pipeline/slam.py droid_track_video) on a synthetic clip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import droid as droid_mod


@pytest.fixture(autouse=True)
def _precise_matmul():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


CFG = droid_mod.DROID_TINY
HID, CTX = CFG.hidden, CFG.context
CORP = CFG.cor_planes
CENC = CFG.hidden * 2  # tiny corr/flow encoder width


def _norm(kind, ch):
    if kind == "instance":
        return tnn.InstanceNorm2d(ch)
    return tnn.Identity()


class TResBlock(tnn.Module):
    def __init__(self, cin, planes, norm, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride=stride, padding=1)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1)
        self.n1 = _norm(norm, planes)
        self.n2 = _norm(norm, planes)
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride=stride),
                _norm(norm, planes))
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.n1(self.conv1(x)))
        y = F.relu(self.n2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TEncoder(tnn.Module):
    def __init__(self, out_dim, norm):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, CFG.stem, 7, stride=2, padding=3)
        self.n1 = _norm(norm, CFG.stem)
        cin = CFG.stem
        for li, width in enumerate(CFG.layers):
            stride = 1 if li == 0 else 2
            setattr(self, f"layer{li + 1}", tnn.Sequential(
                TResBlock(cin, width, norm, stride),
                TResBlock(width, width, norm, 1)))
            cin = width
        self.conv2 = tnn.Conv2d(cin, out_dim, 1)

    def forward(self, x):
        x = F.relu(self.n1(self.conv1(x)))
        for li in range(len(CFG.layers)):
            x = getattr(self, f"layer{li + 1}")(x)
        return self.conv2(x)


class TGRU(tnn.Module):
    def __init__(self, h, i):
        super().__init__()
        self.convz = tnn.Conv2d(h + i, h, 3, padding=1)
        self.convr = tnn.Conv2d(h + i, h, 3, padding=1)
        self.convq = tnn.Conv2d(h + i, h, 3, padding=1)
        self.w = tnn.Conv2d(h, h, 1)
        self.convz_glo = tnn.Conv2d(h, h, 1)
        self.convr_glo = tnn.Conv2d(h, h, 1)
        self.convq_glo = tnn.Conv2d(h, h, 1)

    def forward(self, net, inp):
        glo = (torch.sigmoid(self.w(net)) * net).mean((2, 3),
                                                      keepdim=True)
        hx = torch.cat([net, inp], dim=1)
        z = torch.sigmoid(self.convz(hx) + self.convz_glo(glo))
        r = torch.sigmoid(self.convr(hx) + self.convr_glo(glo))
        q = torch.tanh(self.convq(torch.cat([r * net, inp], dim=1))
                       + self.convq_glo(glo))
        return (1 - z) * net + z * q


class TUpdate(tnn.Module):
    def __init__(self):
        super().__init__()
        self.corr_encoder = tnn.Sequential(
            tnn.Conv2d(CORP, CENC, 1), tnn.ReLU(),
            tnn.Conv2d(CENC, HID, 3, padding=1), tnn.ReLU())
        self.flow_encoder = tnn.Sequential(
            tnn.Conv2d(4, CENC, 7, padding=3), tnn.ReLU(),
            tnn.Conv2d(CENC, HID // 2, 3, padding=1), tnn.ReLU())
        self.weight = tnn.Sequential(
            tnn.Conv2d(HID, HID, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(HID, 2, 3, padding=1), tnn.Sigmoid())
        self.delta = tnn.Sequential(
            tnn.Conv2d(HID, HID, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(HID, 2, 3, padding=1))
        self.gru = TGRU(HID, CTX + HID + HID // 2)
        self.agg = tnn.Module()
        self.agg.conv1 = tnn.Conv2d(HID, HID, 3, padding=1)
        self.agg.conv2 = tnn.Conv2d(HID, HID, 3, padding=1)
        self.agg.eta = tnn.Sequential(tnn.Conv2d(HID, 1, 3, padding=1))
        self.agg.upmask = tnn.Sequential(
            tnn.Conv2d(HID, CFG.upsample_factor ** 2 * 9, 1))

    def forward(self, net, inp, corr, flow, src, n_frames):
        cf = self.corr_encoder(corr)
        ff = self.flow_encoder(flow)
        net = self.gru(net, torch.cat([inp, cf, ff], dim=1))
        delta = self.delta(net)
        weight = self.weight(net)
        a = F.relu(self.agg.conv1(net))
        mean = torch.zeros((n_frames,) + a.shape[1:])
        cnt = torch.zeros(n_frames)
        mean.index_add_(0, src, a)
        cnt.index_add_(0, src, torch.ones(len(src)))
        mean = mean / cnt.clamp(min=1.0)[:, None, None, None]
        a = F.relu(self.agg.conv2(mean))
        eta = 0.01 * F.softplus(self.agg.eta(a))[:, 0]
        upmask = self.agg.upmask(a)
        return net, delta, weight, eta, upmask


class TDroid(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = TEncoder(CFG.feat_dim, "instance")
        self.cnet = TEncoder(HID + CTX, "none")
        self.update = TUpdate()

    def state_keys(self):
        # rename the mirror's norm containers to the checkpoint layout
        # (InstanceNorm2d is affine-free: no tensors; 'none' is
        # Identity: no tensors), and Sequential block naming is already
        # layerL.N.* as upstream
        return {k.replace(".n1.", ".norm1."): v
                for k, v in self.state_dict().items()}

    def features(self, images):
        """(T, H, W, 3) [0,1] -> fmap/net/inp NHWC numpy-style."""
        mean = torch.tensor([0.485, 0.456, 0.406])
        std = torch.tensor([0.229, 0.224, 0.225])
        x = ((images - mean) / std).permute(0, 3, 1, 2)
        fmap = self.fnet(x)
        ctx = self.cnet(x)
        net = torch.tanh(ctx[:, :HID])
        inp = F.relu(ctx[:, HID:])
        return fmap, net, inp


def _pair():
    torch.manual_seed(11)
    tm = TDroid()
    g = torch.Generator().manual_seed(31)
    sd = {k: (torch.randn(v.shape, generator=g) * 0.1
              if v.dtype.is_floating_point else v)
          for k, v in tm.state_dict().items()}
    tm.load_state_dict(sd)
    tm.eval()
    params = convert.convert_droid(
        {k: v.detach().numpy() for k, v in tm.state_keys().items()},
        CFG)
    return tm, params


def test_droid_features_equivalence():
    tm, params = _pair()
    rng = np.random.default_rng(12)
    frames = rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        want_f, want_n, want_i = tm.features(torch.from_numpy(frames))
    model = droid_mod.DroidNet(CFG)
    got_f, got_n, got_i = model.apply(
        params, jnp.asarray(frames),
        method=lambda m, x: m.features(x))
    np.testing.assert_allclose(
        np.asarray(got_f), want_f.permute(0, 2, 3, 1).numpy(),
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_n), want_n.permute(0, 2, 3, 1).numpy(),
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_i), want_i.permute(0, 2, 3, 1).numpy(),
        rtol=2e-4, atol=2e-5)


def test_droid_update_equivalence():
    tm, params = _pair()
    rng = np.random.default_rng(13)
    e, h8, w8 = 4, 4, 6
    net = rng.normal(size=(e, h8, w8, HID)).astype(np.float32)
    inp = rng.normal(size=(e, h8, w8, CTX)).astype(np.float32)
    corr = rng.normal(size=(e, h8, w8, CORP)).astype(np.float32)
    flow = rng.normal(size=(e, h8, w8, 4)).astype(np.float32)
    src = np.asarray([0, 0, 1, 2], np.int32)
    with torch.no_grad():
        wn, wd, ww, we, wu = tm.update(
            *(torch.from_numpy(a).permute(0, 3, 1, 2)
              for a in (net, inp, corr, flow)),
            torch.from_numpy(src).long(), 3)
    model = droid_mod.DroidNet(CFG)
    gn, gd, gw, ge, gu = model.apply(
        params, jnp.asarray(net), jnp.asarray(inp), jnp.asarray(corr),
        jnp.asarray(flow), jnp.asarray(src), 3,
        method=lambda m, *a: m.update(*a))
    for got, want in ((gn, wn), (gd, wd), (gw, ww), (gu, wu)):
        np.testing.assert_allclose(
            np.asarray(got), want.permute(0, 2, 3, 1).numpy(),
            rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ge), we.numpy(),
                               rtol=3e-4, atol=3e-5)


def test_droid_tree_matches_init():
    tm, params = _pair()
    ref = jax.eval_shape(lambda: droid_mod.DroidNet(CFG).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3))))
    got = {jax.tree_util.keystr(p): v.shape for p, v in
           jax.tree_util.tree_leaves_with_path(params)}
    want = {jax.tree_util.keystr(p): v.shape for p, v in
            jax.tree_util.tree_leaves_with_path(ref)}
    assert got == want


def test_droid_front_end_runs(tmp_path):
    """The learned front-end (pipeline/slam.py droid_track_video) runs
    end to end on a synthetic clip with converted (random) weights and
    writes a full c2w transformation sidecar."""
    from metric_depth_video_toolbox_tpu.io import sidecar
    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.pipeline import slam

    rng = np.random.default_rng(14)
    base = rng.integers(0, 255, (20, 30, 3), np.uint8)
    tex = np.kron(base, np.ones((2, 2, 1), np.uint8))
    frames = np.stack([tex[:32, i:i + 48] for i in range(6)])
    cv = str(tmp_path / "c.mkv")
    vio.save_rgb_video(frames, cv, 24)
    depth = rng.uniform(2.0, 6.0, (6, 32, 48)).astype(np.float32)
    dvp = str(tmp_path / "d.mkv")
    vio.save_depth_video(depth, dvp, 24, 20.0)

    _, params = _pair()
    out, res = slam.droid_track_video(
        cv, dvp, params=params, cfg=CFG, xfov=60.0, max_depth=20.0,
        window=4, radius=1, iters=2, gn_inner=1, work_long=48)
    tr = sidecar.load_transformations(out)
    assert tr.shape == (6, 4, 4)
    assert np.isfinite(tr).all() and np.isfinite(res)
    # frame 0 is the gauge anchor
    np.testing.assert_allclose(tr[0], np.eye(4), atol=1e-4)