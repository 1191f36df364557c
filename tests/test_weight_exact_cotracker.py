"""CoTracker3 weight-exactness: our Flax CoTracker3 with converted
weights must reproduce the cotracker3_offline torch graph numerically.

The upstream repo (facebookresearch/co-tracker) is not installed in this
image, so the ground truth is a torch re-implementation of the
cotracker3_offline op order with module names matching the published
checkpoint layout exactly (``convert_cotracker3`` consumes this state
dict the same way it would consume the real ``scaled_offline.pth``):

- PIPs BasicEncoder: 7x7/s2 conv (bias) -> InstanceNorm(affine=False)
  -> relu, layers 1-4 of two residual blocks (64 s1 / 96 s2 / 128 s2 /
  128 s2 at full scale; scaled-down dims here), all four outputs
  bilinearly interpolated (align_corners=True) to stride-4 resolution,
  concat -> 3x3 conv -> IN -> relu -> 1x1 conv
- L-level avg-pool-2 feature pyramid; per-track (2r+1)^2 support patch
  at the query point/frame; per-iteration (2r+1)^2 patch at the current
  estimate; full patch-pair correlation volume / sqrt(C) -> corr Mlp
  (fc1 -> exact GELU -> fc2)
- transformer input [vis, conf, corr embs, sincos 2D flow embedding
  (coords concatenated first, PIPs get_2d_embedding)], Linear input
  transform + parameter-free sincos time embedding, virtual-track
  tokens, interleaved time self-attn / (virtual<-point, virtual,
  point<-virtual) space rounds, flow + vis_conf linear heads
- attention: to_q/to_kv/to_out with dim_head^-0.5 scaling, LayerNorm
  eps 1e-6, tanh-GELU MLPs (fc1/fc2)
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import cotracker as ct


@pytest.fixture(autouse=True)
def _precise_matmul():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


CFG = ct.COTRACKER3_TINY


def _res_block(cin, cout, stride):
    class Blk(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1)
            self.norm1 = tnn.InstanceNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1)
            self.norm2 = tnn.InstanceNorm2d(cout)
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride),
                    tnn.InstanceNorm2d(cout))
            else:
                self.downsample = None

        def forward(self, x):
            y = F.relu(self.norm1(self.conv1(x)))
            y = F.relu(self.norm2(self.conv2(y)))
            if self.downsample is not None:
                x = self.downsample(x)
            return F.relu(x + y)
    return Blk()


class TBasicEncoder(tnn.Module):
    def __init__(self, d, stride):
        super().__init__()
        self.stride = stride
        dims = (d // 2, (d // 4) * 3, d, d)
        self.conv1 = tnn.Conv2d(3, d // 2, 7, 2, 3)
        self.norm1 = tnn.InstanceNorm2d(d // 2)
        cin = d // 2
        for li, (width, s) in enumerate(zip(dims, (1, 2, 2, 2))):
            setattr(self, f"layer{li + 1}", tnn.Sequential(
                _res_block(cin, width, s), _res_block(width, width, 1)))
            cin = width
        self.conv2 = tnn.Conv2d(sum(dims), 2 * d, 3, 1, 1)
        self.norm2 = tnn.InstanceNorm2d(2 * d)
        self.conv3 = tnn.Conv2d(2 * d, d, 1)

    def forward(self, x):
        h, w = x.shape[-2:]
        x = F.relu(self.norm1(self.conv1(x)))
        outs = []
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
            outs.append(x)
        hw = (h // self.stride, w // self.stride)
        cat = torch.cat([F.interpolate(o, hw, mode="bilinear",
                                       align_corners=True) for o in outs],
                        dim=1)
        return self.conv3(F.relu(self.norm2(self.conv2(cat))))


class TMlp(tnn.Module):
    def __init__(self, dim, hidden, out=None, gelu="tanh"):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, out or dim)
        self.gelu = gelu

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x), approximate=self.gelu))


class TAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim)
        self.to_kv = tnn.Linear(dim, 2 * dim)
        self.to_out = tnn.Linear(dim, dim)

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, s, c = x.shape
        dh = c // self.heads
        q = self.to_q(x).reshape(b, s, self.heads, dh)
        kv = self.to_kv(ctx)
        k = kv[..., :c].reshape(b, -1, self.heads, dh)
        v = kv[..., c:].reshape(b, -1, self.heads, dh)
        att = torch.einsum("bqhd,bkhd->bhqk", q, k) * dh ** -0.5
        att = att.softmax(dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, c)
        return self.to_out(o)


class TAttnBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TCrossAttnBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.norm_context = tnn.LayerNorm(dim, eps=1e-6)
        self.cross_attn = TAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))

    def forward(self, x, context):
        x = x + self.cross_attn(self.norm1(x),
                                context=self.norm_context(context))
        return x + self.mlp(self.norm2(x))


def _sincos_time(t, dim):
    half = dim // 2
    freq = np.exp(-np.log(10000.0) * np.arange(half) / max(half, 1))
    ang = np.arange(t)[:, None] * freq[None]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    if emb.shape[-1] < dim:
        emb = np.pad(emb, ((0, 0), (0, dim - emb.shape[-1])))
    return torch.tensor(emb, dtype=torch.float32)


class TUpdateFormer(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.c = c
        self.input_transform = tnn.Linear(c.input_dim, c.hidden_size)
        # upstream param name is literally "virual_tracks"
        self.virual_tracks = tnn.Parameter(
            torch.randn(1, c.num_virtual_tracks, 1, c.hidden_size))
        self.time_blocks = tnn.ModuleList(
            [TAttnBlock(c.hidden_size, c.num_heads, c.mlp_ratio)
             for _ in range(c.time_depth)])
        self.space_virtual_blocks = tnn.ModuleList(
            [TAttnBlock(c.hidden_size, c.num_heads, c.mlp_ratio)
             for _ in range(c.space_depth)])
        self.space_point2virtual_blocks = tnn.ModuleList(
            [TCrossAttnBlock(c.hidden_size, c.num_heads, c.mlp_ratio)
             for _ in range(c.space_depth)])
        self.space_virtual2point_blocks = tnn.ModuleList(
            [TCrossAttnBlock(c.hidden_size, c.num_heads, c.mlp_ratio)
             for _ in range(c.space_depth)])
        self.flow_head = tnn.Linear(c.hidden_size, 2)
        self.vis_conf_head = tnn.Linear(c.hidden_size, 2)

    def forward(self, x):
        c = self.c
        n, t, _ = x.shape
        tokens = self.input_transform(x)
        tokens = tokens + _sincos_time(t, c.hidden_size)[None]
        virt = self.virual_tracks[0, :, 0][:, None].expand(
            c.num_virtual_tracks, t, c.hidden_size)
        tokens = torch.cat([tokens, virt], dim=0)
        every = max(c.time_depth // c.space_depth, 1)
        j = 0
        for i, tb in enumerate(self.time_blocks):
            tokens = tb(tokens)
            if j < c.space_depth and i % every == 0:
                sp = tokens.permute(1, 0, 2)
                pts, vt = sp[:, :n], sp[:, n:]
                vt = self.space_virtual2point_blocks[j](vt, pts)
                vt = self.space_virtual_blocks[j](vt)
                pts = self.space_point2virtual_blocks[j](pts, vt)
                tokens = torch.cat([pts, vt], dim=1).permute(1, 0, 2)
                j += 1
        pts = tokens[:n]
        return torch.cat([self.flow_head(pts), self.vis_conf_head(pts)],
                         dim=-1)


def _bsample(img, xy):
    """img (C, H, W), xy (..., 2) pixel coords -> (..., C), zero fill."""
    h, w = img.shape[-2:]
    x, y = xy[..., 0], xy[..., 1]
    x0 = torch.floor(x).long()
    y0 = torch.floor(y).long()
    fx, fy = x - x0, y - y0

    def tap(yi, xi):
        ok = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).float()
        v = img[:, yi.clamp(0, h - 1), xi.clamp(0, w - 1)]
        return v * ok[None]

    v00, v01 = tap(y0, x0), tap(y0, x0 + 1)
    v10, v11 = tap(y0 + 1, x0), tap(y0 + 1, x0 + 1)
    out = ((1 - fy)[None] * ((1 - fx)[None] * v00 + fx[None] * v01)
           + fy[None] * ((1 - fx)[None] * v10 + fx[None] * v11))
    return out.permute(*range(1, out.dim()), 0)


def _patch(img, center, radius):
    """img (C, H, W), center (2,) -> (P, C) patch, offsets x-fastest."""
    r = torch.arange(-radius, radius + 1, dtype=torch.float32)
    dy, dx = torch.meshgrid(r, r, indexing="ij")
    pts = center[None] + torch.stack(
        [dx.reshape(-1), dy.reshape(-1)], dim=-1)
    return _bsample(img, pts)


def _get_2d_embedding(xy, c):
    div = torch.arange(0, c, 2, dtype=torch.float32) * (1000.0 / c)
    x = xy[..., 0:1] * div
    y = xy[..., 1:2] * div
    pe_x = torch.stack([x.sin(), x.cos()], dim=-1).reshape(
        xy.shape[:-1] + (c,))
    pe_y = torch.stack([y.sin(), y.cos()], dim=-1).reshape(
        xy.shape[:-1] + (c,))
    return torch.cat([xy, pe_x, pe_y], dim=-1)


class TCoTracker3(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.c = c
        self.fnet = TBasicEncoder(c.latent_dim, c.stride)
        self.corr_mlp = TMlp(c.window ** 4, c.corr_mlp_hidden,
                             c.corr_emb_dim, gelu="none")
        self.updateformer = TUpdateFormer(c)

    def forward(self, video, queries, iters):
        c = self.c
        t, h, w, _ = video.shape
        n = queries.shape[0]
        x = (2.0 * (video / 255.0) - 1.0).permute(0, 3, 1, 2)
        f = self.fnet(x)
        pyramid = [f]
        for _ in range(c.corr_levels - 1):
            g = pyramid[-1]
            hh, ww = (g.shape[-2] // 2) * 2, (g.shape[-1] // 2) * 2
            pyramid.append(F.avg_pool2d(g[..., :hh, :ww], 2, 2))
        qt = queries[:, 0].long()
        qxy = queries[:, 1:] / c.stride
        support = []
        for li, fp in enumerate(pyramid):
            support.append(torch.stack(
                [_patch(fp[qt[i]], qxy[i] / 2 ** li, c.corr_radius)
                 for i in range(n)]))
        coords = qxy[None].repeat(t, 1, 1)
        vis = torch.zeros(t, n)
        conf = torch.zeros(t, n)
        for _ in range(iters):
            embs = []
            for li, fp in enumerate(pyramid):
                patch = torch.stack([torch.stack(
                    [_patch(fp[ti], coords[ti, i] / 2 ** li, c.corr_radius)
                     for i in range(n)]) for ti in range(t)])
                vol = torch.einsum("tnpc,nqc->tnpq", patch, support[li])
                vol = vol / math.sqrt(c.latent_dim)
                embs.append(self.corr_mlp(vol.reshape(t, n, -1)))
            flows = coords - qxy[None]
            inp = torch.cat([vis[..., None], conf[..., None]] + embs
                            + [_get_2d_embedding(flows, c.flow_embed_dim)],
                            dim=-1)
            delta = self.updateformer(inp.permute(1, 0, 2)).permute(1, 0, 2)
            coords = coords + delta[..., :2]
            vis = vis + delta[..., 2]
            conf = conf + delta[..., 3]
        return (coords * c.stride, torch.sigmoid(vis), torch.sigmoid(conf))


def test_cotracker3_weight_exact():
    torch.manual_seed(0)
    tm = TCoTracker3(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    icfg = convert.cotracker3_config_from_state_dict(
        sd, flow_embed_dim=CFG.flow_embed_dim, num_heads=CFG.num_heads,
        iters=CFG.iters, model_resolution=CFG.model_resolution)
    assert icfg.latent_dim == CFG.latent_dim
    assert icfg.corr_radius == CFG.corr_radius
    assert icfg.corr_levels == CFG.corr_levels
    assert icfg.hidden_size == CFG.hidden_size
    assert icfg.time_depth == CFG.time_depth
    assert icfg.space_depth == CFG.space_depth
    assert icfg.num_virtual_tracks == CFG.num_virtual_tracks

    params = convert.convert_cotracker3(sd)
    rng = np.random.default_rng(0)
    video = rng.uniform(0, 255, (4, 48, 64, 3)).astype(np.float32)
    queries = np.array([[0, 10.3, 12.7], [1, 30.1, 20.4], [0, 50.0, 40.2]],
                       np.float32)

    with torch.no_grad():
        t_coords, t_vis, t_conf = tm(torch.tensor(video),
                                     torch.tensor(queries), CFG.iters)

    model = ct.CoTracker3(icfg)
    out = model.apply(params, jnp.asarray(video), jnp.asarray(queries),
                      iters=CFG.iters)

    np.testing.assert_allclose(np.asarray(out["coords"]),
                               t_coords.numpy(), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["vis"]), t_vis.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["conf"]), t_conf.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_cotracker3_encoder_weight_exact():
    """The encoder alone, tighter tolerance (catches conv/norm/resize
    order bugs without the transformer's error accumulation)."""
    torch.manual_seed(1)
    tm = TCoTracker3(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert.convert_cotracker3(sd)

    rng = np.random.default_rng(1)
    video = rng.uniform(0, 255, (2, 48, 64, 3)).astype(np.float32)
    x = 2.0 * (torch.tensor(video) / 255.0) - 1.0
    with torch.no_grad():
        t_f = tm.fnet(x.permute(0, 3, 1, 2)).numpy()

    enc = ct.BasicEncoder(CFG)
    j_f = enc.apply({"params": params["params"]["fnet"]},
                    jnp.asarray(2.0 * (video / 255.0) - 1.0))
    np.testing.assert_allclose(np.asarray(j_f).transpose(0, 3, 1, 2),
                               t_f, rtol=1e-4, atol=1e-4)
