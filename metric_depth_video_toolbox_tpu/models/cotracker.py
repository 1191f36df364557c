"""CoTracker3-offline point tracker (Flax), weight-convertible.

The reference's learned tracker is CoTracker3 offline via torch.hub
(track_points_in_video.py:266). This module implements that model
family's compute graph with the facebookresearch/co-tracker checkpoint
layout, so `models.convert.convert_cotracker3` can map a real
``cotracker3_offline`` state dict onto it:

- ``fnet``: the PIPs-style BasicEncoder (stride 4): 7x7/s2 stem with
  InstanceNorm (affine=False -> no params), four 2-deep residual layers
  (64 s1, 96 s2, 128 s2, 128 s2), every layer output bilinearly resized
  (align_corners) to stride-4 resolution, concatenated (416 ch) ->
  3x3 conv -> InstanceNorm -> relu -> 1x1 conv -> latent_dim (128).
  State-dict keys: fnet.conv1, fnet.layer{1..4}.{0,1}.{conv1,conv2,
  downsample.0}, fnet.conv2, fnet.conv3.
- multi-level patch correlation: an L-level average-pool feature
  pyramid; per track a (2r+1)^2 support patch sampled at the query
  point/frame, correlated against the patch at the current estimate in
  every frame -> a (2r+1)^2 x (2r+1)^2 volume per level, flattened
  through ``corr_mlp`` (Mlp fc1/fc2 -> corr_emb_dim per level).
- ``updateformer``: EfficientUpdateFormer — input Linear, learnable
  virtual-track tokens (upstream param name ``virual_tracks`` [sic]),
  interleaved time blocks (self-attention over frames per track) and
  space rounds (virtual<-point cross-attn, virtual self-attn,
  point<-virtual cross-attn over tracks per frame), then flow_head (2)
  + vis_conf_head (2) Linears. Attention modules use the cotracker
  blocks.py layout: to_q / to_kv / to_out with qkv_bias on q/kv and
  tanh-approx GELU MLPs (fc1/fc2), LayerNorm eps 1e-6.

Iterative inference: coords start at the query position in every frame;
each iteration feeds [vis, conf, per-level corr embeddings,
sinusoidal 2D flow embedding (C=64, coords concatenated)] through the
transformer and applies the predicted deltas. A parameter-free 1D
sincos time embedding is added to the tokens after the input transform
(time attention is otherwise permutation-invariant).

Documented deviations from upstream (parameter-neutral, noted for the
converter's users): correlation volumes are scaled by 1/sqrt(C); the
attention mask for padded tracks is handled by the engine (invalid
tracks are dropped on output) rather than inside attention.

TPU mapping: the whole clip is one jitted program — the encoder is DP
over frames, patch sampling is batched gathers, and the transformer
alternates (N, T) / (T, N+V) attention, both MXU-shaped. Tracks are
processed in fixed-size chunks so N is static.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from metric_depth_video_toolbox_tpu.models.norm import InstanceNorm
from metric_depth_video_toolbox_tpu.ops import image as im


@dataclasses.dataclass(frozen=True)
class CoTracker3Config:
    latent_dim: int = 128
    stride: int = 4
    corr_radius: int = 3
    corr_levels: int = 4
    corr_mlp_hidden: int = 384
    corr_emb_dim: int = 256
    hidden_size: int = 384
    num_heads: int = 8
    time_depth: int = 3
    space_depth: int = 3
    num_virtual_tracks: int = 64
    mlp_ratio: float = 4.0
    flow_embed_dim: int = 64  # get_2d_embedding C
    iters: int = 4
    model_resolution: tuple = (384, 512)  # (H, W), upstream offline res

    @property
    def window(self):
        return 2 * self.corr_radius + 1

    @property
    def input_dim(self):
        # [vis, conf] + L * corr_emb + (2*C + 2) flow embedding
        return 2 + self.corr_levels * self.corr_emb_dim \
            + 2 * self.flow_embed_dim + 2


COTRACKER3 = CoTracker3Config()
COTRACKER3_TINY = CoTracker3Config(
    latent_dim=8, corr_radius=1, corr_levels=2, corr_mlp_hidden=16,
    corr_emb_dim=12, hidden_size=16, num_heads=2, time_depth=2,
    space_depth=2, num_virtual_tracks=4, flow_embed_dim=8, iters=2,
    model_resolution=(48, 64))


class ResBlock(nn.Module):
    """PIPs residual block: conv-IN-relu x2, 1x1+IN downsample path when
    strided/reshaped, relu AFTER the sum. Convs keep torch's default
    bias=True (unlike torchvision RAFT)."""
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), name="conv1")(x)
        y = nn.relu(InstanceNorm(name="norm1")(y))
        y = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(y)
        y = nn.relu(InstanceNorm(name="norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.out:
            x = nn.Conv(self.out, (1, 1), strides=(self.stride,) * 2,
                        padding="VALID", name="down_conv")(x)
            x = InstanceNorm(name="down_norm")(x)
        return nn.relu(x + y)


def _resize_ac(x, hw):
    """Bilinear resize with align_corners=True (torch F.interpolate in
    the upstream encoder) on (B, H, W, C)."""
    b, h, w, c = x.shape
    oh, ow = hw
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    gx, gy = jnp.meshgrid(xs, ys)
    grid = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
    out = jax.vmap(lambda img: im.bilinear_sample(img, grid))(x)
    return out.reshape(b, oh, ow, c)


class BasicEncoder(nn.Module):
    """The cotracker/PIPs stride-4 multi-scale feature encoder."""
    cfg: CoTracker3Config

    @nn.compact
    def __call__(self, x):
        """(B, H, W, 3) in [-1, 1] -> (B, H/4, W/4, latent_dim)."""
        d = self.cfg.latent_dim
        h, w = x.shape[1:3]
        dims = (d // 2, (d // 4) * 3, d, d)
        x = nn.Conv(d // 2, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), name="conv1")(x)
        x = nn.relu(InstanceNorm(name="norm1")(x))
        outs = []
        for li, (width, stride) in enumerate(zip(dims, (1, 2, 2, 2))):
            x = ResBlock(width, stride, name=f"layer{li + 1}_0")(x)
            x = ResBlock(width, 1, name=f"layer{li + 1}_1")(x)
            outs.append(x)
        # every scale (layer1 is at stride 2; layers 2-4 at 4/8/16) is
        # resized to the output stride before the merge convs
        hw = (h // self.cfg.stride, w // self.cfg.stride)
        cat = jnp.concatenate([_resize_ac(o, hw) for o in outs], axis=-1)
        y = nn.Conv(2 * d, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(cat)
        y = nn.relu(InstanceNorm(name="norm2")(y))
        return nn.Conv(d, (1, 1), padding="VALID", name="conv3")(y)


class Attention(nn.Module):
    """cotracker blocks.py Attention: to_q/to_kv/to_out, scale by
    dim_head^-0.5."""
    heads: int

    @nn.compact
    def __call__(self, x, context=None):
        """x (..., S, C) queries; context (..., S2, C) keys/values."""
        c = x.shape[-1]
        ctx = x if context is None else context
        dim_head = c // self.heads
        q = nn.Dense(c, name="to_q")(x)
        kv = nn.Dense(2 * c, name="to_kv")(ctx)
        k, v = kv[..., :c], kv[..., c:]

        def split(t):
            return t.reshape(t.shape[:-1] + (self.heads, dim_head))
        q, k, v = split(q), split(k), split(v)
        att = jnp.einsum("...qhd,...khd->...hqk", q, k) * dim_head ** -0.5
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("...hqk,...khd->...qhd", att, v)
        o = o.reshape(o.shape[:-2] + (c,))
        return nn.Dense(c, name="to_out")(o)


class Mlp(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, name="fc1")(x)
        y = nn.gelu(y, approximate=True)
        return nn.Dense(x.shape[-1], name="fc2")(y)


class AttnBlock(nn.Module):
    heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        x = x + Attention(self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x))
        return x + Mlp(int(x.shape[-1] * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x))


class CrossAttnBlock(nn.Module):
    heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x, context):
        x = x + Attention(self.heads, name="cross_attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x),
            context=nn.LayerNorm(epsilon=1e-6, name="norm_context")(
                context))
        return x + Mlp(int(x.shape[-1] * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x))


def sincos_1d(n, dim):
    """Parameter-free 1D sincos positional embedding (n, dim)."""
    half = dim // 2
    freq = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / max(half, 1))
    ang = jnp.arange(n)[:, None] * freq[None]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if emb.shape[-1] < dim:
        emb = jnp.pad(emb, ((0, 0), (0, dim - emb.shape[-1])))
    return emb


def get_2d_embedding(xy, c):
    """PIPs get_2d_embedding(cat_coords=True): (..., 2) -> (..., 2c+2)."""
    div = jnp.arange(0, c, 2, dtype=jnp.float32) * (1000.0 / c)
    x = xy[..., 0:1] * div
    y = xy[..., 1:2] * div
    pe_x = jnp.stack([jnp.sin(x), jnp.cos(x)], axis=-1).reshape(
        xy.shape[:-1] + (c,))
    pe_y = jnp.stack([jnp.sin(y), jnp.cos(y)], axis=-1).reshape(
        xy.shape[:-1] + (c,))
    return jnp.concatenate([xy, pe_x, pe_y], axis=-1)


class EfficientUpdateFormer(nn.Module):
    cfg: CoTracker3Config

    @nn.compact
    def __call__(self, x):
        """x: (N, T, input_dim) -> (N, T, 4) deltas [dx, dy, dvis, dconf]."""
        c = self.cfg
        n, t, _ = x.shape
        tokens = nn.Dense(c.hidden_size, name="input_transform")(x)
        tokens = tokens + sincos_1d(t, c.hidden_size)[None]
        virt = self.param("virtual_tracks",
                          nn.initializers.normal(1.0),
                          (c.num_virtual_tracks, 1, c.hidden_size))
        tokens = jnp.concatenate(
            [tokens, jnp.broadcast_to(
                virt, (c.num_virtual_tracks, t, c.hidden_size))], axis=0)
        every = max(c.time_depth // c.space_depth, 1)
        j = 0
        for i in range(c.time_depth):
            tokens = AttnBlock(c.num_heads, c.mlp_ratio,
                               name=f"time_blocks_{i}")(tokens)
            if j < c.space_depth and i % every == 0:
                sp = tokens.transpose(1, 0, 2)  # (T, N+V, C)
                pts, virt_t = sp[:, :n], sp[:, n:]
                virt_t = CrossAttnBlock(
                    c.num_heads, c.mlp_ratio,
                    name=f"space_virtual2point_blocks_{j}")(virt_t, pts)
                virt_t = AttnBlock(
                    c.num_heads, c.mlp_ratio,
                    name=f"space_virtual_blocks_{j}")(virt_t)
                pts = CrossAttnBlock(
                    c.num_heads, c.mlp_ratio,
                    name=f"space_point2virtual_blocks_{j}")(pts, virt_t)
                tokens = jnp.concatenate([pts, virt_t],
                                         axis=1).transpose(1, 0, 2)
                j += 1
        pts = tokens[:n]
        flow = nn.Dense(2, name="flow_head")(pts)
        vis_conf = nn.Dense(2, name="vis_conf_head")(pts)
        return jnp.concatenate([flow, vis_conf], axis=-1)


def _patch_offsets(radius):
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)  # (P, 2)


def _sample_patches(fmap, coords, radius):
    """fmap (h, w, C), coords (N, 2) feature-scale -> (N, P, C) patches
    (zero fill outside)."""
    offs = _patch_offsets(radius)  # (P, 2)
    pts = coords[:, None, :] + offs[None]  # (N, P, 2)
    return im.bilinear_sample(fmap, pts)


class CoTracker3(nn.Module):
    cfg: CoTracker3Config

    @nn.compact
    def __call__(self, video, queries, iters=None):
        """video (T, H, W, 3) float [0, 255]; queries (N, 3) = (t, x, y)
        pixels. Returns dict: coords (T, N, 2) pixels, vis (T, N) and
        conf (T, N) probabilities."""
        c = self.cfg
        iters = iters or c.iters
        t, h, w = video.shape[:3]
        n = queries.shape[0]

        x = 2.0 * (video / 255.0) - 1.0
        fmaps = BasicEncoder(c, name="fnet")(x)  # (T, h4, w4, D)
        pyramid = [fmaps]
        for _ in range(c.corr_levels - 1):
            f = pyramid[-1]
            hh, ww = (f.shape[1] // 2) * 2, (f.shape[2] // 2) * 2
            f = f[:, :hh, :ww].reshape(t, hh // 2, 2, ww // 2, 2,
                                       f.shape[-1]).mean((2, 4))
            pyramid.append(f)

        corr_fc1 = nn.Dense(c.corr_mlp_hidden, name="corr_mlp_fc1")
        corr_fc2 = nn.Dense(c.corr_emb_dim, name="corr_mlp_fc2")

        def corr_mlp(v):
            # upstream corr_mlp is a timm Mlp with the default (exact) GELU
            return corr_fc2(nn.gelu(corr_fc1(v), approximate=False))

        updateformer = EfficientUpdateFormer(c, name="updateformer")

        q_t = queries[:, 0].astype(jnp.int32)
        q_xy = queries[:, 1:] / c.stride  # feature scale

        # per-track support patches at the query frame, each level
        support = []
        for li, f in enumerate(pyramid):
            # gather each track's query-frame feature map row-block via
            # one frame gather (t is small; N-aligned take)
            def samp(qt, qxy):
                return _sample_patches(f[qt], qxy[None] / (2 ** li),
                                       c.corr_radius)[0]
            support.append(jax.vmap(samp)(q_t, q_xy))  # (N, P, D)

        coords = jnp.broadcast_to(q_xy[None], (t, n, 2))
        vis = jnp.zeros((t, n))
        conf = jnp.zeros((t, n))
        d = c.latent_dim

        for _ in range(iters):
            embs = []
            for li, f in enumerate(pyramid):
                patches = jax.vmap(
                    lambda fm, xy, _li=li: _sample_patches(
                        fm, xy / (2 ** _li), c.corr_radius))(
                    f, coords)  # (T, N, P, D)
                vol = jnp.einsum("tnpc,nqc->tnpq", patches,
                                 support[li]) / jnp.sqrt(d * 1.0)
                embs.append(corr_mlp(vol.reshape(t, n, -1)))
            flows = coords - q_xy[None]
            inp = jnp.concatenate(
                [vis[..., None], conf[..., None]] + embs
                + [get_2d_embedding(flows, c.flow_embed_dim)], axis=-1)
            delta = updateformer(
                inp.transpose(1, 0, 2)).transpose(1, 0, 2)  # (T, N, 4)
            coords = coords + delta[..., :2]
            vis = vis + delta[..., 2]
            conf = conf + delta[..., 3]

        return {"coords": coords * c.stride,
                "vis": jax.nn.sigmoid(vis),
                "conf": jax.nn.sigmoid(conf)}


class CoTracker3Engine:
    """Clip driver: resizes to the model resolution, chunks tracks to a
    fixed width (static shapes; space attention spans each chunk + the
    virtual tokens, the upstream query-batching practice), and returns
    pixel-space trajectories + visibility at the input resolution."""

    def __init__(self, cfg=None, params=None, iters=None, track_chunk=256,
                 vis_threshold=0.6, rng_seed=0):
        self.cfg = cfg or COTRACKER3
        self.model = CoTracker3(self.cfg)
        self.iters = iters or self.cfg.iters
        self.track_chunk = track_chunk
        self.vis_threshold = vis_threshold
        self._params = params
        self._rng = jax.random.PRNGKey(rng_seed)
        self._jit_cache = {}

    def _run(self, t):
        key = t
        if key not in self._jit_cache:

            @jax.jit
            def run(params, video, queries):
                out = self.model.apply(params, video, queries,
                                       iters=self.iters)
                return out["coords"], out["vis"] * out["conf"]

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def track_clip(self, frames_u8, pts, valid):
        """frames_u8 (T, H, W, 3) uint8, pts (N, 2) pixel queries in
        frame 0, valid (N,) -> traj (T, N, 2), vis (T, N) floats."""
        from metric_depth_video_toolbox_tpu.utils.host import to_host
        t, h, w = frames_u8.shape[:3]
        mh, mw = self.cfg.model_resolution
        video = jax.image.resize(
            jnp.asarray(frames_u8, jnp.float32), (t, mh, mw, 3),
            "bilinear")
        sx, sy = mw / w, mh / h
        n = pts.shape[0]
        chunk = min(self.track_chunk, n)
        pad = (-n) % chunk
        q = np.concatenate([np.asarray(pts, np.float32),
                            np.zeros((pad, 2), np.float32)])
        queries = np.concatenate(
            [np.zeros((n + pad, 1), np.float32),
             q * np.asarray([[sx, sy]], np.float32)], axis=1)

        if self._params is None:
            self._params = jax.jit(self.model.init)(
                self._rng, video, jnp.asarray(queries[:chunk]))

        run = self._run(t)
        trajs, viss = [], []
        for s in range(0, n + pad, chunk):
            cc, vv = run(self._params, video,
                         jnp.asarray(queries[s:s + chunk]))
            trajs.append(to_host(cc))
            viss.append(to_host(vv))
        traj = np.concatenate(trajs, axis=1)[:, :n]
        vis = np.concatenate(viss, axis=1)[:, :n]
        traj = traj / np.asarray([[[sx, sy]]], np.float32)
        okrow = (vis > self.vis_threshold).astype(np.float32)
        return traj, okrow * np.asarray(valid, np.float32)[None]
