"""RAFT-class recurrent optical flow (Flax).

Fills the role of torchvision's RAFT-large in the reference
(optical_flow.py:85-120: streamed frame-pair batches -> flow -> RGB
visualization video). Architecture: 1/8-resolution feature + context
encoders, all-pairs correlation pyramid, conv-GRU update operator with
correlation lookups, fixed refinement iterations as a lax.scan. Weights
convertible from torchvision via ``models.convert``.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import image as im


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    feat_dim: int = 128
    context_dim: int = 96
    hidden_dim: int = 96
    corr_levels: int = 3
    corr_radius: int = 3
    iters: int = 8
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


RAFT_TINY = RAFTConfig(feat_dim=32, context_dim=24, hidden_dim=24,
                       corr_levels=2, corr_radius=2, iters=4,
                       dtype="float32")


class Encoder(nn.Module):
    out_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype) / 255.0
        x = nn.relu(nn.Conv(self.out_dim // 2, (7, 7), strides=(2, 2),
                            dtype=self.dtype, name="c1")(x))
        x = nn.relu(nn.Conv(self.out_dim // 2, (3, 3), strides=(2, 2),
                            dtype=self.dtype, name="c2")(x))
        x = nn.relu(nn.Conv(self.out_dim, (3, 3), strides=(2, 2),
                            dtype=self.dtype, name="c3")(x))
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                       name="proj")(x)


def _corr_pyramid(f1, f2, levels):
    """All-pairs correlation (h*w, h, w) per level, average-pooled."""
    h, w, d = f1.shape
    f1f = f1.reshape(h * w, d)
    f2f = f2.reshape(h * w, d)
    corr = (f1f @ f2f.T / jnp.sqrt(d * 1.0)).reshape(h * w, h, w)
    pyr = [corr]
    for _ in range(levels - 1):
        c = pyr[-1]
        hh = (c.shape[1] // 2) * 2
        ww = (c.shape[2] // 2) * 2
        c = c[:, :hh, :ww].reshape(c.shape[0], hh // 2, 2, ww // 2, 2)
        pyr.append(c.mean(axis=(2, 4)))
    return pyr


def _lookup(pyr, coords, radius):
    """Sample correlation features around ``coords`` (h, w, 2) at every
    pyramid level -> (h, w, levels*(2r+1)^2)."""
    h, w = coords.shape[:2]
    n = h * w
    outs = []
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)  # (K, 2)
    for lvl, corr in enumerate(pyr):
        scale = 2.0 ** lvl
        c = coords.reshape(n, 2) / scale  # (n, 2)
        samp = c[:, None, :] + offs[None]  # (n, K, 2)

        def sample_one(cmap, pts):
            return im.bilinear_sample(cmap[..., None], pts)[..., 0]

        vals = jax.vmap(sample_one)(corr, samp)  # (n, K)
        outs.append(vals)
    return jnp.concatenate(outs, axis=-1).reshape(h, w, -1)


class ConvGRU(nn.Module):
    hidden: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (3, 3), dtype=self.dtype,
                               name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, (3, 3), dtype=self.dtype,
                               name="convr")(hx))
        q = nn.tanh(nn.Conv(self.hidden, (3, 3), dtype=self.dtype,
                            name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class RAFT(nn.Module):
    cfg: RAFTConfig = RAFT_TINY

    @nn.compact
    def __call__(self, img1, img2):
        """(H, W, 3) uint8 pair -> (H, W, 2) flow (pixels, full res).
        H, W must be multiples of 8."""
        c = self.cfg
        dt = c.compute_dtype
        fnet = Encoder(c.feat_dim, dt, name="fnet")
        f1 = fnet(img1).astype(jnp.float32)
        f2 = fnet(img2).astype(jnp.float32)
        ctx = Encoder(c.context_dim + c.hidden_dim, dt, name="cnet")(img1)
        hidden = nn.tanh(ctx[..., :c.hidden_dim].astype(jnp.float32))
        context = nn.relu(ctx[..., c.hidden_dim:]).astype(jnp.float32)

        pyr = _corr_pyramid(f1, f2, c.corr_levels)
        h, w = f1.shape[:2]
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        coords0 = jnp.stack([gx, gy], axis=-1)

        gru = ConvGRU(c.hidden_dim, dt, name="gru")
        enc_motion = nn.Conv(64, (3, 3), dtype=dt, name="motion")
        flow_head = nn.Sequential([
            nn.Conv(64, (3, 3), dtype=dt), nn.relu,
            nn.Conv(2, (3, 3), dtype=jnp.float32)])

        flow = jnp.zeros((h, w, 2), jnp.float32)
        for _ in range(c.iters):
            corr_feat = _lookup(pyr, coords0 + flow, c.corr_radius)
            minp = jnp.concatenate(
                [corr_feat.astype(dt), flow.astype(dt)], axis=-1)
            minp = nn.relu(enc_motion(minp))
            hidden = gru(hidden, jnp.concatenate(
                [minp, context.astype(dt)], axis=-1))
            flow = flow + flow_head(hidden.astype(dt))

        full = jax.image.resize(
            flow, (img1.shape[0], img1.shape[1], 2), "bilinear") * 8.0
        return full


def flow_to_rgb(flow, max_mag=None):
    """HSV flow visualization -> RGB uint8 (reference optical_flow.py
    writes a color-coded flow video)."""
    fx, fy = flow[..., 0], flow[..., 1]
    mag = jnp.sqrt(fx * fx + fy * fy)
    ang = jnp.arctan2(fy, fx)  # [-pi, pi]
    hue = (ang + jnp.pi) / (2 * jnp.pi)  # [0, 1]
    mmax = jnp.maximum(jnp.max(mag), 1e-6) if max_mag is None else max_mag
    val = jnp.clip(mag / mmax, 0.0, 1.0)
    # HSV -> RGB, S=1
    i = jnp.floor(hue * 6.0)
    f = hue * 6.0 - i
    p = jnp.zeros_like(val)
    q = val * (1.0 - f)
    t = val * f
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [val, q, p, p, t, val])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, val, val, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, val, val, q])
    return (jnp.stack([r, g, b], axis=-1) * 255).astype(jnp.uint8)
