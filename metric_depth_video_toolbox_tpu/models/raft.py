"""RAFT recurrent optical flow (Flax), torchvision-``raft_large`` layout.

Fills the role of torchvision's RAFT-large in the reference
(optical_flow.py:85-120: streamed frame-pair batches -> flow -> RGB
visualization video). The architecture mirrors torchvision's
``raft_large`` op order exactly — residual feature/context encoders
(InstanceNorm / BatchNorm), 4-level all-pairs correlation pyramid with
radius-4 lookups, separable (1x5)+(5x1) conv-GRU update block, and
convex-upsampling mask head — so the published checkpoint converts
weight-exact via ``models.convert.convert_raft`` (numerical forward
equivalence proven against a torch re-implementation of the torchvision
graph in tests/test_weight_exact_raft.py).

TPU mapping: the all-pairs correlation volume is one big batched matmul
(MXU); lookups are gathers over a (B*H*W, h, w) volume; the GRU
iterations run as a Python loop over a fixed iteration count (static
unroll — every iteration is the same fused XLA computation).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    # encoder widths, torchvision raft_large: stem 64, layers (64, 96,
    # 128), final projection 256 (feature) / hidden+context (context)
    stem: int = 64
    layers: tuple = (64, 96, 128)
    feat_dim: int = 256
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    # motion encoder widths (torchvision MotionEncoder)
    motion_corr: tuple = (256, 192)
    motion_flow: tuple = (128, 64)
    motion_out: int = 128  # includes the 2 appended raw-flow channels
    flow_head_hidden: int = 256
    iters: int = 12
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


RAFT_LARGE = RAFTConfig()
RAFT_TINY = RAFTConfig(stem=8, layers=(8, 12, 16), feat_dim=32,
                       hidden_dim=16, context_dim=16, corr_levels=2,
                       corr_radius=2, motion_corr=(32, 24),
                       motion_flow=(16, 8), motion_out=16,
                       flow_head_hidden=32, iters=4, dtype="float32")


from metric_depth_video_toolbox_tpu.models.norm import (  # noqa: E402
    EvalBatchNorm, InstanceNorm)


def _norm(kind, dim, name):
    if kind == "instance":
        return InstanceNorm(name=name)
    if kind == "batch":
        return EvalBatchNorm(dim, name=name)
    return lambda x: x


class ConvNormRelu(nn.Module):
    """torchvision Conv2dNormActivation: conv (bias only when no norm)
    -> norm -> relu."""
    out: int
    kernel: tuple
    norm: str  # 'instance' | 'batch' | 'none'
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        pad = ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))
        x = nn.Conv(self.out, k, strides=(self.stride, self.stride),
                    padding=pad, use_bias=self.norm == "none",
                    dtype=self.dtype, name="conv")(x)
        x = _norm(self.norm, self.out, "norm")(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    """torchvision RAFT ResidualBlock: two conv-norm-relu, 1x1 downsample
    path when strided, relu AFTER the sum."""
    out: int
    norm: str
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvNormRelu(self.out, (3, 3), self.norm, self.stride,
                         self.dtype, name="convnormrelu1")(x)
        y = ConvNormRelu(self.out, (3, 3), self.norm, 1, self.dtype,
                         name="convnormrelu2")(y)
        if self.stride != 1 or x.shape[-1] != self.out:
            x = nn.Conv(self.out, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype,
                        name="down_conv")(x)
            x = _norm(self.norm, self.out, "down_norm")(x)
        return nn.relu(x + y)


class RAFTEncoder(nn.Module):
    """Feature (InstanceNorm) / context (BatchNorm) encoder: 7x7 s2
    stem, three 2-block layers (s1, s2, s2 => 1/8 res), 1x1 out conv."""
    cfg: RAFTConfig
    out_dim: int
    norm: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = ConvNormRelu(c.stem, (7, 7), self.norm, 2, self.dtype,
                         name="stem")(x)
        for li, (width, stride) in enumerate(
                zip(c.layers, (1, 2, 2))):
            x = ResidualBlock(width, self.norm, stride, self.dtype,
                              name=f"layer{li + 1}_0")(x)
            x = ResidualBlock(width, self.norm, 1, self.dtype,
                              name=f"layer{li + 1}_1")(x)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                       name="proj")(x)


def _avg_pool2(x):
    hh = (x.shape[1] // 2) * 2
    ww = (x.shape[2] // 2) * 2
    x = x[:, :hh, :ww]
    return x.reshape(x.shape[0], hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))


def _grid_sample_zeros(img, xs, ys):
    """Bilinear sample img (N, h, w) at float pixel coords with zeros
    padding (torchvision grid_sample align_corners=True semantics: the
    coords ARE pixel indices; out-of-range contributions vanish)."""
    h, w = img.shape[1], img.shape[2]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0

    def tap(yi, xi, wgt):
        ok = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        v = jnp.take_along_axis(
            img.reshape(img.shape[0], -1), yc * w + xc, axis=1)
        return v * wgt * ok.astype(img.dtype)

    return (tap(y0, x0, (1 - wy) * (1 - wx))
            + tap(y0, x0 + 1, (1 - wy) * wx)
            + tap(y0 + 1, x0, wy * (1 - wx))
            + tap(y0 + 1, x0 + 1, wy * wx))


def _corr_pyramid(f1, f2, levels):
    """All-pairs correlation -> (B*H*W, h_l, w_l) per level.
    f1, f2: (B, H, W, C) float32."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bxc,byc->bxy", f1.reshape(b, h * w, c),
                      f2.reshape(b, h * w, c),
                      precision=jax.lax.Precision.HIGHEST)
    corr = corr / jnp.sqrt(jnp.asarray(c, jnp.float32))
    pyr = [corr.reshape(b * h * w, h, w)]
    for _ in range(levels - 1):
        pyr.append(_avg_pool2(pyr[-1]))
    return pyr


def _lookup(pyr, coords, radius):
    """Correlation features around ``coords`` (B, H, W, 2 as x,y) ->
    (B, H, W, levels*(2r+1)^2). Neighbor order matches torchvision:
    outer index = x offset, inner = y offset (delta = meshgrid(di, dj)
    added to (x, y) centroids)."""
    b, h, w = coords.shape[:3]
    n = b * h * w
    r = np.arange(-radius, radius + 1, dtype=np.float32)
    k = len(r)
    dx = np.repeat(r, k)  # outer: x offset
    dy = np.tile(r, k)    # inner: y offset
    outs = []
    cx = coords[..., 0].reshape(n, 1)
    cy = coords[..., 1].reshape(n, 1)
    for lvl, corr in enumerate(pyr):
        s = 2.0 ** lvl
        xs = cx / s + dx[None]
        ys = cy / s + dy[None]
        outs.append(_grid_sample_zeros(corr, xs, ys))
    return jnp.concatenate(outs, axis=-1).reshape(b, h, w, -1)


class ConvGRU(nn.Module):
    hidden: int
    kernel: tuple
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, h, x):
        k = self.kernel
        pad = ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))

        def cv(name):
            return nn.Conv(self.hidden, k, padding=pad, dtype=self.dtype,
                           name=name)
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(cv("convz")(hx))
        r = nn.sigmoid(cv("convr")(hx))
        q = nn.tanh(cv("convq")(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class MotionEncoder(nn.Module):
    cfg: RAFTConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, flow, corr_features):
        c = self.cfg
        cr = ConvNormRelu(c.motion_corr[0], (1, 1), "none",
                          dtype=self.dtype, name="convcorr1")(corr_features)
        cr = ConvNormRelu(c.motion_corr[1], (3, 3), "none",
                          dtype=self.dtype, name="convcorr2")(cr)
        fl = ConvNormRelu(c.motion_flow[0], (7, 7), "none",
                          dtype=self.dtype, name="convflow1")(flow)
        fl = ConvNormRelu(c.motion_flow[1], (3, 3), "none",
                          dtype=self.dtype, name="convflow2")(fl)
        cf = ConvNormRelu(c.motion_out - 2, (3, 3), "none",
                          dtype=self.dtype, name="conv")(
            jnp.concatenate([cr, fl], axis=-1))
        return jnp.concatenate([cf, flow.astype(cf.dtype)], axis=-1)


def _convex_upsample(flow, mask, factor=8):
    """Convex combination upsample (torchvision upsample_flow): mask
    (B, H, W, 9*f*f) softmaxed over the 9 taps weights a 3x3 (zero-
    padded) neighborhood of 8*flow per output subpixel."""
    b, h, w, _ = flow.shape
    fl = flow * factor
    # 9 shifted copies, unfold order: rows (dy) outer, cols (dx) inner
    pad = jnp.pad(fl, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [pad[:, dy:dy + h, dx:dx + w] for dy in range(3)
            for dx in range(3)]
    taps = jnp.stack(taps, axis=3)  # (B, H, W, 9, 2)
    m = mask.reshape(b, h, w, 9, factor, factor)
    m = jax.nn.softmax(m, axis=3)
    up = jnp.einsum("bhwkyx,bhwkc->bhwyxc", m, taps)
    # (B, H, W, fy, fx, 2) -> (B, H*fy, W*fx, 2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h * factor, w * factor, 2)


class RAFT(nn.Module):
    cfg: RAFTConfig = RAFT_LARGE

    @nn.compact
    def __call__(self, img1, img2, iters=None):
        """(B, H, W, 3) uint8/float pairs -> (B, H, W, 2) flow in
        pixels. H, W must be multiples of 8."""
        c = self.cfg
        dt = c.compute_dtype
        single = img1.ndim == 3
        if single:  # single pair convenience
            img1, img2 = img1[None], img2[None]
        x1 = (img1.astype(dt) / 255.0) * 2.0 - 1.0
        x2 = (img2.astype(dt) / 255.0) * 2.0 - 1.0

        fnet = RAFTEncoder(c, c.feat_dim, "instance", dt, name="fnet")
        f1 = fnet(x1).astype(jnp.float32)
        f2 = fnet(x2).astype(jnp.float32)
        ctx = RAFTEncoder(c, c.hidden_dim + c.context_dim, "batch", dt,
                          name="cnet")(x1)
        hidden = nn.tanh(ctx[..., :c.hidden_dim].astype(jnp.float32))
        context = nn.relu(ctx[..., c.hidden_dim:])

        pyr = _corr_pyramid(f1, f2, c.corr_levels)
        b, h, w = f1.shape[:3]
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([gx, gy], axis=-1),
                                   (b, h, w, 2))

        motion = MotionEncoder(c, dt, name="motion")
        gru1 = ConvGRU(c.hidden_dim, (1, 5), dt, name="gru1")
        gru2 = ConvGRU(c.hidden_dim, (5, 1), dt, name="gru2")
        fh1 = nn.Conv(c.flow_head_hidden, (3, 3), dtype=dt,
                      name="flow_head1")
        fh2 = nn.Conv(2, (3, 3), dtype=jnp.float32, name="flow_head2")
        mask1 = ConvNormRelu(c.flow_head_hidden, (3, 3), "none",
                             dtype=dt, name="mask_conv1")
        mask2 = nn.Conv(8 * 8 * 9, (1, 1), dtype=jnp.float32,
                        name="mask_conv2")

        coords1 = coords0
        up_flow = None
        for _ in range(iters if iters is not None else c.iters):
            corr_feat = _lookup(pyr, coords1, c.corr_radius)
            flow = (coords1 - coords0).astype(jnp.float32)
            mfeat = motion(flow.astype(dt), corr_feat.astype(dt))
            inp = jnp.concatenate([context.astype(jnp.float32),
                                   mfeat.astype(jnp.float32)], axis=-1)
            hidden = gru1(hidden, inp)
            hidden = gru2(hidden, inp)
            delta = fh2(nn.relu(fh1(hidden.astype(dt))))
            coords1 = coords1 + delta
            up_mask = 0.25 * mask2(mask1(hidden.astype(dt)))
            up_flow = _convex_upsample(
                (coords1 - coords0).astype(jnp.float32), up_mask)
        return up_flow[0] if single else up_flow


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
