"""Subject segmentation: faithful U²-Net (Flax).

Fills the role of rembg/U²-Net in the reference
(generate_video_mask.py:25-41: per-frame subject masks for convergence
finding and background accumulation). The graph mirrors the original
u2net.py op order exactly — REBNCONV (conv-bn-relu with dilation), RSU-7
..RSU-4 blocks with ceil-mode max pooling and bilinear upsampling, two
dilated RSU-4F stages, six side outputs fused by a 1x1 conv — so the
published u2net/u2netp torch checkpoints convert weight-exact via
``models.convert.convert_u2net`` (forward equivalence proven against a
torch re-implementation in tests/test_weight_exact_u2net.py).

Input: (B, H, W, 3) in [0, 1]; rembg's preprocessing (divide by the
per-image max, then ImageNet mean/std) is applied inside the model.
Frames batch over the leading axis and shard over 'data' on a mesh.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models.norm import EvalBatchNorm


@dataclasses.dataclass(frozen=True)
class SegConfig:
    # (height, mid, out) per encoder stage; height 0 = dilated RSU4F
    stages: tuple = ((7, 32, 64), (6, 32, 128), (5, 64, 256),
                     (4, 128, 512), (0, 256, 512), (0, 256, 512))
    # (height, mid, out) per decoder stage (stage5d .. stage1d)
    dec_stages: tuple = ((0, 256, 512), (4, 128, 256), (5, 64, 128),
                         (6, 32, 64), (7, 16, 64))
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


SEG_FULL = SegConfig()  # u2net (173.6 MB checkpoint layout)
SEG_SMALL = SegConfig(  # u2netp (4.7 MB layout)
    stages=((7, 16, 64), (6, 16, 64), (5, 16, 64), (4, 16, 64),
            (0, 16, 64), (0, 16, 64)),
    dec_stages=((0, 16, 64), (4, 16, 64), (5, 16, 64), (6, 16, 64),
                (7, 16, 64)))
SEG_TINY = SegConfig(
    stages=((7, 4, 8), (6, 4, 8), (5, 4, 8), (4, 4, 8),
            (0, 4, 8), (0, 4, 8)),
    dec_stages=((0, 4, 8), (4, 4, 8), (5, 4, 8), (6, 4, 8), (7, 4, 8)),
    dtype="float32")


def _ceil_pool(x):
    """MaxPool2d(2, 2, ceil_mode=True): pad odd H/W with -inf."""
    ph = x.shape[1] % 2
    pw = x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample_like(x, ref):
    """F.interpolate(size=ref, mode='bilinear', align_corners=False)."""
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]),
        "bilinear", antialias=False).astype(x.dtype)


class REBNConv(nn.Module):
    """u2net REBNCONV: 3x3 conv (dilation d, pad d) -> BN -> ReLU."""
    out: int
    dirate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dirate
        x = nn.Conv(self.out, (3, 3), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), dtype=self.dtype,
                    name="conv")(x)
        x = EvalBatchNorm(self.out, name="bn")(x)
        return nn.relu(x)


class RSU(nn.Module):
    """Residual U-block of the given height (original RSU7..RSU4):
    encoder convs with ceil-mode pools, a dilated bottom conv, decoder
    convs on concatenated skips, residual add of the input conv."""
    height: int
    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hl = self.height
        xin = REBNConv(self.out, 1, self.dtype, name="rebnconvin")(x)
        enc = []
        h = xin
        for i in range(1, hl):
            h = REBNConv(self.mid, 1, self.dtype, name=f"rebnconv{i}")(h)
            enc.append(h)
            if i < hl - 1:
                h = _ceil_pool(h)
        h = REBNConv(self.mid, 2, self.dtype, name=f"rebnconv{hl}")(h)
        for i in range(hl - 1, 0, -1):
            skip = enc[i - 1]
            if h.shape[1:3] != skip.shape[1:3]:
                h = _upsample_like(h, skip)
            out = self.out if i == 1 else self.mid
            h = REBNConv(out, 1, self.dtype, name=f"rebnconv{i}d")(
                jnp.concatenate([h, skip], axis=-1))
            # original op order: decoder conv at the COARSE resolution,
            # THEN upsample to the next skip (handled on next iter)
        return h + xin

    # NOTE on upsample placement: the original computes
    # hx_kd = conv(cat(upsample(hx_{k+1}d), hx_k)) — i.e. the deeper
    # decoder output is upsampled to hx_k's resolution BEFORE the
    # concat, which is what the shape check above does.


class RSU4F(nn.Module):
    """Dilated residual block (no pooling): dirates 1,2,4,8 down and
    4,2,1 up."""
    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xin = REBNConv(self.out, 1, self.dtype, name="rebnconvin")(x)
        h1 = REBNConv(self.mid, 1, self.dtype, name="rebnconv1")(xin)
        h2 = REBNConv(self.mid, 2, self.dtype, name="rebnconv2")(h1)
        h3 = REBNConv(self.mid, 4, self.dtype, name="rebnconv3")(h2)
        h4 = REBNConv(self.mid, 8, self.dtype, name="rebnconv4")(h3)
        h3d = REBNConv(self.mid, 4, self.dtype, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1))
        h2d = REBNConv(self.mid, 2, self.dtype, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], axis=-1))
        h1d = REBNConv(self.out, 1, self.dtype, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], axis=-1))
        return h1d + xin


def _stage(spec, dtype, name):
    height, mid, out = spec
    if height == 0:
        return RSU4F(mid, out, dtype, name=name)
    return RSU(height, mid, out, dtype, name=name)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class U2Net(nn.Module):
    cfg: SegConfig = SEG_FULL

    @nn.compact
    def __call__(self, images):
        """(B, H, W, 3) in [0,1] -> (B, H, W) foreground probability
        (the fused d0 output; sides follow the original fusion)."""
        c = self.cfg
        dt = c.compute_dtype
        # rembg preprocessing: x /= x.max(); (x - mean) / std
        x = images.astype(jnp.float32)
        x = x / jnp.maximum(jnp.max(x, axis=(1, 2, 3), keepdims=True),
                            1e-6)
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        x = x.astype(dt)

        encs = []
        h = x
        for i, spec in enumerate(c.stages):
            h = _stage(spec, dt, f"stage{i + 1}")(h)
            encs.append(h)
            if i < len(c.stages) - 1:
                h = _ceil_pool(h)

        sides = [None] * 6
        sides[5] = nn.Conv(1, (3, 3), dtype=jnp.float32,
                           name="side6")(encs[5])
        d = encs[5]
        for k, spec in enumerate(c.dec_stages):
            si = len(c.dec_stages) - 1 - k  # 4..0 => stage5d..stage1d
            skip = encs[si]
            d = _upsample_like(d, skip)
            d = _stage(spec, dt, f"stage{si + 1}d")(
                jnp.concatenate([d, skip], axis=-1))
            sides[si] = nn.Conv(1, (3, 3), dtype=jnp.float32,
                                name=f"side{si + 1}")(d)
        ups = [sides[0]] + [_upsample_like(s, sides[0]) for s in sides[1:]]
        d0 = nn.Conv(1, (1, 1), dtype=jnp.float32, name="outconv")(
            jnp.concatenate(ups, axis=-1))
        return nn.sigmoid(d0[..., 0].astype(jnp.float32))
