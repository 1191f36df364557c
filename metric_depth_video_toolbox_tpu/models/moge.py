"""MoGe (monocular geometry) point-map model (Flax).

The real-graph path for the reference's MoGe engine (moge_video.py:13
``from moge.model import MoGeModel``, Ruicheng/moge-vitl;
moge_video.py:162 ``model.infer(image_tensor, fov_x=fovx)``): a DINOv2
ViT-L backbone feeding a lightweight convolutional point-map head that
predicts an affine-invariant point map (xyz) plus a validity/sky mask
logit. The metric solve that upstream ``infer()`` performs on top —
recovering the per-frame focal and z-shift that best reproject the
points, honoring a fixed ``fov_x`` when given — lives in
``ops.geometry.recover_focal_shift`` and is shared with the stand-in
engine (pipeline/depth.py variant='moge').

Checkpoint layout consumed by ``models.convert.convert_moge`` (torch
mirror + forward-equivalence proof: tests/test_weight_exact_moge.py):

  backbone.*                 DINOv2 keys (blocks.N.attn.qkv, ...)
  head.projects.{0..3}       1x1 Conv projecting each of the 4 tapped
                             token levels to the head width; the four
                             projections are SUMMED (MoGe's multi-level
                             aggregation is additive, not a DPT pyramid)
  head.upsample_blocks.{i}   x2 upsample stage: ConvTranspose2d(in+2,
                             out, 2, 2) over the feature map with a
                             normalized-UV coordinate map concatenated
                             (MoGe's coordinate conditioning), followed
                             by residual conv blocks (GroupNorm-ReLU-
                             Conv x2 + skip)
  head.output_block          final conv stack: Conv3x3(in+2 -> 32) ->
                             ReLU -> Conv1x1(32 -> 4); channels =
                             affine xyz + mask logit

The head output (at grid*2^n_up resolution) is bilinearly resized to
the working resolution; xyz stays raw (affine-invariant by contract —
scale/shift are recovered by the solver, so any global affine the
checkpoint bakes in is absorbed downstream).

TPU mapping: the backbone is the standard bf16 flash-attention ViT; the
head is a handful of NHWC convs that XLA fuses — per-frame work is pure
DP over the frame batch.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import vit as vit_mod


@dataclasses.dataclass(frozen=True)
class MoGeConfig:
    vit: vit_mod.ViTConfig = vit_mod.VIT_L
    dim_proj: int = 512
    dim_upsample: Sequence[int] = (256, 128, 64)
    num_res_blocks: int = 2
    norm_groups: int = 16
    last_conv_channels: int = 32
    n_out: int = 4  # xyz + mask logit


MOGE_L = MoGeConfig()
MOGE_TINY = MoGeConfig(
    vit=vit_mod.VIT_TINY, dim_proj=16, dim_upsample=(12, 8),
    num_res_blocks=1, norm_groups=4, last_conv_channels=8)


def _uv_map(h, w, dtype):
    """(h, w, 2) normalized pixel-center coordinates in [-1, 1] x
    [-asp..], aspect-preserving like ops.geometry.normalized_uv."""
    span = max(h, w)
    u = (2.0 * (jnp.arange(w, dtype=jnp.float32) + 0.5) - w) / span
    v = (2.0 * (jnp.arange(h, dtype=jnp.float32) + 0.5) - h) / span
    uu = jnp.broadcast_to(u[None, :], (h, w))
    vv = jnp.broadcast_to(v[:, None], (h, w))
    return jnp.stack([uu, vv], axis=-1).astype(dtype)


def _cat_uv(x):
    b, h, w, _ = x.shape
    uv = jnp.broadcast_to(_uv_map(h, w, x.dtype)[None], (b, h, w, 2))
    return jnp.concatenate([x, uv], axis=-1)


class ResidualConvBlock(nn.Module):
    ch: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=jnp.float32, name="norm1")(x)
        y = nn.Conv(self.ch, (3, 3), dtype=self.dtype,
                    name="conv1")(nn.relu(y))
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=jnp.float32, name="norm2")(y)
        y = nn.Conv(self.ch, (3, 3), dtype=self.dtype,
                    name="conv2")(nn.relu(y))
        return x + y


class MoGeHead(nn.Module):
    cfg: MoGeConfig

    @nn.compact
    def __call__(self, feats):
        """feats: list of 4 (B, gh, gw, D) tapped token grids ->
        (B, gh*2^n, gw*2^n, n_out)."""
        c = self.cfg
        dt = c.vit.compute_dtype
        x = sum(nn.Conv(c.dim_proj, (1, 1), dtype=dt,
                        name=f"project{i}")(f.astype(dt))
                for i, f in enumerate(feats))
        for i, ch in enumerate(c.dim_upsample):
            y = _cat_uv(x)
            y = nn.ConvTranspose(ch, (2, 2), strides=(2, 2), dtype=dt,
                                 name=f"upsample{i}")(y)
            y = nn.Conv(ch, (3, 3), dtype=dt, name=f"upconv{i}")(y)
            for j in range(c.num_res_blocks):
                y = ResidualConvBlock(ch, c.norm_groups, dt,
                                      name=f"res{i}_{j}")(y)
            x = y
        x = _cat_uv(x)
        x = nn.Conv(c.last_conv_channels, (3, 3), dtype=dt,
                    name="out_conv1")(x)
        x = nn.relu(x)
        return nn.Conv(c.n_out, (1, 1), dtype=jnp.float32,
                       name="out_conv2")(x)


class MoGeNet(nn.Module):
    """(B, H, W, 3) [0,1] -> (points (B, H, W, 3), mask_logit (B, H, W))
    — the pipeline's point-head contract (same as the DA-class stand-in,
    pipeline/depth.py variant='moge')."""
    cfg: MoGeConfig

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        b, h, w, _ = images.shape
        feats, _cls = vit_mod.ViT(c.vit, name="backbone")(images)
        out = MoGeHead(c, name="head")(feats)
        out = jax.image.resize(
            out.astype(jnp.float32), (b, h, w, c.n_out), "bilinear")
        return out[..., :3], out[..., 3]
