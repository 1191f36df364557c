"""DPT (dense prediction transformer) decoder head (Flax linen).

The decoder used by the Depth-Anything family: reassemble 4 ViT feature
levels into a multi-scale pyramid, fuse coarse-to-fine with residual conv
units, and regress per-pixel depth/disparity. Convolutions stay in NHWC
bfloat16 (XLA maps them onto the MXU); upsampling is bilinear
jax.image.resize fused into the surrounding elementwise work.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    features: int = 128
    out_channels: Sequence[int] = (96, 192, 384, 768)
    dtype: str = "bfloat16"
    # fast_head: run the 3x3 channel-reducing head conv BEFORE the final
    # full-resolution upsample (the standard DPT order costs a full-res
    # 3x3 conv on `features//2` channels — several TFLOPs at 518-class
    # inputs). Disable when loading converted torch checkpoints to match
    # the original op order exactly.
    fast_head: bool = True
    # torch_resize: weight-exact torch decode. Uses the original DPT
    # learned resize layers (ConvTranspose x4/x2, identity, strided conv
    # x0.5) instead of bilinear resize, align_corners=True bilinear
    # interpolation in the fusion/head upsamples, and the final fusion's
    # x2 upsample (original DA-V2 refinenet1 has no `size` arg -> scale
    # factor 2; verified numerically against the HF torch implementation
    # in tests/test_weight_exact.py). Default off: half-pixel bilinear
    # fuses better and skips the extra 2x feature map.
    torch_resize: bool = False
    # final activation of the head: 'relu' (relative DA-V2), 'sigmoid'
    # (metric DA-V2: caller multiplies by max_depth), or 'none' (raw
    # multi-channel output, e.g. the MoGe-class point-map head).
    head_act: str = "relu"
    # output channels of the final 1x1 conv: 1 for depth heads, 4 for
    # the point-map head (xyz + mask logit, reference moge_video.py
    # consumes output['points']/['mask']/['intrinsics']).
    n_out: int = 1

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


DPT_TINY = DPTConfig(features=32, out_channels=(16, 32, 48, 64))


def _resize(x, hw):
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[3]), "bilinear").astype(x.dtype)


def _interp_mat_ac(n_in, n_out):
    """(n_out, n_in) bilinear interpolation matrix, torch
    align_corners=True convention: src = i * (n_in-1)/(n_out-1)."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    w = src - lo
    m[np.arange(n_out), lo] = 1.0 - w
    m[np.arange(n_out), lo + 1] = w
    return m


def resize_align_corners(x, hw):
    """Bilinear resize matching torch F.interpolate(align_corners=True),
    expressed as two small matmuls (MXU-friendly; exact weights)."""
    b, h, w, c = x.shape
    oh, ow = hw
    dt = x.dtype
    if oh != h:
        mh = jnp.asarray(_interp_mat_ac(h, oh), dt)
        x = jnp.einsum("oh,bhwc->bowc", mh, x)
    if ow != w:
        mw = jnp.asarray(_interp_mat_ac(w, ow), dt)
        x = jnp.einsum("ow,bhwc->bhoc", mw, x)
    return x


class ResidualConvUnit(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        y = nn.relu(x)
        y = nn.Conv(c.features, (3, 3), dtype=c.compute_dtype, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(c.features, (3, 3), dtype=c.compute_dtype, name="conv2")(y)
        return x + y


class PromptLayer(nn.Module):
    """PromptDA's per-fusion-level depth-prompt branch: conv-relu-conv-
    relu-conv over the (normalized, resized) prompt depth, summed into
    the fusion feature (HF PromptDepthAnythingLayer op order)."""
    cfg: DPTConfig

    @nn.compact
    def __call__(self, p):
        c = self.cfg
        p = nn.Conv(c.features, (3, 3), dtype=c.compute_dtype,
                    name="conv1")(p)
        p = nn.relu(p)
        p = nn.Conv(c.features, (3, 3), dtype=c.compute_dtype,
                    name="conv2")(p)
        p = nn.relu(p)
        return nn.Conv(c.features, (3, 3), dtype=c.compute_dtype,
                       name="conv3")(p)


class FeatureFusion(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None, prompt=None):
        c = self.cfg
        if skip is not None:
            x = x + ResidualConvUnit(c, name="rcu1")(skip)
        x = ResidualConvUnit(c, name="rcu2")(x)
        if prompt is not None:
            # prompt: (B, h, w, 1) normalized depth; torch resizes with
            # align_corners=False (= half-pixel, no antialias)
            p = jax.image.resize(
                prompt, (x.shape[0], x.shape[1], x.shape[2], 1),
                "bilinear", antialias=False).astype(x.dtype)
            x = x + PromptLayer(c, name="prompt")(p)
        if out_hw is not None:
            x = (resize_align_corners(x, out_hw) if c.torch_resize
                 else _resize(x, out_hw))
        return nn.Conv(c.features, (1, 1), dtype=c.compute_dtype,
                       name="project")(x)


class DPTHead(nn.Module):
    """4 ViT feature maps (B, gh, gw, D) -> dense prediction
    (B, gh*patch, gw*patch, 1), non-negative (relu) raw output; metric /
    relative interpretation is applied by the caller."""
    cfg: DPTConfig
    patch_size: int = 14

    @nn.compact
    def __call__(self, feats, prompt=None):
        c = self.cfg
        b, gh, gw, _ = feats[0].shape
        # Reassemble: project each level and move to its pyramid scale
        # (x4, x2, x1, x0.5 of the token grid).
        scales = (4, 2, 1, 0.5)
        pyr = []
        for i, (f, ch) in enumerate(zip(feats, c.out_channels)):
            y = nn.Conv(ch, (1, 1), dtype=c.compute_dtype,
                        name=f"project{i}")(f)
            if c.torch_resize:
                # DA-V2 resize_layers: ConvTranspose(4,4)/(2,2)/identity/
                # Conv(3,s2,p1) — weight-exact conversion target
                if i == 0:
                    y = nn.ConvTranspose(ch, (4, 4), strides=(4, 4),
                                         dtype=c.compute_dtype,
                                         name="resize0")(y)
                elif i == 1:
                    y = nn.ConvTranspose(ch, (2, 2), strides=(2, 2),
                                         dtype=c.compute_dtype,
                                         name="resize1")(y)
                elif i == 3:
                    # explicit (1,1) padding: torch Conv2d(k3,s2,p=1);
                    # flax SAME with stride 2 would pad (0,1) — off by
                    # one sample grid vs the checkpoint
                    y = nn.Conv(ch, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)),
                                dtype=c.compute_dtype, name="resize3")(y)
            else:
                hw = (int(gh * scales[i]), int(gw * scales[i]))
                y = _resize(y, hw)
            y = nn.Conv(c.features, (3, 3), dtype=c.compute_dtype,
                        use_bias=False, name=f"scratch{i}")(y)
            pyr.append(y)

        # Fuse coarse -> fine. In torch-exact mode the final fusion also
        # upsamples x2 (original refinenet1 is called without `size` ->
        # scale_factor=2), so head convs run at 8x the token grid.
        x = FeatureFusion(c, name="fusion3")(
            pyr[3], out_hw=pyr[2].shape[1:3], prompt=prompt)
        x = FeatureFusion(c, name="fusion2")(
            x, skip=pyr[2], out_hw=pyr[1].shape[1:3], prompt=prompt)
        x = FeatureFusion(c, name="fusion1")(
            x, skip=pyr[1], out_hw=pyr[0].shape[1:3], prompt=prompt)
        last_hw = (pyr[0].shape[1] * 2, pyr[0].shape[2] * 2) \
            if c.torch_resize else None
        x = FeatureFusion(c, name="fusion0")(x, skip=pyr[0],
                                             out_hw=last_hw, prompt=prompt)

        x = nn.Conv(c.features // 2, (3, 3), dtype=c.compute_dtype,
                    name="head_conv1")(x)
        full_hw = (gh * self.patch_size, gw * self.patch_size)
        up = resize_align_corners if c.torch_resize else _resize
        if c.fast_head:
            x = nn.Conv(32, (3, 3), dtype=c.compute_dtype,
                        name="head_conv2")(x)
            x = nn.relu(x)
            # 1x1 conv commutes exactly with the bilinear upsample
            # (both linear, one per-channel, one per-pixel), so run it
            # BEFORE the full-res resize: upsampling n_out channels
            # instead of 32 cut ~12 ms/iter of resize data movement at
            # ViT-L batch 32 on v5e.
            x = nn.Conv(c.n_out, (1, 1), dtype=jnp.float32,
                        name="head_conv3")(x)
            x = up(x, full_hw)
        else:
            x = up(x, full_hw)
            x = nn.Conv(32, (3, 3), dtype=c.compute_dtype,
                        name="head_conv2")(x)
            x = nn.relu(x)
            x = nn.Conv(c.n_out, (1, 1), dtype=jnp.float32,
                        name="head_conv3")(x)
        if c.head_act == "sigmoid":
            return nn.sigmoid(x)
        if c.head_act == "none":
            return x
        return nn.relu(x)
