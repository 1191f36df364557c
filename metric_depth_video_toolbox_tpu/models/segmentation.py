"""Subject segmentation (U²-Net-class) for mask generation, Flax.

Fills the role of rembg/U²-Net in the reference
(generate_video_mask.py:25-41: per-frame subject masks for convergence
finding and background accumulation). A residual-U-block encoder/decoder
producing per-pixel foreground probability; frames batch over the leading
axis and shard over 'data'. Weights convertible from u2net.onnx via
``models.convert`` (structure kept isomorphic to U²-Net's RSU blocks).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SegConfig:
    widths: Sequence[int] = (16, 32, 64, 128)
    rsu_depth: int = 3
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


SEG_TINY = SegConfig(widths=(8, 16), rsu_depth=2)
SEG_FULL = SegConfig(widths=(32, 64, 128, 256, 512), rsu_depth=4)


def _resize_to(x, hw):
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[-1]), "bilinear").astype(x.dtype)


class RSU(nn.Module):
    """Residual U-block: a small internal U-Net at one scale."""
    width: int
    depth: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        xin = nn.Conv(self.width, (3, 3), dtype=self.dtype, name="in")(x)
        xin = nn.relu(xin)
        enc = [xin]
        h = xin
        pools = 0
        for i in range(self.depth):
            if min(h.shape[1:3]) < 2:
                break  # can't halve further at this working resolution
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.relu(nn.Conv(self.width, (3, 3), dtype=self.dtype,
                                name=f"enc{i}")(h))
            enc.append(h)
            pools += 1
        for i in range(pools):
            skip = enc[pools - 1 - i]
            h = _resize_to(h, skip.shape[1:3])
            h = jnp.concatenate([h, skip], axis=-1)
            h = nn.relu(nn.Conv(self.width, (3, 3), dtype=self.dtype,
                                name=f"dec{i}")(h))
        return h + xin


class U2Net(nn.Module):
    cfg: SegConfig

    @nn.compact
    def __call__(self, images):
        """(B, H, W, 3) in [0,1] -> (B, H, W) foreground probability.
        H, W must be multiples of 2**(len(widths)+rsu_depth)."""
        c = self.cfg
        dt = c.compute_dtype
        x = images.astype(dt)
        enc = []
        h = x
        for i, wdt in enumerate(c.widths):
            h = RSU(wdt, c.rsu_depth, dt, name=f"enc_rsu{i}")(h)
            enc.append(h)
            if min(h.shape[1:3]) >= 2:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = RSU(c.widths[-1], c.rsu_depth, dt, name="bridge")(h)
        side_outputs = []
        for i in range(len(c.widths) - 1, -1, -1):
            h = _resize_to(h, enc[i].shape[1:3])
            h = jnp.concatenate([h, enc[i]], axis=-1)
            h = RSU(c.widths[i], c.rsu_depth, dt, name=f"dec_rsu{i}")(h)
            side = nn.Conv(1, (3, 3), dtype=jnp.float32,
                           name=f"side{i}")(h)
            side_outputs.append(_resize_to(side, images.shape[1:3]))
        fused = nn.Conv(1, (1, 1), dtype=jnp.float32, name="fuse")(
            jnp.concatenate(side_outputs, axis=-1))
        return nn.sigmoid(fused[..., 0].astype(jnp.float32))
