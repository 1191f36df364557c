"""Prompt-depth upscaler (PromptDA-class), Flax.

Fills the role of depth-anything/prompt-depth-anything in the reference
(upscale_depth_promptda.py: low-res metric depth + full-res RGB ->
full-res metric depth, 14-multiple padding). Architecture: the DA ViT+DPT
stack with the low-res depth *prompt* injected into the decoder features
(a conv branch over the upsampled prompt, summed into each fusion level).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod


@dataclasses.dataclass(frozen=True)
class PromptDAConfig:
    vit: vit_mod.ViTConfig = vit_mod.VIT_L
    dpt: dpt_mod.DPTConfig = dpt_mod.DPTConfig()
    max_depth: float = 100.0


PROMPT_TINY = PromptDAConfig(vit=vit_mod.VIT_TINY, dpt=dpt_mod.DPT_TINY)


class PromptDA(nn.Module):
    cfg: PromptDAConfig

    @nn.compact
    def __call__(self, images, prompt_depth):
        """images (B, H, W, 3) [0,1]; prompt_depth (B, h, w) metric.
        Returns (B, H, W) metric depth."""
        c = self.cfg
        feats, _ = vit_mod.ViT(c.vit, name="backbone")(images)
        b, gh, gw, d = feats[0].shape

        # prompt branch: log-scaled depth -> conv features per level
        pd = jnp.log1p(jnp.maximum(prompt_depth, 0.0))[..., None]
        injected = []
        for i, f in enumerate(feats):
            hw = f.shape[1:3]
            p = jax.image.resize(pd, (b,) + hw + (1,), "bilinear")
            pf = nn.Conv(d, (3, 3), dtype=f.dtype,
                         name=f"prompt{i}")(p.astype(f.dtype))
            injected.append(f + pf)

        out = dpt_mod.DPTHead(c.dpt, patch_size=c.vit.patch_size,
                              name="head")(injected)
        return jnp.clip(out[..., 0].astype(jnp.float32), 0.0, c.max_depth)


def pad_to_multiple_of(x, multiple, axes=(1, 2)):
    """Pad spatial dims up to a multiple (reference
    upscale_depth_promptda.py:16-38 pads to 14)."""
    pads = [(0, 0)] * x.ndim
    for ax in axes:
        rem = (-x.shape[ax]) % multiple
        pads[ax] = (0, rem)
    return jnp.pad(x, pads, mode="edge")
