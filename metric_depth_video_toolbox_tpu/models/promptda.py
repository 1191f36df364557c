"""Prompt-depth upscaler (PromptDA-class), Flax.

Fills the role of depth-anything/prompt-depth-anything in the reference
(upscale_depth_promptda.py: low-res metric depth + full-res RGB ->
full-res metric depth, 14-multiple padding). Architecture mirrors the
real PromptDA op order (verified numerically against the HF torch
implementation in tests/test_weight_exact.py):

- prompt depth is min/max-normalized per item,
- every DPT fusion level adds a conv-relu-conv-relu-conv branch over the
  (resized) normalized prompt,
- sigmoid head output is de-normalized back to the prompt's metric range.

Checkpoints convert via ``models.convert.convert_promptda_hf``.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod


@dataclasses.dataclass(frozen=True)
class PromptDAConfig:
    vit: vit_mod.ViTConfig = vit_mod.VIT_L
    dpt: dpt_mod.DPTConfig = dataclasses.field(
        default_factory=lambda: dpt_mod.DPTConfig(head_act="sigmoid"))


PROMPT_TINY = PromptDAConfig(
    vit=vit_mod.VIT_TINY,
    dpt=dataclasses.replace(dpt_mod.DPT_TINY, head_act="sigmoid"))


class PromptDA(nn.Module):
    cfg: PromptDAConfig

    @nn.compact
    def __call__(self, images, prompt_depth):
        """images (B, H, W, 3) [0,1]; prompt_depth (B, h, w) metric
        (any resolution; typically 256x192 per the reference
        upscale_depth_promptda.py:62-81). Returns (B, H, W) metric
        depth in the prompt's range."""
        c = self.cfg
        feats, _ = vit_mod.ViT(c.vit, name="backbone")(images)

        # per-item min/max normalization of the prompt (HF op order)
        pd = prompt_depth[..., None].astype(jnp.float32)
        dmin = jnp.min(pd, axis=(1, 2, 3), keepdims=True)
        dmax = jnp.max(pd, axis=(1, 2, 3), keepdims=True)
        pd_norm = (pd - dmin) / jnp.maximum(dmax - dmin, 1e-6)

        out = dpt_mod.DPTHead(c.dpt, patch_size=c.vit.patch_size,
                              name="head")(feats, prompt=pd_norm)
        out = out[..., 0].astype(jnp.float32)
        # sigmoid head in [0,1] -> denormalize to the prompt range
        return out * (dmax - dmin)[..., 0] + dmin[..., 0]


def pad_to_multiple_of(x, multiple, axes=(1, 2)):
    """Pad spatial dims up to a multiple (reference
    upscale_depth_promptda.py:16-38 pads to 14)."""
    pads = [(0, 0)] * x.ndim
    for ax in axes:
        rem = (-x.shape[ax]) % multiple
        pads[ax] = (0, rem)
    return jnp.pad(x, pads, mode="edge")
