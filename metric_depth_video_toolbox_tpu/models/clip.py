"""CLIP vision encoder (Flax) — the image-conditioning tower of the
SVD/StereoCrafter pipeline (reference stereo_crafter_infill.py uses the
SVD img2vid pipeline, which embeds the conditioning frame with CLIP
ViT-H/14 and cross-attends on the projected embedding).

Weight-exact mirror of HF transformers ``CLIPVisionModelWithProjection``
(pre-norm ViT + class token + learned positions + projection); forward
equivalence is proven against the REAL transformers torch module in
tests/test_weight_exact_clip.py (not a hand mirror).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280        # ViT-H/14 (SVD's image encoder)
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1024
    hidden_act: str = "gelu"       # laion ViT-H uses exact gelu
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


CLIP_VIT_H = CLIPVisionConfig()
CLIP_TINY = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                             num_layers=2, num_heads=2, image_size=32,
                             patch_size=8, projection_dim=16)

# CLIP preprocessing constants (OpenAI normalization)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPLayer(nn.Module):
    heads: int
    mlp_dim: int
    act: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        dh = d // self.heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="layer_norm1")(x).astype(self.dtype)
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(b, s, self.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, self.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, self.heads, dh).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(dh)).astype(q.dtype)
        a = nn.softmax(a.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(o)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(_act(self.act)(h))
        return x + h


class CLIPVisionTower(nn.Module):
    """(B, H, W, 3) CLIP-normalized -> (B, projection_dim) image embeds
    (the cross-attention context for the SVD UNet is embeds[:, None])."""
    cfg: CLIPVisionConfig = CLIP_VIT_H

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        b = x.shape[0]
        d = cfg.hidden_size
        h = nn.Conv(d, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    use_bias=False, padding="VALID", dtype=dt,
                    name="patch_embedding")(x.astype(dt))
        h = h.reshape(b, -1, d)
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (d,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (b, 1, d)), h], axis=1)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (h.shape[1], d))
        h = h + pos.astype(dt)[None]
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="pre_layernorm")(h).astype(dt)
        for i in range(cfg.num_layers):
            h = CLIPLayer(cfg.num_heads, cfg.intermediate_size,
                          cfg.hidden_act, dt, name=f"layer{i}")(h)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="post_layernorm")(h[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False,
                        dtype=jnp.float32,
                        name="visual_projection")(pooled)


def preprocess(frames_01, image_size=224):
    """(B, H, W, 3) in [0,1] -> CLIP-normalized (B, S, S, 3). Matches
    the SVD pipeline's CLIPImageProcessor (bilinear resize + openai
    mean/std)."""
    import jax
    b = frames_01.shape[0]
    x = jax.image.resize(frames_01, (b, image_size, image_size, 3),
                         "bilinear")
    return (x - CLIP_MEAN) / CLIP_STD
