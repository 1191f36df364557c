"""SVD-class spatio-temporal UNet + temporal-decoder VAE, weight-exact
with the diffusers graph that StereoCrafter fine-tunes.

The reference infill engines load Stable-Video-Diffusion checkpoints
(reference stereo_crafter_infill.py:97-99 — StereoCrafter = SVD
img2vid UNet fine-tuned for 9-channel inpainting conditioning, 25x
1024x768 chunks).  ``models.diffusion`` keeps the TPU-native fast
engine; THIS module mirrors the torch op order exactly
(UNetSpatioTemporalConditionModel + AutoencoderKLTemporalDecoder key
layout) so converted torch weights reproduce reference outputs.
Forward equivalence against a torch re-implementation of the diffusers
graph is proven in tests/test_weight_exact_svd.py.

Layout conventions (B=1 video chunk semantics):
  UNet sample      (F, H, W, C)  — frames are the batch axis for all
                                   spatial ops (MXU-friendly NHWC)
  temporal mixing  (H*W, F, C)   — only the temporal attention/conv
                                   crosses frames (the only cross-device
                                   axis when F shards over a mesh)

Eps conventions (diffusers unet_3d_blocks.py): cross-attn blocks build
their SpatioTemporalResBlocks with eps=1e-6, plain down/up/mid blocks
with eps=1e-5; the VAE decoder uses eps=1e-6 spatial / 1e-5 temporal.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SVDConfig:
    in_channels: int = 9           # StereoCrafter inpainting: 4 noisy
    out_channels: int = 4          # + 4 cond-latent + 1 mask
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    num_attention_heads: Sequence[int] = (5, 10, 20, 20)
    transformer_layers_per_block: int = 1
    # sampling (EulerDiscrete/EDM; SVD ships sigma_max=700)
    num_steps: int = 5
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def time_embed_dim(self):
        return self.block_out_channels[0] * 4


SVD_TINY = SVDConfig(block_out_channels=(32, 64), layers_per_block=1,
                     cross_attention_dim=16, addition_time_embed_dim=4,
                     num_attention_heads=(1, 2), dtype="float32")


def timesteps_embed(t, dim, flip_sin_to_cos=True, max_period=10000.0):
    """diffusers ``Timesteps``/get_timestep_embedding, freq_shift=0."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(
        half, dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                          axis=-1)
    if dim % 2:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepMLP(nn.Module):
    """diffusers TimestepEmbedding: linear_1 -> silu -> linear_2.
    ``inner_dim`` defaults to ``out_dim`` (the UNet time embedding);
    the transformer's time_pos_embed uses inner=4c, out=c."""
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    inner_dim: int | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.inner_dim or self.out_dim, dtype=self.dtype,
                     name="linear_1")(x)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        name="linear_2")(nn.silu(x))


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mix (diffusers AlphaBlender; video-only
    inputs, so the image_only_indicator branch never fires)."""
    switch: bool = False

    @nn.compact
    def __call__(self, x_spatial, x_temporal):
        m = self.param("mix_factor", nn.initializers.constant(0.5), ())
        alpha = jax.nn.sigmoid(m)
        if self.switch:
            alpha = 1.0 - alpha
        return (alpha * x_spatial.astype(jnp.float32)
                + (1.0 - alpha) * x_temporal.astype(jnp.float32)
                ).astype(x_spatial.dtype)


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (silu, GN32). x: (F, H, W, C)."""
    out_ch: int
    eps: float = 1e-6
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        h = nn.GroupNorm(32, epsilon=self.eps, dtype=jnp.float32,
                         name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        if self.use_temb and temb is not None:
            h = h + nn.Dense(self.out_ch, dtype=self.dtype,
                             name="time_emb_proj")(
                nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(32, epsilon=self.eps, dtype=jnp.float32,
                         name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """diffusers TemporalResnetBlock: (3,1,1) convs over (F, H, W).
    x: (F, H, W, C) -> treated as one video."""
    out_ch: int
    eps: float = 1e-5
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        v = x[None]  # (1, F, H, W, C) for the 3D convs
        h = nn.GroupNorm(32, epsilon=self.eps, dtype=jnp.float32,
                         name="norm1")(v)
        h = nn.Conv(self.out_ch, (3, 1, 1), dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        if self.use_temb and temb is not None:
            h = h + nn.Dense(self.out_ch, dtype=self.dtype,
                             name="time_emb_proj")(
                nn.silu(temb))[None, :, None, None, :]
        h = nn.GroupNorm(32, epsilon=self.eps, dtype=jnp.float32,
                         name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 1, 1), dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            v = nn.Conv(self.out_ch, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(v)
        return (v + h)[0]


class SpatioTemporalResBlock(nn.Module):
    """spatial ResnetBlock2D + temporal ResnetBlock + AlphaBlender
    (switch_spatial_to_temporal_mix=True in the UNet, False in the VAE
    decoder)."""
    out_ch: int
    eps: float = 1e-6
    temporal_eps: float | None = None
    use_temb: bool = True
    switch: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        h = ResnetBlock2D(self.out_ch, self.eps, self.use_temb,
                          self.dtype, name="spatial_res_block")(x, temb)
        ht = TemporalResnetBlock(
            self.out_ch, self.temporal_eps or self.eps, self.use_temb,
            self.dtype, name="temporal_res_block")(h, temb)
        return AlphaBlender(self.switch, name="time_mixer")(h, ht)


def _attention(q, k, v, heads, dtype):
    """Plain multi-head attention; q/k/v (B, S, C) already projected."""
    b, sq, c = q.shape
    sk = k.shape[1]
    dh = c // heads
    q = q.reshape(b, sq, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, sk, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, sk, heads, dh).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.float32(dh)).astype(q.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, c)


class Attention(nn.Module):
    """diffusers Attention: to_q/k/v (no bias) + to_out.0 (bias)."""
    heads: int
    dtype: jnp.dtype = jnp.float32
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        q = nn.Dense(x.shape[-1], use_bias=self.qkv_bias,
                     dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(x.shape[-1], use_bias=self.qkv_bias,
                     dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(x.shape[-1], use_bias=self.qkv_bias,
                     dtype=self.dtype, name="to_v")(context)
        out = _attention(q, k, v, self.heads, self.dtype)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    """diffusers FeedForward with GEGLU (net.0.proj, net.2)."""
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim * 8, dtype=self.dtype, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(gate.astype(jnp.float32),
                        approximate=False).astype(a.dtype)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF (LayerNorm eps 1e-5)."""
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        c = x.shape[-1]
        x = x + Attention(self.heads, self.dtype, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm1")(x).astype(self.dtype))
        x = x + Attention(self.heads, self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype), context)
        x = x + FeedForward(c, self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm3")(x).astype(self.dtype))
        return x


class TemporalBasicTransformerBlock(nn.Module):
    """diffusers TemporalBasicTransformerBlock: ff_in residual, then
    temporal self-attn / cross-attn / ff over the frame axis."""
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_context):
        # x: (F, S, C) -> (S, F, C): frames become the sequence
        c = x.shape[-1]
        h = x.transpose(1, 0, 2)
        res = h
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm_in")(h).astype(self.dtype)
        h = FeedForward(c, self.dtype, name="ff_in")(h) + res
        h = h + Attention(self.heads, self.dtype, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm1")(h).astype(self.dtype))
        h = h + Attention(self.heads, self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm2")(h).astype(self.dtype),
            time_context)
        h = h + FeedForward(c, self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm3")(h).astype(self.dtype))
        return h.transpose(1, 0, 2)


class TransformerST(nn.Module):
    """diffusers TransformerSpatioTemporalModel (B=1)."""
    heads: int
    n_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        """x: (F, H, W, C); context: (F, S_ctx, D) CLIP embedding."""
        f, hh, ww, c = x.shape
        res = x
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x)
        h = h.reshape(f, hh * ww, c).astype(self.dtype)
        h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h)

        # frame-index positional embedding (sinusoidal over 0..F-1)
        t_emb = timesteps_embed(jnp.arange(f, dtype=jnp.float32), c)
        emb = TimestepMLP(c, self.dtype, inner_dim=c * 4,
                          name="time_pos_embed")(t_emb)[:, None, :]
        # temporal cross-attn context: first frame's tokens, per pixel
        time_context = jnp.broadcast_to(
            context[:1], (hh * ww,) + context.shape[1:])

        mixer = AlphaBlender(False, name="time_mixer")  # shared/layers
        for i in range(self.n_layers):
            h_sp = BasicTransformerBlock(
                self.heads, self.dtype, name=f"block{i}")(h, context)
            h_mix = TemporalBasicTransformerBlock(
                self.heads, self.dtype, name=f"tblock{i}")(
                h_sp + emb, time_context)
            h = mixer(h_sp, h_mix)

        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(f, hh, ww, c) + res


class SVDUNet(nn.Module):
    """UNetSpatioTemporalConditionModel, weight-exact Flax mirror.

    __call__(z, c_noise, context, added_time_ids) -> raw model output
    F(c_in*z); EDM pre/post-conditioning lives in ``svd_denoise``.
    """
    cfg: SVDConfig = SVDConfig()

    @nn.compact
    def __call__(self, x, c_noise, context, added_time_ids):
        """x: (F, H, W, in_channels) ALREADY input-scaled; c_noise:
        scalar; context: (1-or-F, S, cross_dim); added_time_ids: (3,)."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        f = x.shape[0]
        ted = cfg.time_embed_dim

        t_emb = timesteps_embed(c_noise[None],
                                cfg.block_out_channels[0])
        emb = TimestepMLP(ted, dt, name="time_embedding")(t_emb)
        aug = timesteps_embed(added_time_ids,
                              cfg.addition_time_embed_dim)
        aug = TimestepMLP(ted, dt, name="add_embedding")(
            aug.reshape(1, -1))
        emb = jnp.broadcast_to(emb + aug, (f, ted)).astype(dt)
        if context.shape[0] == 1:
            context = jnp.broadcast_to(
                context, (f,) + context.shape[1:])
        context = context.astype(dt)

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), dtype=dt,
                    name="conv_in")(x.astype(dt))
        n_blocks = len(cfg.block_out_channels)
        skips = [h]
        for i, ch in enumerate(cfg.block_out_channels):
            cross = i < n_blocks - 1  # last down block has no attn
            eps = 1e-6 if cross else 1e-5
            for j in range(cfg.layers_per_block):
                h = SpatioTemporalResBlock(
                    ch, eps=eps, use_temb=True, switch=True, dtype=dt,
                    name=f"down{i}_res{j}")(h, emb)
                if cross:
                    h = TransformerST(
                        cfg.num_attention_heads[i],
                        cfg.transformer_layers_per_block, dt,
                        name=f"down{i}_attn{j}")(h, context)
                skips.append(h)
            if i < n_blocks - 1:
                # torch Conv2d(stride=2, padding=1); flax SAME would pad
                # (0,1) for even sizes, so pad explicitly
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=dt,
                            name=f"down{i}_pool")(h)
                skips.append(h)

        mid_ch = cfg.block_out_channels[-1]
        h = SpatioTemporalResBlock(mid_ch, eps=1e-5, switch=True,
                                   dtype=dt, name="mid_res0")(h, emb)
        h = TransformerST(cfg.num_attention_heads[-1],
                          cfg.transformer_layers_per_block, dt,
                          name="mid_attn")(h, context)
        h = SpatioTemporalResBlock(mid_ch, eps=1e-5, switch=True,
                                   dtype=dt, name="mid_res1")(h, emb)

        for i in reversed(range(n_blocks)):
            ch = cfg.block_out_channels[i]
            cross = i < n_blocks - 1
            eps = 1e-6 if cross else 1e-5
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = SpatioTemporalResBlock(
                    ch, eps=eps, use_temb=True, switch=True, dtype=dt,
                    name=f"up{i}_res{j}")(h, emb)
                if cross:
                    h = TransformerST(
                        cfg.num_attention_heads[i],
                        cfg.transformer_layers_per_block, dt,
                        name=f"up{i}_attn{j}")(h, context)
            if i > 0:
                h = jax.image.resize(
                    h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2,
                        h.shape[3]), "nearest")
                h = nn.Conv(ch, (3, 3), dtype=dt,
                            name=f"up{i}_upconv")(h)

        h = nn.GroupNorm(32, epsilon=1e-5, dtype=jnp.float32,
                         name="conv_norm_out")(h)
        return nn.Conv(self.cfg.out_channels, (3, 3), dtype=jnp.float32,
                       name="conv_out")(nn.silu(h))


def svd_denoise(apply_fn, params, z, sigma, context, added_time_ids,
                cond_concat=None):
    """EDM pre/post-conditioning around the raw UNet, the SVD recipe
    (EulerDiscreteScheduler timestep_type='continuous', v-prediction):
      in  = z / sqrt(sigma^2+1)  [++ channel-concat conditioning]
      out = z / (sigma^2+1)  -  sigma/sqrt(sigma^2+1) * F(in, 0.25*ln s)
    """
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
    x = z * c_in
    if cond_concat is not None:
        x = jnp.concatenate([x, cond_concat], axis=-1)
    c_noise = 0.25 * jnp.log(sigma)
    raw = apply_fn(params, x, c_noise, context, added_time_ids)
    return z / (sigma ** 2 + 1.0) - raw * sigma / jnp.sqrt(
        sigma ** 2 + 1.0)


# --------------------------------------------------------------------------
# VAE: encoder (SD KL) + TemporalDecoder (AutoencoderKLTemporalDecoder)


@dataclasses.dataclass(frozen=True)
class SVDVAEConfig:
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    # decoder output channels: 3 for RGB; 4 for GeometryCrafter's
    # point-map VAE (xyz + valid-mask logit — reference
    # geometrycrafter_video.py:311-317 PMapAutoencoderKLTemporalDecoder,
    # whose pipe returns (point_maps, valid_masks))
    out_channels: int = 3
    scaling_factor: float = 0.18215
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


SVD_VAE_TINY = SVDVAEConfig(block_out_channels=(32, 64),
                            layers_per_block=1, dtype="float32")

# GeometryCrafter point-map VAE: same KL-encoder / temporal-decoder
# graph trained on point maps; decodes xyz + a valid-mask logit. The
# tiny preset keeps the production 8x spatial factor so its latents
# align with every denoiser VAE (models.diffusion.VAE is fixed 8x).
PMAP_VAE = SVDVAEConfig(out_channels=4)
PMAP_VAE_TINY = SVDVAEConfig(block_out_channels=(32, 32, 32, 64),
                             layers_per_block=1, dtype="float32",
                             out_channels=4)


def vae_config_from_params(params, dtype="bfloat16"):
    """Infer an SVDVAEConfig from a converted VAE param tree
    ({'encoder': {'params': ...}, 'decoder': {'params': ...}}), so a
    checkpoint is self-describing (level count, widths, layers per
    block, latent and output channels all come from the tensors)."""
    enc = params["encoder"]["params"]
    dec = params["decoder"]["params"]
    n = 1 + max(int(k[4:].split("_")[0]) for k in enc
                if k.startswith("down"))
    layers = sum(1 for k in enc if k.startswith("down0_res"))
    chans = tuple(
        int(np.asarray(enc[f"down{i}_res0"]["conv1"]["kernel"]).shape[-1])
        for i in range(n))
    latent = int(np.asarray(enc["quant_conv"]["kernel"]).shape[-1]) // 2
    out_ch = int(np.asarray(dec["conv_out"]["kernel"]).shape[-1])
    return SVDVAEConfig(block_out_channels=chans, layers_per_block=layers,
                        latent_channels=latent, out_channels=out_ch,
                        dtype=dtype)


class VAEAttention(nn.Module):
    """SD VAE mid attention: GN32 -> 1-head qkv (with bias) -> residual."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f, hh, ww, c = x.shape
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=jnp.float32,
                         name="group_norm")(x).reshape(f, hh * ww, c)
        h = Attention(1, jnp.float32, qkv_bias=True, name="attn")(
            h.astype(jnp.float32))
        return x + h.reshape(f, hh, ww, c).astype(x.dtype)


class SVDVAEEncoder(nn.Module):
    """Standard SD KL encoder (DownEncoderBlock2D stack) + quant_conv.
    (F,H,W,3) in [-1,1] -> latent mode (F,H/8,W/8,4), scaled."""
    cfg: SVDVAEConfig = SVDVAEConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), dtype=dt,
                    name="conv_in")(x.astype(dt))
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, eps=1e-6, use_temb=False, dtype=dt,
                                  name=f"down{i}_res{j}")(h)
            if i < n - 1:
                # torch pads (0,1,0,1) then convs stride 2 pad 0
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=dt, name=f"down{i}_pool")(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(ch, eps=1e-6, use_temb=False, dtype=dt,
                          name="mid_res0")(h)
        h = VAEAttention(dt, name="mid_attn")(h)
        h = ResnetBlock2D(ch, eps=1e-6, use_temb=False, dtype=dt,
                          name="mid_res1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=jnp.float32,
                         name="conv_norm_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), dtype=jnp.float32,
                    name="conv_out")(nn.silu(h))
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=jnp.float32,
                    name="quant_conv")(h)
        mean = h[..., :cfg.latent_channels]  # latent_dist.mode()
        return mean * cfg.scaling_factor


class SVDVAEDecoder(nn.Module):
    """TemporalDecoder: SpatioTemporalResBlocks (merge 'learned',
    switch=False, no temb) + trailing (3,1,1) time_conv_out."""
    cfg: SVDVAEConfig = SVDVAEConfig()

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.compute_dtype
        z = z / cfg.scaling_factor
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), dtype=dt, name="conv_in")(z.astype(dt))
        h = SpatioTemporalResBlock(
            ch, eps=1e-6, temporal_eps=1e-5, use_temb=False,
            switch=False, dtype=dt, name="mid_res0")(h)
        h = VAEAttention(dt, name="mid_attn")(h)
        for j in range(1, cfg.layers_per_block):
            h = SpatioTemporalResBlock(
                ch, eps=1e-6, temporal_eps=1e-5, use_temb=False,
                switch=False, dtype=dt, name=f"mid_res{j}")(h)
        for oi, i in enumerate(reversed(range(len(cfg.block_out_channels)))):
            ch = cfg.block_out_channels[i]
            for j in range(cfg.layers_per_block + 1):
                h = SpatioTemporalResBlock(
                    ch, eps=1e-6, temporal_eps=1e-5, use_temb=False,
                    switch=False, dtype=dt, name=f"up{oi}_res{j}")(h)
            if i > 0:
                h = jax.image.resize(
                    h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2,
                        h.shape[3]), "nearest")
                h = nn.Conv(ch, (3, 3), dtype=dt,
                            name=f"up{oi}_upconv")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=jnp.float32,
                         name="conv_norm_out")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), dtype=jnp.float32,
                    name="conv_out")(nn.silu(h))
        h = nn.Conv(cfg.out_channels, (3, 1, 1), dtype=jnp.float32,
                    name="time_conv_out")(h[None])[0]
        return h


class SVDInpainter(nn.Module):
    """StereoCrafter-shaped inpainter: SVD VAE + 9-channel-conditioned
    SVD UNet, with the same encode/denoise/decode API as
    ``models.diffusion.VideoInpainter`` so
    ``pipeline.infill_diffusion.DiffusionInfillEngine`` drives either.

    ``denoise(z, sigma, cond)``: cond is the channel-concat conditioning
    (cond latent + mask [+ mono latent]); the CLIP image-embedding
    cross-attention context defaults to zeros when no embedding is
    provided (the converted UNet still runs the exact StereoCrafter
    graph — reference stereo_crafter_infill.py:97-99)."""
    cfg: SVDConfig = SVDConfig()
    vae_cfg: SVDVAEConfig = SVDVAEConfig()
    fps: float = 6.0
    motion_bucket_id: float = 127.0
    noise_aug_strength: float = 0.02

    def setup(self):
        self.vae_encoder = SVDVAEEncoder(self.vae_cfg,
                                         name="vae_encoder")
        self.vae_decoder = SVDVAEDecoder(self.vae_cfg,
                                         name="vae_decoder")
        self.unet = SVDUNet(self.cfg, name="unet")

    def encode(self, frames):
        """(T,H,W,3) in [0,1] -> scaled latent mode."""
        return self.vae_encoder(frames * 2.0 - 1.0)

    def decode(self, z):
        return jnp.clip((self.vae_decoder(z) + 1.0) / 2.0, 0.0, 1.0)

    def denoise(self, z, sigma, cond, context=None):
        if context is None:
            context = jnp.zeros((1, 1, self.cfg.cross_attention_dim))
        ids = jnp.asarray([self.fps, self.motion_bucket_id,
                           self.noise_aug_strength], jnp.float32)
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
        x = jnp.concatenate([z * c_in, cond], axis=-1)
        raw = self.unet(x, 0.25 * jnp.log(sigma), context, ids)
        return z / (sigma ** 2 + 1.0) - raw * sigma / jnp.sqrt(
            sigma ** 2 + 1.0)

    def __call__(self, frames, mask, mono=None):
        """init-time forward touching every param (mirrors
        VideoInpainter.__call__)."""
        masked = frames * (1.0 - mask[..., None])
        cond_lat = self.encode(masked)
        m = jax.image.resize(mask, cond_lat.shape[:3], "linear")[..., None]
        parts = [cond_lat, m]
        if mono is not None:
            parts.append(self.encode(mono))
        cond = jnp.concatenate(parts, axis=-1)
        z = self.encode(frames)
        return self.decode(self.denoise(z, jnp.float32(1.0), cond))
