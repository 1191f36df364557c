"""Latent video diffusion (SVD-class), Flax — the engine family behind
DepthCrafter (video->depth diffusion, reference depthcrafter_video.py),
StereoCrafter (stereo inpainting, stereo_crafter_infill.py),
GeometryCrafter (point-map diffusion, geometrycrafter_video.py) and the
InSpatio/M2SVID infill engines.

Components:
  - ``VAE``: conv encoder/decoder, 8x spatial downsample, 4-ch latents.
  - ``UNet3D``: residual blocks + spatial self-attention + temporal
    attention at each resolution, sinusoidal timestep embedding,
    conditioning by channel-concat (inpainting: latent + cond latent +
    mask, the StereoCrafter recipe).
  - ``EulerSampler``: fixed-step EDM/Euler sampling as a lax.scan.

Everything is static-shape and bf16-friendly; the temporal axis is a
batch axis everywhere except the temporal attention, which is the only
cross-frame op (and therefore the only cross-device op when frames shard
over a mesh).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    latent_channels: int = 4
    cond_channels: int = 5      # cond latent (4) + mask (1)
    base_width: int = 128
    width_mults: Sequence[int] = (1, 2, 4)
    temporal: bool = True
    # first down-level index that gets SPATIAL attention (temporal
    # attention runs at every level): at the StereoCrafter working
    # point the full-res latent is 96x128 = 12k tokens and quadratic
    # spatial attention there dominates everything else
    spatial_attn_min_level: int = 0
    num_steps: int = 5          # the reference engines all run ~5 steps
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


DIFFUSION_TINY = DiffusionConfig(base_width=16, width_mults=(1, 2),
                                 num_steps=2, dtype="float32")

# Production config at the StereoCrafter working point (reference
# stereo_crafter_infill.py:97-99: 25x1024x768 chunks, ~5 denoise steps,
# 4-ch 8x VAE latents): SVD-class widths 320/640/1280/1280; spatial
# attention from level 1 down (48x64 tokens); temporal attention at
# every level.
DIFFUSION_SVD = DiffusionConfig(base_width=320, width_mults=(1, 2, 4, 4),
                                spatial_attn_min_level=1, num_steps=5)


class VAE(nn.Module):
    """8x conv autoencoder. encode: (T,H,W,3)[0,1] -> (T,H/8,W/8,4)."""
    latent_channels: int = 4
    width: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        dt = self.dtype
        w = self.width
        self.enc = [
            nn.Conv(w, (3, 3), strides=(2, 2), dtype=dt, name="e1"),
            nn.Conv(w * 2, (3, 3), strides=(2, 2), dtype=dt, name="e2"),
            nn.Conv(w * 4, (3, 3), strides=(2, 2), dtype=dt, name="e3"),
        ]
        self.to_latent = nn.Conv(self.latent_channels, (1, 1),
                                 dtype=jnp.float32, name="to_latent")
        self.from_latent = nn.Conv(w * 4, (1, 1), dtype=dt,
                                   name="from_latent")
        self.dec = [
            nn.ConvTranspose(w * 2, (4, 4), strides=(2, 2), dtype=dt,
                             name="d1"),
            nn.ConvTranspose(w, (4, 4), strides=(2, 2), dtype=dt,
                             name="d2"),
            nn.ConvTranspose(self.width, (4, 4), strides=(2, 2), dtype=dt,
                             name="d3"),
        ]
        self.to_rgb = nn.Conv(3, (3, 3), dtype=jnp.float32, name="to_rgb")

    def encode(self, x):
        h = x.astype(self.dtype) * 2.0 - 1.0
        for layer in self.enc:
            h = nn.silu(layer(h))
        return self.to_latent(h)

    def decode(self, z):
        h = nn.silu(self.from_latent(z.astype(self.dtype)))
        for layer in self.dec:
            h = nn.silu(layer(h))
        return nn.sigmoid(self.to_rgb(h))

    def __call__(self, x):
        return self.decode(self.encode(x))


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResBlock(nn.Module):
    width: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, emb):
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="n1")(x)
        h = nn.Conv(self.width, (3, 3), dtype=self.dtype,
                    name="c1")(nn.silu(h))
        h = h + nn.Dense(self.width, dtype=self.dtype,
                         name="emb")(nn.silu(emb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="n2")(h)
        h = nn.Conv(self.width, (3, 3), dtype=self.dtype,
                    name="c2")(nn.silu(h))
        if x.shape[-1] != self.width:
            x = nn.Conv(self.width, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class SpatialAttention(nn.Module):
    width: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        t, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="norm")(x)
        y = y.reshape(t, h * w, c)
        y = nn.MultiHeadDotProductAttention(
            num_heads=max(1, self.width // 32), dtype=self.dtype,
            name="attn")(y, y)
        return x + y.reshape(t, h, w, c)


class TemporalAttention(nn.Module):
    width: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        t, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name="norm")(x)
        y = y.reshape(t, h * w, c).transpose(1, 0, 2)  # (HW, T, C)
        y = nn.MultiHeadDotProductAttention(
            num_heads=max(1, self.width // 32), dtype=self.dtype,
            name="attn")(y, y)
        y = y.transpose(1, 0, 2).reshape(t, h, w, c)
        return x + y


class UNet3D(nn.Module):
    cfg: DiffusionConfig

    @nn.compact
    def __call__(self, z, sigma, cond=None):
        """z: (T, h, w, latent); sigma: scalar noise level; cond:
        (T, h, w, cond_channels) or None. Returns the denoised latent
        prediction (EDM preconditioning)."""
        c = self.cfg
        dt = c.compute_dtype
        t_frames = z.shape[0]

        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = sigma / jnp.sqrt(sigma**2 + 1.0)

        x = z * c_in
        if cond is not None:
            x = jnp.concatenate([x, cond], axis=-1)
        x = x.astype(dt)

        emb = timestep_embedding(
            jnp.full((t_frames,), jnp.log(sigma) / 4.0), c.base_width)
        emb = nn.Dense(c.base_width * 4, dtype=dt, name="emb1")(emb)
        emb = nn.Dense(c.base_width * 4, dtype=dt,
                       name="emb2")(nn.silu(emb))

        x = nn.Conv(c.base_width, (3, 3), dtype=dt, name="in_conv")(x)
        skips = [x]
        # down path
        for i, mult in enumerate(c.width_mults):
            wdt = c.base_width * mult
            x = ResBlock(wdt, dt, name=f"down{i}_res")(x, emb)
            if i >= c.spatial_attn_min_level:
                x = SpatialAttention(wdt, dt, name=f"down{i}_sattn")(x)
            if c.temporal:
                x = TemporalAttention(wdt, dt, name=f"down{i}_tattn")(x)
            skips.append(x)
            if i < len(c.width_mults) - 1:
                x = nn.Conv(wdt, (3, 3), strides=(2, 2), dtype=dt,
                            name=f"down{i}_pool")(x)
        # middle
        wmid = c.base_width * c.width_mults[-1]
        x = ResBlock(wmid, dt, name="mid_res1")(x, emb)
        x = SpatialAttention(wmid, dt, name="mid_attn")(x)
        if c.temporal:
            x = TemporalAttention(wmid, dt, name="mid_tattn")(x)
        x = ResBlock(wmid, dt, name="mid_res2")(x, emb)
        # up path
        for i in reversed(range(len(c.width_mults))):
            wdt = c.base_width * c.width_mults[i]
            skip = skips[i + 1]
            if x.shape[1] != skip.shape[1]:
                x = jax.image.resize(
                    x, (x.shape[0], skip.shape[1], skip.shape[2],
                        x.shape[3]), "nearest").astype(dt)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResBlock(wdt, dt, name=f"up{i}_res")(x, emb)
            if i >= c.spatial_attn_min_level:
                x = SpatialAttention(wdt, dt, name=f"up{i}_sattn")(x)
            if c.temporal:
                x = TemporalAttention(wdt, dt, name=f"up{i}_tattn")(x)

        f = nn.Conv(c.latent_channels, (3, 3), dtype=jnp.float32,
                    name="out_conv")(
            nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                                 name="out_norm")(x)))
        return c_skip * z + c_out * f


def edm_sigmas(cfg: DiffusionConfig):
    """Karras sigma schedule, cfg.num_steps steps."""
    rho = 7.0
    steps = jnp.arange(cfg.num_steps, dtype=jnp.float32) / max(
        cfg.num_steps - 1, 1)
    s = (cfg.sigma_max ** (1 / rho)
         + steps * (cfg.sigma_min ** (1 / rho)
                    - cfg.sigma_max ** (1 / rho))) ** rho
    return jnp.concatenate([s, jnp.zeros(1)])


def sample(unet_apply, params, rng, shape, cfg: DiffusionConfig,
           cond=None, init=None):
    """Euler sampling, fixed steps as a scan. shape = (T, h, w, latent).

    ``init``: optional latent prompt — the sampling trajectory starts at
    init + sigma_max*noise instead of pure noise (SDEdit-style; the role
    of the reference's experimental VAE depth prompting,
    depthcrafter_video.py:131-177)."""
    sigmas = edm_sigmas(cfg)
    z = jax.random.normal(rng, shape, jnp.float32) * sigmas[0]
    if init is not None:
        z = z + init

    def step(z, i):
        sig = sigmas[i]
        sig_next = sigmas[i + 1]
        denoised = unet_apply(params, z, sig, cond)
        d = (z - denoised) / jnp.maximum(sig, 1e-8)
        return z + d * (sig_next - sig), None

    z, _ = jax.lax.scan(step, z, jnp.arange(cfg.num_steps))
    return z


class VideoInpainter(nn.Module):
    """StereoCrafter-class wrapper: VAE + conditional UNet for masked
    video inpainting. cond = [encode(masked video), downsampled mask]."""
    cfg: DiffusionConfig = DIFFUSION_TINY
    vae_width: int = 32

    def setup(self):
        self.vae = VAE(self.cfg.latent_channels, self.vae_width,
                       self.cfg.compute_dtype, name="vae")
        self.unet = UNet3D(self.cfg, name="unet")

    def encode(self, frames):
        return self.vae.encode(frames)

    def decode(self, z):
        return self.vae.decode(z)

    def denoise(self, z, sigma, cond):
        return self.unet(z, sigma, cond)

    def __call__(self, frames, mask, mono=None):
        """Training/init forward: frames (T,H,W,3) [0,1], mask (T,H,W),
        optional mono (T,H,W,3) source-view conditioning (the reference
        m2svid feeds the original mono video, m2svid_infill.py:89-98).
        Touches encode, denoise AND decode so init creates every param."""
        masked = frames * (1.0 - mask[..., None])
        cond_lat = self.encode(masked)
        m = jax.image.resize(mask, cond_lat.shape[:3], "linear")[..., None]
        parts = [cond_lat, m]
        if mono is not None:
            parts.append(self.encode(mono))
        cond = jnp.concatenate(parts, axis=-1)
        z = self.encode(frames)
        denoised = self.denoise(z, jnp.float32(1.0), cond)
        return self.decode(denoised)
