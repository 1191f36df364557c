"""Wan-class causal video diffusion transformer (Flax) — the
InSpatio-World infill engine family.

The reference's flagship infill (inspatio_world_infill.py:303-443) runs
InSpatio-World-1.3B: a Wan2.1-1.3B causal video DiT driven by a
CausalInferencePipeline — block-causal few-step generation over Wan-VAE
latents (16ch, spatial /8, temporal /4: T_lat = (T+3)//4), conditioned
on three latent videos: the SOURCE (ref, shared between both eyes,
:425-443), the warped RENDER with holes blacked (:431), and the MASK
(:316). Chunks are 225 frames so T_lat = 57 splits into 19 causal
blocks of num_frame_per_block = 3 (:36-42, _pad_to_valid_T :225-236).

TPU-native redesign:

- **Block-causal generation without a KV cache**: each denoise step
  runs the FULL static-shape latent sequence with PER-FRAME timesteps
  (finished blocks at t=0/clean, the active block at the current step's
  t) and a block-causal attention mask. This is mathematically the
  cached computation (queries of the active block see exactly the
  clean context keys) expressed as a fixed XLA program: no dynamic
  shapes, no cache plumbing, scan over (block, step). The recompute
  overhead is bounded by n_steps x, and the whole sampler jits once.
- **Conditioning by channel concat**: [x_t(16) | render(16) | ref(16) |
  mask(4)] -> 3D patch embedding. The mask's 4 channels carry the 4
  pixel frames each latent frame covers (max-pooled 8x8 spatially) so
  temporal mask detail survives VAE-rate compression.
- **Text context**: the reference conditions on ONE fixed prompt
  ("The image shows a scene from a video", :33) encoded by umT5. The
  umT5 tower is dead weight for that use; we keep the cross-attention
  and its converted projections, and feed a learned prompt-token bank
  (`prompt_tokens`) in place of the fixed encoding — callers may pass
  any (n, text_dim) encoding via ``context`` to override.
- Flow matching (x_t = (1-t) x0 + t noise, model predicts the velocity
  v = noise - x0), Euler steps over a few distilled timesteps — the
  causal student regime the reference pipeline runs.

Checkpoint conversion: ``models.convert.convert_wan`` maps the Wan2.1
DiT layout (patch_embedding, text_embedding.{0,2},
time_embedding.{0,2}, time_projection.1, blocks.N.{self_attn.q/k/v/o +
norm_q/norm_k, cross_attn.q/k/v/o + norm_q/norm_k, norm3, ffn.0/2,
modulation}, head.{head, modulation}) — the layout of the
InSpatio-World-1.3B.safetensors the reference loads (:44-47). Forward
equivalence vs a torch mirror: tests/test_weight_exact_wan.py.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    ch: int = 96
    z_ch: int = 16
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


@dataclasses.dataclass(frozen=True)
class WanConfig:
    dim: int = 1536
    ffn_dim: int = 8960
    layers: int = 30
    heads: int = 12
    z_ch: int = 16
    cond_ch: int = 16 + 16 + 4  # render + ref + mask latents
    text_dim: int = 4096
    n_prompt_tokens: int = 16
    patch_hw: int = 2  # 3D patch (1, 2, 2)
    block_frames: int = 3  # num_frame_per_block (reference :38)
    # distilled few-step schedule (flow-matching times, 1 = pure noise)
    denoise_steps: Sequence[float] = (1.0, 0.75, 0.5, 0.25)
    freq_dim: int = 256  # sinusoidal timestep embedding width
    dtype: str = "bfloat16"
    vae: WanVAEConfig = WanVAEConfig()

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


WAN_1_3B = WanConfig()
WAN_TINY = WanConfig(dim=48, ffn_dim=96, layers=2, heads=4, text_dim=32,
                     n_prompt_tokens=4, freq_dim=32, dtype="float32",
                     vae=WanVAEConfig(ch=8, dtype="float32"))


# --------------------------------------------------------------------------
# causal 3D VAE (Wan-rate compression: temporal /4 causal, spatial /8)
# --------------------------------------------------------------------------


class FrameGroupNorm(nn.Module):
    """GroupNorm with PER-FRAME statistics: plain GroupNorm over a
    (B, T, H, W, C) video reduces across time, which would leak future
    frames into past latents and break the causal contract the block
    scheduler relies on."""
    groups: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=self.groups, dtype=jnp.float32,
                         name="gn")(x.reshape(b * t, h, w, c))
        return y.reshape(b, t, h, w, c).astype(x.dtype)


def _causal_conv(x, ch, kt, k, stride_t, stride_hw, dtype, name):
    """Conv3d over (B, T, H, W, C) with CAUSAL temporal padding (front
    pad kt-1: output frame t sees only inputs <= t) and SAME spatial."""
    ph = k // 2
    return nn.Conv(
        ch, (kt, k, k), strides=(stride_t, stride_hw, stride_hw),
        padding=((kt - 1, 0), (ph, ph), (ph, ph)), dtype=dtype,
        name=name)(x)


def _stream_conv(conv, stride_t, x, cache):
    """Apply a causal temporal conv (front-pad kt-1 = 2 baked into the
    module) in STREAMING form: prepend the carried last-2-input-frames
    cache, run the same module (same params), slice off the leading
    outputs that correspond to the zero pad. cache=None (first
    segment) uses zeros — identical to the full-video front pad, so
    chunked == full exactly (tests/test_wan_stream.py).

    stride_t=2 segments must arrive with even length (the engine picks
    x4 segment lengths); the final segment may be ragged."""
    b, _, h, w, c = x.shape
    if cache is None:
        cache = jnp.zeros((b, 2, h, w, c), x.dtype)
    xin = jnp.concatenate([cache, x.astype(cache.dtype)], axis=1)
    y = conv(xin)
    y = y[:, 2:] if stride_t == 1 else y[:, 1:]
    return y, xin[:, -2:]


class VAEResBlock3D(nn.Module):
    """setup-style so ``stream`` (chunked causal inference, per-conv
    frame caches) shares the exact same parameters/param paths as
    ``__call__`` (full-video)."""
    ch: int
    dtype: jnp.dtype
    in_ch: int | None = None  # set when != ch so setup makes the skip

    def setup(self):
        ph = 1
        self.norm1 = FrameGroupNorm(min(8, self.ch), name="norm1")
        self.conv1 = nn.Conv(self.ch, (3, 3, 3),
                             padding=((2, 0), (ph, ph), (ph, ph)),
                             dtype=self.dtype, name="conv1")
        self.norm2 = FrameGroupNorm(min(8, self.ch), name="norm2")
        self.conv2 = nn.Conv(self.ch, (3, 3, 3),
                             padding=((2, 0), (ph, ph), (ph, ph)),
                             dtype=self.dtype, name="conv2")
        if self.in_ch is not None and self.in_ch != self.ch:
            self.skip = nn.Conv(self.ch, (1, 1, 1), dtype=self.dtype,
                                name="skip")

    def _skip(self, x):
        if x.shape[-1] != self.ch:
            return self.skip(x)
        return x

    def __call__(self, x):
        y = self.conv1(nn.silu(self.norm1(x)))
        y = self.conv2(nn.silu(self.norm2(y)))
        return self._skip(x) + y

    def stream(self, x, cache):
        c1, c2 = (None, None) if cache is None else cache
        y, c1 = _stream_conv(self.conv1, 1, nn.silu(self.norm1(x)), c1)
        y, c2 = _stream_conv(self.conv2, 1, nn.silu(self.norm2(y)), c2)
        return self._skip(x) + y, (c1, c2)


class WanVAEEncoder(nn.Module):
    """(B, T, H, W, 3) [-1,1], T = 4k-3 -> (B, k, H/8, W/8, z_ch).

    Two causal temporal stride-2 convs (kernel 3, front-pad 2) give
    exactly (T+3)//4 latent frames for T = 4k-3 — the Wan VAE frame
    contract the reference chunking is built around
    (inspatio_world_infill.py:221-236).

    ``stream``: exact chunked inference with per-conv frame caches —
    at the production chunk (225 frames @ 480x832) the full-video stem
    activation alone is ~17 GB and cannot fit one chip's HBM; chunked
    segments bound it. Segment contract: every segment except the last
    must have length % 4 == 0 (the two temporal stride-2 convs need
    even segment lengths at their levels); cache=None starts the
    stream (zero front pad, identical to the full-video pad)."""
    cfg: WanVAEConfig

    def setup(self):
        c, dt = self.cfg.ch, self.cfg.compute_dtype
        ph = 1

        def cconv(ch, st, shw, name):
            return nn.Conv(ch, (3, 3, 3), strides=(st, shw, shw),
                           padding=((2, 0), (ph, ph), (ph, ph)),
                           dtype=dt, name=name)
        self.stem = cconv(c, 1, 1, "stem")
        self.res0 = VAEResBlock3D(c, dt, name="res0")
        self.down0 = cconv(c * 2, 1, 2, "down0")   # (1,2,2)
        self.res1 = VAEResBlock3D(c * 2, dt, name="res1")
        self.down1 = cconv(c * 4, 2, 2, "down1")   # (2,2,2)
        self.res2 = VAEResBlock3D(c * 4, dt, name="res2")
        self.down2 = cconv(c * 4, 2, 2, "down2")   # (2,2,2)
        self.res3 = VAEResBlock3D(c * 4, dt, name="res3")
        self.norm_out = FrameGroupNorm(8, name="norm_out")
        self.head = nn.Conv(self.cfg.z_ch, (1, 1, 1),
                            dtype=jnp.float32, name="head")

    def __call__(self, x):
        dt = self.cfg.compute_dtype
        x = self.stem(x.astype(dt))
        x = self.res0(x)
        x = self.down0(x)
        x = self.res1(x)
        x = self.down1(x)
        x = self.res2(x)
        x = self.down2(x)
        x = self.res3(x)
        return self.head(nn.silu(self.norm_out(x)))

    def stream(self, x, cache):
        dt = self.cfg.compute_dtype
        cc = ([None] * 8 if cache is None else cache)
        x, c0 = _stream_conv(self.stem, 1, x.astype(dt), cc[0])
        x, c1 = self.res0.stream(x, cc[1])
        x, c2 = _stream_conv(self.down0, 1, x, cc[2])
        x, c3 = self.res1.stream(x, cc[3])
        x, c4 = _stream_conv(self.down1, 2, x, cc[4])
        x, c5 = self.res2.stream(x, cc[5])
        x, c6 = _stream_conv(self.down2, 2, x, cc[6])
        x, c7 = self.res3.stream(x, cc[7])
        z = self.head(nn.silu(self.norm_out(x)))
        return z, [c0, c1, c2, c3, c4, c5, c6, c7]


def _up(t, hw):
    def f(y):
        b, tt, h, w, ch = y.shape
        y = jnp.repeat(y, t, axis=1) if t > 1 else y
        y = jax.image.resize(
            y, (b, y.shape[1], h * hw, w * hw, ch),
            "nearest").astype(y.dtype)
        return y
    return f


class WanVAEDecoder(nn.Module):
    """(B, k, h, w, z_ch) -> (B, 4k-3, 8h, 8w, 3) in [-1,1].

    ``stream``: exact chunked decode (see WanVAEEncoder.stream — the
    decoder's temporal mixing is all stride-1 causal convs plus
    stateless per-latent repeats, so ANY segment lengths are legal;
    the caller trims the 3 lead-in frames of the FIRST segment,
    matching the full-video ``[:, 3:]``)."""
    cfg: WanVAEConfig

    def setup(self):
        c, dt = self.cfg.ch, self.cfg.compute_dtype
        ph = 1

        def cconv(ch, name):
            return nn.Conv(ch, (3, 3, 3),
                           padding=((2, 0), (ph, ph), (ph, ph)),
                           dtype=dt, name=name)
        self.stem = nn.Conv(c * 4, (1, 1, 1), dtype=dt, name="stem")
        self.res0 = VAEResBlock3D(c * 4, dt, name="res0")
        self.upconv0 = cconv(c * 4, "upconv0")
        self.res1 = VAEResBlock3D(c * 2, dt, in_ch=c * 4, name="res1")
        self.upconv1 = cconv(c * 2, "upconv1")
        self.res2 = VAEResBlock3D(c, dt, in_ch=c * 2, name="res2")
        self.upconv2 = cconv(c, "upconv2")
        self.res3 = VAEResBlock3D(c, dt, name="res3")
        self.norm_out = FrameGroupNorm(min(8, c), name="norm_out")
        self.head = nn.Conv(3, (1, 1, 1), dtype=jnp.float32,
                            name="head")

    def _body(self, z, cc):
        dt = self.cfg.compute_dtype
        x = self.stem(z.astype(dt))
        x, c0 = self.res0.stream(x, cc[0])
        x = _up(2, 2)(x)
        x, c1 = _stream_conv(self.upconv0, 1, x, cc[1])
        x, c2 = self.res1.stream(x, cc[2])
        x = _up(2, 2)(x)
        x, c3 = _stream_conv(self.upconv1, 1, x, cc[3])
        x, c4 = self.res2.stream(x, cc[4])
        x = _up(1, 2)(x)
        x, c5 = _stream_conv(self.upconv2, 1, x, cc[5])
        x, c6 = self.res3.stream(x, cc[6])
        x = self.head(nn.silu(self.norm_out(x)))
        return jnp.tanh(x), [c0, c1, c2, c3, c4, c5, c6]

    def __call__(self, z):
        x, _ = self._body(z, [None] * 7)
        # first latent frame contributes ONE pixel frame (causal 4x):
        # 4k upsampled frames -> trim the 3 lead-in frames
        return x[:, 3:]

    def stream(self, z, cache):
        x, cc = self._body(z, [None] * 7 if cache is None else cache)
        if cache is None:
            x = x[:, 3:]
        return x, cc


def latent_frames(t):
    """Pixel frames -> Wan-VAE latent frames (reference :220-223)."""
    return (t + 3) // 4


def pad_to_valid_t(t, block_frames=3):
    """Smallest T' >= t with latent_frames(T') divisible by the causal
    block size AND T' = 4k-3 (lossless decode) — reference :225-236."""
    cand = -(-latent_frames(t) // block_frames) * block_frames
    while cand * 4 - 3 < t:
        cand += block_frames
    return cand * 4 - 3


# --------------------------------------------------------------------------
# causal DiT
# --------------------------------------------------------------------------


class RMSNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        y = x.astype(jnp.float32)
        y = y * jax.lax.rsqrt(
            jnp.mean(y * y, axis=-1, keepdims=True) + 1e-5)
        return (y * scale).astype(x.dtype)


def _rope_freqs(dim, pos, theta=10000.0):
    """(len(pos), dim/2) complex rotations for RoPE."""
    half = dim // 2
    freqs = 1.0 / theta ** (np.arange(half, dtype=np.float64) / half)
    ang = np.asarray(pos, np.float64)[:, None] * freqs[None]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def rope_3d(hd, t, h, w):
    """Per-token (T*H*W, hd/2) cos/sin for Wan's 3D RoPE: the head dim
    splits into temporal / height / width sections (t gets the
    remainder: c_t = hd/2 - 2*(hd/6) complex pairs)."""
    half = hd // 2
    c_h = half // 3
    c_w = half // 3
    c_t = half - c_h - c_w
    ct, st = _rope_freqs(2 * c_t, np.arange(t))
    ch_, sh = _rope_freqs(2 * c_h, np.arange(h))
    cw, sw = _rope_freqs(2 * c_w, np.arange(w))
    cos = np.concatenate([
        np.broadcast_to(ct[:, None, None], (t, h, w, c_t)),
        np.broadcast_to(ch_[None, :, None], (t, h, w, c_h)),
        np.broadcast_to(cw[None, None, :], (t, h, w, c_w))], axis=-1)
    sin = np.concatenate([
        np.broadcast_to(st[:, None, None], (t, h, w, c_t)),
        np.broadcast_to(sh[None, :, None], (t, h, w, c_h)),
        np.broadcast_to(sw[None, None, :], (t, h, w, c_w))], axis=-1)
    return (jnp.asarray(cos.reshape(t * h * w, half)),
            jnp.asarray(sin.reshape(t * h * w, half)))


def _apply_rope(x, cos, sin):
    """x: (B, N, H, hd); rotate interleaved pairs (torch view_as_complex
    convention: pairs are the LAST axis of a (.., hd/2, 2) view)."""
    xr = x.reshape(x.shape[:-1] + (-1, 2))
    x0, x1 = xr[..., 0], xr[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    y0 = x0 * c - x1 * s
    y1 = x0 * s + x1 * c
    return jnp.stack([y0, y1], axis=-1).reshape(x.shape)


# above this many tokens the dense (N, N) block-causal mask + scores
# cannot be materialized (the production 225-frame inspatio chunk is
# ~89k tokens -> a ~16 GB mask alone); reroute through the streaming
# Pallas kernel (ops/blockcausal_pallas.py), which is O(tile) memory
_DENSE_MASK_TOKEN_LIMIT = 16384


class WanSelfAttention(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, rope, block_ids):
        """``block_ids``: (N,) int32 nondecreasing frame-block index
        per token; query i sees key j iff block_ids[j] <=
        block_ids[i] (the causal-student regime)."""
        c = self.cfg
        hd = c.dim // c.heads
        dt = c.compute_dtype

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], c.heads, hd)
        q = RMSNorm(hd, name="norm_q")(heads(
            nn.Dense(c.dim, dtype=dt, name="q")(x)))
        k = RMSNorm(hd, name="norm_k")(heads(
            nn.Dense(c.dim, dtype=dt, name="k")(x)))
        v = heads(nn.Dense(c.dim, dtype=dt, name="v")(x))
        q = _apply_rope(q, *rope)
        k = _apply_rope(k, *rope)
        n = x.shape[1]
        if (jax.default_backend() == "tpu"
                and n >= _DENSE_MASK_TOKEN_LIMIT and hd % 128 == 0):
            from metric_depth_video_toolbox_tpu.ops import \
                blockcausal_pallas as bc
            n_pad = (-n) % 1024  # 1024-blocks: 5.8x over 256-blocks
            # (measured at the Wan production shape 1x12x89kx128 on
            # v5e: 244 ms vs 1421 ms per attention call)
            # single pad id = max+1: as keys the pads are invisible to
            # every real query; as queries they see everything (finite
            # garbage, sliced off below)
            ids = jnp.concatenate([
                block_ids.astype(jnp.int32),
                jnp.full((n_pad,), jnp.max(block_ids) + 1, jnp.int32)])

            def bhnd(t):
                t = jnp.transpose(t.astype(dt), (0, 2, 1, 3))
                return jnp.pad(t, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
            out = bc.block_causal_flash_attention(
                bhnd(q), bhnd(k), bhnd(v), ids,
                sm_scale=1.0 / float(hd) ** 0.5,
                block_q=1024, block_k=1024)
            out = jnp.transpose(out[:, :, :n], (0, 2, 1, 3))
        else:
            mask = jnp.where(
                block_ids[None, :] <= block_ids[:, None], 0.0, -1e9
            ).astype(dt)
            out = jax.nn.dot_product_attention(
                q.astype(dt), k.astype(dt), v.astype(dt),
                bias=mask[None, None])
        out = out.reshape(x.shape[0], x.shape[1], c.dim)
        return nn.Dense(c.dim, dtype=dt, name="o")(out)


class WanCrossAttention(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, ctx):
        c = self.cfg
        hd = c.dim // c.heads
        dt = c.compute_dtype

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], c.heads, hd)
        q = RMSNorm(hd, name="norm_q")(heads(
            nn.Dense(c.dim, dtype=dt, name="q")(x)))
        k = RMSNorm(hd, name="norm_k")(heads(
            nn.Dense(c.dim, dtype=dt, name="k")(ctx)))
        v = heads(nn.Dense(c.dim, dtype=dt, name="v")(ctx))
        out = jax.nn.dot_product_attention(
            q.astype(dt), k.astype(dt), v.astype(dt))
        out = out.reshape(x.shape[0], x.shape[1], c.dim)
        return nn.Dense(c.dim, dtype=dt, name="o")(out)


def _ln_noaffine(x):
    y = x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    return ((y - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


class WanBlock(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, e, ctx, rope, block_ids):
        """x: (B, N, D); e: (B, T, 6, D) per-frame modulation (already
        time_projection output); tokens are frame-major so e broadcasts
        over each frame's spatial tokens; ctx: (B, n_ctx, D);
        block_ids: (N,) per-token frame-block index (see
        WanSelfAttention)."""
        c = self.cfg
        mod = self.param("modulation", nn.initializers.normal(0.02),
                         (1, 6, c.dim))
        b, t = e.shape[0], e.shape[1]
        n_sp = x.shape[1] // t
        dm = c.dim
        m = (mod[:, None].astype(jnp.float32) + e.astype(jnp.float32))
        # modulation applies per-frame over the frame's spatial tokens:
        # broadcast through a (B, T, S, D) view — an explicit
        # jnp.repeat to (B, N, 6, D) materialized 3.05 GB PER BLOCK at
        # the production 89k-token chunk (HBM OOM, round 5)
        sh1, sc1, g1, sh2, sc2, g2 = [m[:, :, i][:, :, None]
                                      for i in range(6)]

        def modulated(v_f32, sc, sh):
            vr = v_f32.reshape(b, t, n_sp, dm)
            return ((1 + sc) * vr + sh).reshape(b, t * n_sp, dm)

        def gated(v, g):
            vr = v.astype(jnp.float32).reshape(b, t, n_sp, dm)
            return (g * vr).reshape(b, t * n_sp, dm)

        dt = c.compute_dtype
        y = modulated(_ln_noaffine(x).astype(jnp.float32), sc1, sh1)
        y = WanSelfAttention(c, name="self_attn")(y.astype(dt), rope,
                                                  block_ids)
        x = x + gated(y, g1).astype(x.dtype)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm3")(x)
        x = x + WanCrossAttention(c, name="cross_attn")(y.astype(dt),
                                                        ctx)
        y = modulated(_ln_noaffine(x).astype(jnp.float32), sc2, sh2)
        y = nn.Dense(c.ffn_dim, dtype=dt, name="ffn1")(y.astype(dt))
        y = nn.gelu(y, approximate=True)
        y = nn.Dense(c.dim, dtype=dt, name="ffn2")(y)
        return x + gated(y, g2).astype(x.dtype)


def timestep_embedding(t, dim, max_period=10000.0):
    """(B, T) flow times in [0,1] (scaled x1000 like Wan's discrete
    range) -> (B, T, dim) sinusoidal."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t[..., None].astype(jnp.float32) * 1000.0 * freqs
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class WanDiT(nn.Module):
    """Block-causal conditional video DiT.

    __call__(x, t_frames, cond, context=None):
      x:        (B, T, h, w, z_ch) noisy latents
      t_frames: (B, T) PER-FRAME flow times (0 = clean) — the causal
                student regime: context frames 0, active block > 0
      cond:     (B, T, h, w, cond_ch) [render | ref | mask] latents
      context:  optional (B, n, text_dim) prompt encoding; defaults to
                the learned prompt-token bank
    Returns velocity prediction (B, T, h, w, z_ch).
    """
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, t_frames, cond, context=None):
        c = self.cfg
        dt = c.compute_dtype
        b, t, h, w, _ = x.shape
        p = c.patch_hw
        hp, wp = h // p, w // p

        inp = jnp.concatenate([x, cond], axis=-1).astype(dt)
        tok = nn.Conv(c.dim, (1, p, p), strides=(1, p, p), dtype=dt,
                      name="patch_embedding")(inp)
        tok = tok.reshape(b, t * hp * wp, c.dim)  # frame-major

        bank = self.param(
            "prompt_tokens", nn.initializers.normal(0.02),
            (c.n_prompt_tokens, c.text_dim))
        if context is None:
            context = jnp.broadcast_to(bank[None], (b,) + bank.shape)
        ctx = nn.Dense(c.dim, dtype=dt, name="text_embedding1")(
            context.astype(dt))
        ctx = nn.Dense(c.dim, dtype=dt,
                       name="text_embedding2")(nn.gelu(
                           ctx, approximate=True))  # Wan tanh-GELU

        te = timestep_embedding(t_frames, c.freq_dim)  # (B, T, freq)
        te = nn.Dense(c.dim, dtype=jnp.float32,
                      name="time_embedding1")(te)
        te = nn.Dense(c.dim, dtype=jnp.float32,
                      name="time_embedding2")(nn.silu(te))
        e6 = nn.Dense(6 * c.dim, dtype=jnp.float32,
                      name="time_projection")(nn.silu(te))
        e6 = e6.reshape(b, t, 6, c.dim)

        rope = rope_3d(c.dim // c.heads, t, hp, wp)
        # block-causal attention: token i (frame fi) sees token j iff
        # block(fj) <= block(fi)
        fb = jnp.repeat(jnp.arange(t, dtype=jnp.int32)
                        // c.block_frames, hp * wp)

        for i in range(c.layers):
            tok = WanBlock(c, name=f"block{i}")(tok, e6, ctx, rope, fb)

        # output head: modulated norm + linear to patch pixels
        # (broadcast through the (B, T, S, D) view — see WanBlock)
        hm = self.param("head_modulation", nn.initializers.normal(0.02),
                        (1, 2, c.dim))
        m = hm[:, None].astype(jnp.float32) + te[:, :, None, :]
        sh, sc = m[:, :, 0][:, :, None], m[:, :, 1][:, :, None]
        yr = _ln_noaffine(tok).astype(jnp.float32).reshape(
            b, t, hp * wp, c.dim)
        y = ((1 + sc) * yr + sh).reshape(b, t * hp * wp, c.dim)
        y = nn.Dense(p * p * c.z_ch, dtype=jnp.float32,
                     name="head")(y.astype(dt))
        y = y.reshape(b, t, hp, wp, p, p, c.z_ch)
        y = y.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h, w, c.z_ch)
        return y.astype(jnp.float32)


def mask_to_latent(mask_thw, t_lat, lat_h, lat_w):
    """(T, H, W) float hole mask -> (t_lat, lat_h, lat_w, 4): channel i
    carries pixel frame 4*l - 3 + i of latent frame l (the causal VAE
    grouping: latent 0 covers 1 frame, others 4), max-pooled over the
    8x8 spatial footprint."""
    t, h, w = mask_thw.shape
    m = mask_thw.reshape(t, lat_h, h // lat_h, lat_w, w // lat_w)
    m = m.max(axis=(2, 4))  # (T, lat_h, lat_w)
    lead = jnp.repeat(m[:1], 3, axis=0)  # latent 0 covers frame 0 only
    m4 = jnp.concatenate([lead, m], axis=0)  # (4*t_lat, .., ..)
    return m4.reshape(t_lat, 4, lat_h, lat_w).transpose(0, 2, 3, 1)


def make_sample_step(apply_fn, cfg: WanConfig, b, t_lat):
    """One jitted (block, step) update of the block-causal sampler:
    step(params, x, cond, context, si) -> x'. ``si`` is a DEVICE
    scalar, so one compilation serves every iteration."""
    n_steps = len(cfg.denoise_steps)
    steps = list(cfg.denoise_steps) + [0.0]
    frame_block = jnp.arange(t_lat) // cfg.block_frames
    t_pairs = jnp.asarray(
        [(steps[i], steps[i + 1]) for i in range(n_steps)], jnp.float32)

    @jax.jit
    def step(params, x, cond, context, si):
        bi = si // n_steps
        ti, tn = t_pairs[si % n_steps]
        # frames: finished blocks t=0, active block ti, future t=1
        tf = jnp.where(frame_block < bi, 0.0,
                       jnp.where(frame_block == bi, ti, 1.0))
        tf = jnp.broadcast_to(tf[None], (b, t_lat))
        v = apply_fn(params, x, tf, cond, context)
        x_new = x + (tn - ti) * v
        upd = (frame_block == bi)[None, :, None, None, None]
        return jnp.where(upd, x_new, x)
    return step


def sample_causal(apply_fn, params, rng, cond, cfg: WanConfig,
                  context=None, step_fn=None):
    """Block-causal few-step flow sampling (the reference's
    CausalInferencePipeline role, inspatio_world_infill.py:331-338).

    cond: (B, T_lat, h, w, cond_ch). Returns clean latents
    (B, T_lat, h, w, z_ch). HOST loop over n_blocks * n_steps jitted
    model calls (one compile; si is a device scalar); finished blocks
    ride at t=0 with their clean values (the static-shape equivalent
    of KV caching). A host loop, NOT one giant lax.scan program: at
    the production chunk the scan version is ONE ~20-minute XLA
    execution, which the tunneled runtime's watchdog kills ("TPU
    worker crashed"); per-step executions are each a few seconds.
    ``step_fn``: pass a cached make_sample_step to skip re-tracing.
    """
    b, t_lat, h, w, _ = cond.shape
    n_blocks = t_lat // cfg.block_frames
    assert n_blocks * cfg.block_frames == t_lat, (
        f"T_lat {t_lat} not divisible by block size {cfg.block_frames}")
    n_steps = len(cfg.denoise_steps)
    x = jax.random.normal(rng, (b, t_lat, h, w, cfg.z_ch), jnp.float32)
    step = step_fn or make_sample_step(apply_fn, cfg, b, t_lat)
    for si in range(n_blocks * n_steps):
        x = step(params, x, cond, context, jnp.int32(si))
        if si % 4 == 3:
            # keep the dispatch queue bounded: downstream fetches
            # otherwise time out behind ~20 min of queued steps and
            # their retry re-dispatches pile duplicate work into HBM
            jax.block_until_ready(x)
    jax.block_until_ready(x)
    return x
