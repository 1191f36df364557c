"""Wan-class causal DiT weight-exactness: our Flax WanDiT with
converted weights must reproduce a torch mirror of the Wan2.1 DiT graph
numerically.

The upstream stack (inspatio-world / Wan2.1, reference
inspatio_world_infill.py:15-18) is not installed in this image, so the
ground truth is a torch re-implementation of the Wan2.1 DiT op order
with module names matching the safetensors layout ``convert_wan``
consumes: Conv3d patch embedding over the channel-concat conditioning,
umT5-projection text MLP (tanh GELU), sinusoidal time embedding + SiLU
MLP + 6D time projection, per-block learned modulation added to the
per-frame time signal, RMSNorm'd q/k with 3D RoPE (torch
view_as_complex pair convention, head dim split t/h/w), no-affine
modulated LayerNorms, affine norm3 before cross-attention, tanh-GELU
FFN, and a modulated linear head unpatchifying to velocity.

The causal student regime is covered by feeding PER-FRAME timesteps
and a block-causal attention mask in both graphs.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import wan as wan_mod


@pytest.fixture(autouse=True)
def _precise_matmul():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


CFG = dataclasses.replace(wan_mod.WAN_TINY, layers=2)
D, HEADS, HD = CFG.dim, CFG.heads, CFG.dim // CFG.heads
T, LH, LW = 6, 4, 4  # 2 causal blocks of 3 latent frames
P = CFG.patch_hw


def _rope_freqs_t(dim, pos):
    half = dim // 2
    freqs = 1.0 / 10000.0 ** (
        torch.arange(half, dtype=torch.float64) / half)
    ang = pos[:, None].double() * freqs[None]
    return torch.polar(torch.ones_like(ang), ang)  # complex


def _rope_3d_t(hd, t, h, w):
    half = hd // 2
    c_h = half // 3
    c_w = half // 3
    c_t = half - c_h - c_w
    ft = _rope_freqs_t(2 * c_t, torch.arange(t))
    fh = _rope_freqs_t(2 * c_h, torch.arange(h))
    fw = _rope_freqs_t(2 * c_w, torch.arange(w))
    out = torch.cat([
        ft[:, None, None].expand(t, h, w, c_t),
        fh[None, :, None].expand(t, h, w, c_h),
        fw[None, None, :].expand(t, h, w, c_w)], dim=-1)
    return out.reshape(t * h * w, half)  # complex


def _apply_rope_t(x, freqs):
    """x: (B, N, H, hd) -> RoPE via torch view_as_complex (upstream
    Wan convention: consecutive pairs)."""
    b, n, h, hd = x.shape
    xc = torch.view_as_complex(
        x.double().reshape(b, n, h, hd // 2, 2))
    out = torch.view_as_real(xc * freqs[None, :, None, :])
    return out.reshape(b, n, h, hd).float()


class TRMS(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(d))

    def forward(self, x):
        y = x.float()
        y = y * torch.rsqrt(y.pow(2).mean(-1, keepdim=True) + 1e-5)
        return y * self.weight


class TWanAttn(tnn.Module):
    def __init__(self, cross=False):
        super().__init__()
        self.q = tnn.Linear(D, D)
        self.k = tnn.Linear(D, D)
        self.v = tnn.Linear(D, D)
        self.o = tnn.Linear(D, D)
        self.norm_q = TRMS(HD)
        self.norm_k = TRMS(HD)
        self.cross = cross

    def forward(self, x, ctx=None, freqs=None, mask=None):
        kv = x if ctx is None else ctx
        b, n, _ = x.shape
        m = kv.shape[1]
        q = self.norm_q(self.q(x).reshape(b, n, HEADS, HD))
        k = self.norm_k(self.k(kv).reshape(b, m, HEADS, HD))
        v = self.v(kv).reshape(b, m, HEADS, HD)
        if freqs is not None:
            q = _apply_rope_t(q, freqs)
            k = _apply_rope_t(k, freqs)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        bias = None if mask is None else mask[None, None]
        out = F.scaled_dot_product_attention(q, k, v, attn_mask=bias)
        return self.o(out.transpose(1, 2).reshape(b, n, D))


def _ln_na(x):
    return F.layer_norm(x.float(), (D,), eps=1e-6)


class TWanBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = TWanAttn()
        self.cross_attn = TWanAttn(cross=True)
        self.norm3 = tnn.LayerNorm(D, eps=1e-6)
        self.ffn = tnn.Sequential(
            tnn.Linear(D, CFG.ffn_dim), tnn.GELU(approximate="tanh"),
            tnn.Linear(CFG.ffn_dim, D))
        self.modulation = tnn.Parameter(torch.zeros(1, 6, D))

    def forward(self, x, e, ctx, freqs, mask, n_sp):
        m = self.modulation.unsqueeze(1) + e  # (B, T, 6, D)
        m = m.repeat_interleave(n_sp, dim=1)
        sh1, sc1, g1, sh2, sc2, g2 = [m[:, :, i] for i in range(6)]
        y = _ln_na(x) * (1 + sc1) + sh1
        x = x + g1 * self.self_attn(y, freqs=freqs, mask=mask)
        x = x + self.cross_attn(self.norm3(x), ctx=ctx)
        y = _ln_na(x) * (1 + sc2) + sh2
        return x + g2 * self.ffn(y)


def _sin_emb(t_frames, dim):
    half = dim // 2
    freqs = torch.exp(
        -np.log(10000.0) * torch.arange(half, dtype=torch.float32)
        / half)
    ang = t_frames[..., None].float() * 1000.0 * freqs
    return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)


class THead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.head = tnn.Linear(D, P * P * CFG.z_ch)
        self.modulation = tnn.Parameter(torch.zeros(1, 2, D))


class TWanDiT(tnn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embedding = tnn.Conv3d(
            CFG.z_ch + CFG.cond_ch, D, (1, P, P), stride=(1, P, P))
        self.text_embedding = tnn.Sequential(
            tnn.Linear(CFG.text_dim, D), tnn.GELU(approximate="tanh"),
            tnn.Linear(D, D))
        self.time_embedding = tnn.Sequential(
            tnn.Linear(CFG.freq_dim, D), tnn.SiLU(), tnn.Linear(D, D))
        self.time_projection = tnn.Sequential(
            tnn.SiLU(), tnn.Linear(D, 6 * D))
        self.blocks = tnn.ModuleList(
            [TWanBlock() for _ in range(CFG.layers)])
        self.head = THead()

    def forward(self, x, t_frames, cond, context):
        """x: (B, T, h, w, z); cond: (B, T, h, w, cond_ch);
        context: (B, n, text_dim)."""
        b, t, h, w, _ = x.shape
        hp, wp = h // P, w // P
        inp = torch.cat([x, cond], dim=-1).permute(0, 4, 1, 2, 3)
        tok = self.patch_embedding(inp)  # (B, D, T, hp, wp)
        tok = tok.flatten(2).transpose(1, 2)  # frame-major (B, N, D)

        ctx = self.text_embedding(context)
        te = self.time_embedding(_sin_emb(t_frames, CFG.freq_dim))
        e6 = self.time_projection(te).reshape(b, t, 6, D)

        freqs = _rope_3d_t(HD, t, hp, wp)
        fb = torch.arange(t).repeat_interleave(hp * wp) \
            // CFG.block_frames
        mask = torch.where(fb[None, :] <= fb[:, None],
                           torch.tensor(0.0), torch.tensor(-1e9))
        for blk in self.blocks:
            tok = blk(tok, e6, ctx, freqs, mask, hp * wp)

        m = self.head.modulation.unsqueeze(1) + te[:, :, None, :]
        m = m.repeat_interleave(hp * wp, dim=1)
        y = _ln_na(tok) * (1 + m[:, :, 1]) + m[:, :, 0]
        y = self.head.head(y)
        y = y.reshape(b, t, hp, wp, P, P, CFG.z_ch)
        y = y.permute(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h, w, CFG.z_ch)
        return y


def _pair():
    torch.manual_seed(21)
    tm = TWanDiT()
    g = torch.Generator().manual_seed(22)
    sd = {k: torch.randn(v.shape, generator=g) * 0.12
          for k, v in tm.state_dict().items()}
    tm.load_state_dict(sd)
    tm.eval()
    params = convert.convert_wan(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        CFG)
    return tm, params


def test_wan_dit_forward_equivalence():
    tm, params = _pair()
    rng = np.random.default_rng(9)
    x = rng.normal(0, 1, (2, T, LH, LW, CFG.z_ch)).astype(np.float32)
    cond = rng.normal(0, 1, (2, T, LH, LW, CFG.cond_ch)
                      ).astype(np.float32)
    # per-frame causal-student times: block 0 clean, block 1 active
    tf = np.asarray([[0.0] * 3 + [0.75] * 3] * 2, np.float32)
    ctx = rng.normal(0, 1, (2, 4, CFG.text_dim)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(tf),
                  torch.from_numpy(cond), torch.from_numpy(ctx)).numpy()
    got = np.asarray(wan_mod.WanDiT(CFG).apply(
        params, jnp.asarray(x), jnp.asarray(tf), jnp.asarray(cond),
        jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_wan_block_causality():
    """Block-causal contract: changing a LATER block's latents must not
    change an earlier block's prediction (with per-frame timesteps and
    the block mask, this is what makes the static-shape sampler equal
    to a KV-cached causal rollout)."""
    tm, params = _pair()
    rng = np.random.default_rng(10)
    x = rng.normal(0, 1, (1, T, LH, LW, CFG.z_ch)).astype(np.float32)
    cond = rng.normal(0, 1, (1, T, LH, LW, CFG.cond_ch)
                      ).astype(np.float32)
    tf = np.asarray([[0.0] * 3 + [1.0] * 3], np.float32)
    ctx = np.zeros((1, 4, CFG.text_dim), np.float32)
    model = wan_mod.WanDiT(CFG)
    a = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(tf),
                               jnp.asarray(cond), jnp.asarray(ctx)))
    x2 = x.copy()
    x2[:, 3:] += 10.0  # perturb the future block only
    b = np.asarray(model.apply(params, jnp.asarray(x2), jnp.asarray(tf),
                               jnp.asarray(cond), jnp.asarray(ctx)))
    np.testing.assert_allclose(a[:, :3], b[:, :3], atol=1e-5)
    assert np.abs(a[:, 3:] - b[:, 3:]).max() > 1e-3


def test_wan_sampler_runs_and_respects_blocks():
    """sample_causal produces finite latents; the VAE frame contract
    (T_lat divisible by block size) is enforced."""
    _, params = _pair()
    model = wan_mod.WanDiT(CFG)
    cond = jnp.zeros((1, T, LH, LW, CFG.cond_ch))
    out = wan_mod.sample_causal(
        lambda p, x, tf, c, ctx: model.apply(p, x, tf, c, ctx),
        params, jax.random.PRNGKey(0), cond, CFG)
    assert out.shape == (1, T, LH, LW, CFG.z_ch)
    assert np.isfinite(np.asarray(out)).all()


def test_wan_vae_frame_contract():
    """Encoder/decoder honor the Wan-VAE frame math the reference
    chunking is built on (T=4k-3 -> k latents -> T frames;
    pad_to_valid_t yields block-divisible latent counts)."""
    cfg = CFG.vae
    enc = wan_mod.WanVAEEncoder(cfg)
    dec = wan_mod.WanVAEDecoder(cfg)
    x = jnp.zeros((1, 9, 16, 16, 3))  # 4*3-3 frames
    ep = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    z = enc.apply(ep, x)
    assert z.shape == (1, 3, 2, 2, cfg.z_ch)
    dp = jax.jit(dec.init)(jax.random.PRNGKey(1), z)
    y = dec.apply(dp, z)
    assert y.shape == (1, 9, 16, 16, 3)
    assert wan_mod.pad_to_valid_t(225) == 225
    assert wan_mod.latent_frames(225) == 57 and 57 % 3 == 0
    # smallest 4k-3 with block-divisible latents >= 200 (same math as
    # reference _pad_to_valid_T: 51 latents -> 201 frames)
    assert wan_mod.pad_to_valid_t(200) == 201


def test_wan_vae_encoder_is_causal():
    """Causal temporal padding: perturbing frame t must not change
    latents that only cover frames < t."""
    cfg = CFG.vae
    enc = wan_mod.WanVAEEncoder(cfg)
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (1, 9, 16, 16, 3)).astype(np.float32)
    ep = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    z0 = np.asarray(enc.apply(ep, jnp.asarray(x)))
    x2 = x.copy()
    x2[:, 6:] += 5.0  # frames 6-8 feed only the LAST latent
    z1 = np.asarray(enc.apply(ep, jnp.asarray(x2)))
    np.testing.assert_allclose(z0[:, :2], z1[:, :2], atol=1e-5)
    assert np.abs(z0[:, 2:] - z1[:, 2:]).max() > 1e-4
