"""Weight-exactness for the SVD spatio-temporal UNet + temporal VAE.

Builds a torch re-implementation of the diffusers graph
(UNetSpatioTemporalConditionModel / AutoencoderKLTemporalDecoder — the
checkpoint family StereoCrafter fine-tunes, reference
stereo_crafter_infill.py:97-99) with diffusers' exact state-dict key
layout, then proves models.convert.convert_svd_{unet,vae} + models.svd
reproduce the torch forward numerically. Same pattern as
test_weight_exact_raft.py (torch mirror of the public op order).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metric_depth_video_toolbox_tpu.models import convert, svd  # noqa: E402


def t_timesteps(t, dim):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half).float() / half
    emb = t.float()[:, None] * exponent.exp()[None]
    return torch.cat([emb.cos(), emb.sin()], -1)


class TEmb(tnn.Module):
    def __init__(self, i, inner, out=None):
        super().__init__()
        self.linear_1 = tnn.Linear(i, inner)
        self.linear_2 = tnn.Linear(inner, out or inner)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TMix(tnn.Module):
    def __init__(self, switch):
        super().__init__()
        self.mix_factor = tnn.Parameter(torch.tensor([0.5]))
        self.switch = switch

    def forward(self, xs, xt):
        a = torch.sigmoid(self.mix_factor)
        if self.switch:
            a = 1.0 - a
        return a * xs + (1.0 - a) * xt


class TRes2D(tnn.Module):
    def __init__(self, cin, cout, temb=None, eps=1e-6):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb:
            self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(32, cout, eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TResT(tnn.Module):
    """TemporalResnetBlock: (B, C, F, H, W), (3,1,1) convs."""

    def __init__(self, cin, cout, temb=None, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps)
        self.conv1 = tnn.Conv3d(cin, cout, (3, 1, 1), padding=(1, 0, 0))
        if temb:
            self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(32, cout, eps)
        self.conv2 = tnn.Conv3d(cout, cout, (3, 1, 1), padding=(1, 0, 0))
        if cin != cout:
            self.conv_shortcut = tnn.Conv3d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            t = self.time_emb_proj(F.silu(temb))[:, :, :, None, None]
            h = h + t.permute(0, 2, 1, 3, 4)
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TSTRes(tnn.Module):
    def __init__(self, cin, cout, temb=None, eps=1e-6, teps=None,
                 switch=True):
        super().__init__()
        self.spatial_res_block = TRes2D(cin, cout, temb, eps)
        self.temporal_res_block = TResT(cout, cout, temb, teps or eps)
        self.time_mixer = TMix(switch)

    def forward(self, x, temb, nf):
        h = self.spatial_res_block(x, temb)
        bf, c, hh, ww = h.shape
        mix = h.reshape(bf // nf, nf, c, hh, ww).permute(0, 2, 1, 3, 4)
        te = temb.reshape(bf // nf, nf, -1) if temb is not None else None
        ht = self.temporal_res_block(mix, te)
        out = self.time_mixer(mix, ht)
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class TAttn(tnn.Module):
    def __init__(self, dim, heads, ctx=None, bias=False):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=bias)
        self.to_k = tnn.Linear(ctx or dim, dim, bias=bias)
        self.to_v = tnn.Linear(ctx or dim, dim, bias=bias)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, c = x.shape
        sk = ctx.shape[1]
        dh = c // self.heads
        q = self.to_q(x).reshape(b, s, self.heads, dh).transpose(1, 2)
        k = self.to_k(ctx).reshape(b, sk, self.heads, dh).transpose(1, 2)
        v = self.to_v(ctx).reshape(b, sk, self.heads, dh).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(dh), -1)
        o = (a @ v).transpose(1, 2).reshape(b, s, c)
        return self.to_out[0](o)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        a, g = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(g)


class TFF(tnn.Module):
    def __init__(self, dim, out=None):
        super().__init__()
        self.net = tnn.ModuleList(
            [TGEGLU(dim, dim * 4), tnn.Identity(),
             tnn.Linear(dim * 4, out or dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TBasic(tnn.Module):
    def __init__(self, dim, heads, ctx):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttn(dim, heads, ctx)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFF(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TTemporalBasic(tnn.Module):
    def __init__(self, dim, heads, ctx):
        super().__init__()
        self.norm_in = tnn.LayerNorm(dim)
        self.ff_in = TFF(dim)
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttn(dim, heads, ctx)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFF(dim)

    def forward(self, x, time_ctx, nf):
        bf, s, c = x.shape
        h = x.reshape(bf // nf, nf, s, c).permute(0, 2, 1, 3)
        h = h.reshape(bf // nf * s, nf, c)
        res = h
        h = self.ff_in(self.norm_in(h)) + res
        h = h + self.attn1(self.norm1(h))
        h = h + self.attn2(self.norm2(h), time_ctx)
        h = h + self.ff(self.norm3(h))
        h = h.reshape(bf // nf, s, nf, c).permute(0, 2, 1, 3)
        return h.reshape(bf, s, c)


class TTransformerST(tnn.Module):
    def __init__(self, dim, heads, ctx, n_layers=1):
        super().__init__()
        self.norm = tnn.GroupNorm(32, dim, 1e-6)
        self.proj_in = tnn.Linear(dim, dim)
        self.transformer_blocks = tnn.ModuleList(
            [TBasic(dim, heads, ctx) for _ in range(n_layers)])
        self.temporal_transformer_blocks = tnn.ModuleList(
            [TTemporalBasic(dim, heads, ctx) for _ in range(n_layers)])
        self.time_pos_embed = TEmb(dim, dim * 4, dim)
        self.time_mixer = TMix(switch=False)
        self.proj_out = tnn.Linear(dim, dim)

    def forward(self, x, ctx):
        bf, c, hh, ww = x.shape
        nf = bf  # batch 1
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
        h = self.proj_in(h)
        emb = self.time_pos_embed(
            t_timesteps(torch.arange(nf), c))[:, None]
        time_ctx = ctx[0:1].expand(hh * ww, -1, -1)
        for blk, tblk in zip(self.transformer_blocks,
                             self.temporal_transformer_blocks):
            h_sp = blk(h, ctx)
            h_mix = tblk(h_sp + emb, time_ctx, nf)
            h = self.time_mixer(h_sp, h_mix)
        h = self.proj_out(h)
        h = h.reshape(bf, hh, ww, c).permute(0, 3, 1, 2)
        return h + res


class TDownsampler(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TUpsampler(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0,
                                       mode="nearest"))


class TDownBlock(tnn.Module):
    def __init__(self, cin, cout, temb, layers, heads, ctx, cross, pool,
                 n_layers=1):
        super().__init__()
        eps = 1e-6 if cross else 1e-5
        self.resnets = tnn.ModuleList(
            [TSTRes(cin if j == 0 else cout, cout, temb, eps)
             for j in range(layers)])
        if cross:
            self.attentions = tnn.ModuleList(
                [TTransformerST(cout, heads, ctx, n_layers)
                 for _ in range(layers)])
        if pool:
            self.downsamplers = tnn.ModuleList([TDownsampler(cout)])

    def forward(self, h, emb, ctx, nf):
        out = []
        for j, res in enumerate(self.resnets):
            h = res(h, emb, nf)
            if hasattr(self, "attentions"):
                h = self.attentions[j](h, ctx)
            out.append(h)
        if hasattr(self, "downsamplers"):
            h = self.downsamplers[0](h)
            out.append(h)
        return h, out


class TMidBlock(tnn.Module):
    def __init__(self, ch, temb, heads, ctx, n_layers=1):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TSTRes(ch, ch, temb, 1e-5), TSTRes(ch, ch, temb, 1e-5)])
        self.attentions = tnn.ModuleList(
            [TTransformerST(ch, heads, ctx, n_layers)])

    def forward(self, h, emb, ctx, nf):
        h = self.resnets[0](h, emb, nf)
        h = self.attentions[0](h, ctx)
        return self.resnets[1](h, emb, nf)


class TUpBlock(tnn.Module):
    def __init__(self, prev_ch, skip_chs, cout, temb, heads, ctx, cross,
                 up, n_layers=1):
        super().__init__()
        eps = 1e-6 if cross else 1e-5
        resnets = []
        cin = prev_ch
        for j, sc in enumerate(skip_chs):
            resnets.append(TSTRes(cin + sc, cout, temb, eps))
            cin = cout
        self.resnets = tnn.ModuleList(resnets)
        if cross:
            self.attentions = tnn.ModuleList(
                [TTransformerST(cout, heads, ctx, n_layers)
                 for _ in skip_chs])
        if up:
            self.upsamplers = tnn.ModuleList([TUpsampler(cout)])

    def forward(self, h, skips, emb, ctx, nf):
        for j, res in enumerate(self.resnets):
            h = torch.cat([h, skips.pop()], dim=1)
            h = res(h, emb, nf)
            if hasattr(self, "attentions"):
                h = self.attentions[j](h, ctx)
        if hasattr(self, "upsamplers"):
            h = self.upsamplers[0](h)
        return h


class TSVDUNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        ted = chans[0] * 4
        n = len(chans)
        self.cfg = cfg
        self.conv_in = tnn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = TEmb(chans[0], ted)
        self.add_embedding = TEmb(3 * cfg.addition_time_embed_dim, ted)
        self.down_blocks = tnn.ModuleList()
        cin = chans[0]
        for i, ch in enumerate(chans):
            self.down_blocks.append(TDownBlock(
                cin, ch, ted, cfg.layers_per_block,
                cfg.num_attention_heads[i], cfg.cross_attention_dim,
                cross=i < n - 1, pool=i < n - 1,
                n_layers=cfg.transformer_layers_per_block))
            cin = ch
        self.mid_block = TMidBlock(chans[-1], ted,
                                   cfg.num_attention_heads[-1],
                                   cfg.cross_attention_dim,
                                   cfg.transformer_layers_per_block)
        # skip channel bookkeeping mirrors diffusers up-block wiring
        skip_chs = [chans[0]]
        for i, ch in enumerate(chans):
            skip_chs += [ch] * cfg.layers_per_block
            if i < n - 1:
                skip_chs.append(ch)
        self.up_blocks = tnn.ModuleList()
        prev = chans[-1]
        for k in range(n):
            i = n - 1 - k
            take = cfg.layers_per_block + 1
            skips = list(reversed(skip_chs[-take:]))
            del skip_chs[-take:]
            self.up_blocks.append(TUpBlock(
                prev, skips, chans[i], ted, cfg.num_attention_heads[i],
                cfg.cross_attention_dim, cross=i < n - 1, up=i > 0,
                n_layers=cfg.transformer_layers_per_block))
            prev = chans[i]
        self.conv_norm_out = tnn.GroupNorm(32, chans[0], 1e-5)
        self.conv_out = tnn.Conv2d(chans[0], cfg.out_channels, 3,
                                   padding=1)

    def forward(self, x, c_noise, ctx, add_ids):
        nf = x.shape[0]
        t_emb = t_timesteps(c_noise[None], self.cfg.block_out_channels[0])
        emb = self.time_embedding(t_emb)
        aug = t_timesteps(add_ids,
                          self.cfg.addition_time_embed_dim).reshape(1, -1)
        emb = (emb + self.add_embedding(aug)).expand(nf, -1)
        ctx = ctx.expand(nf, -1, -1)
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            h, outs = blk(h, emb, ctx, nf)
            skips += outs
        h = self.mid_block(h, emb, ctx, nf)
        for blk in self.up_blocks:
            h = blk(h, skips, emb, ctx, nf)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("seed", [0])
def test_svd_unet_forward_equivalence(seed):
    cfg = svd.SVD_TINY
    torch.manual_seed(seed)
    tm = TSVDUNet(cfg).eval()
    rng = np.random.default_rng(seed)
    f, hh, ww = 3, 16, 16
    x = rng.normal(0, 1, (f, cfg.in_channels, hh, ww)).astype(np.float32)
    ctx = rng.normal(0, 1, (1, 1, cfg.cross_attention_dim)).astype(
        np.float32)
    add_ids = np.array([6.0, 127.0, 0.02], np.float32)
    c_noise = np.float32(0.7)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.tensor(c_noise),
                 torch.from_numpy(ctx),
                 torch.from_numpy(add_ids)).numpy()

    params = convert.convert_svd_unet(_sd(tm), cfg)
    model = svd.SVDUNet(cfg)
    out = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(c_noise), jnp.asarray(ctx),
                      jnp.asarray(add_ids))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert np.max(np.abs(out - ref)) < 2e-4, np.max(np.abs(out - ref))


class TEncDownBlock(tnn.Module):
    def __init__(self, cin, cout, layers, pool):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TRes2D(cin if j == 0 else cout, cout, None, 1e-6)
             for j in range(layers)])
        if pool:
            self.downsamplers = tnn.ModuleList([TDownsampler(cout)])
            self.downsamplers[0].conv = tnn.Conv2d(cout, cout, 3,
                                                   stride=2, padding=0)

    def forward(self, h):
        for res in self.resnets:
            h = res(h)
        if hasattr(self, "downsamplers"):
            h = F.pad(h, (0, 1, 0, 1))
            h = self.downsamplers[0].conv(h)
        return h


class TVAEAttn(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, ch, 1e-6)
        inner = TAttn(ch, 1, bias=True)
        self.to_q, self.to_k = inner.to_q, inner.to_k
        self.to_v, self.to_out = inner.to_v, inner.to_out
        self._inner = inner

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = self._inner(h)
        return x + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class TVAEMid(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TRes2D(ch, ch, None, 1e-6), TRes2D(ch, ch, None, 1e-6)])
        self.attentions = tnn.ModuleList([TVAEAttn(ch)])

    def forward(self, h):
        h = self.resnets[0](h)
        h = self.attentions[0](h)
        return self.resnets[1](h)


class TEncoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        n = len(chans)
        self.conv_in = tnn.Conv2d(3, chans[0], 3, padding=1)
        self.down_blocks = tnn.ModuleList()
        cin = chans[0]
        for i, ch in enumerate(chans):
            self.down_blocks.append(
                TEncDownBlock(cin, ch, cfg.layers_per_block, i < n - 1))
            cin = ch
        self.mid_block = TVAEMid(chans[-1])
        self.conv_norm_out = tnn.GroupNorm(32, chans[-1], 1e-6)
        self.conv_out = tnn.Conv2d(chans[-1], 2 * cfg.latent_channels, 3,
                                   padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TDecMid(tnn.Module):
    def __init__(self, ch, layers):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TSTRes(ch, ch, None, 1e-6, 1e-5, switch=False)
             for _ in range(layers)])
        self.attentions = tnn.ModuleList([TVAEAttn(ch)])

    def forward(self, h, nf):
        h = self.resnets[0](h, None, nf)
        h = self.attentions[0](h)
        for res in self.resnets[1:]:
            h = res(h, None, nf)
        return h


class TDecUpBlock(tnn.Module):
    def __init__(self, cin, cout, layers, up):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TSTRes(cin if j == 0 else cout, cout, None, 1e-6, 1e-5,
                    switch=False) for j in range(layers)])
        if up:
            self.upsamplers = tnn.ModuleList([TUpsampler(cout)])

    def forward(self, h, nf):
        for res in self.resnets:
            h = res(h, None, nf)
        if hasattr(self, "upsamplers"):
            h = self.upsamplers[0](h)
        return h


class TTemporalDecoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        n = len(chans)
        self.conv_in = tnn.Conv2d(cfg.latent_channels, chans[-1], 3,
                                  padding=1)
        self.mid_block = TDecMid(chans[-1], cfg.layers_per_block)
        self.up_blocks = tnn.ModuleList()
        prev = chans[-1]
        for k in range(n):
            i = n - 1 - k
            self.up_blocks.append(TDecUpBlock(
                prev, chans[i], cfg.layers_per_block + 1, up=i > 0))
            prev = chans[i]
        self.conv_norm_out = tnn.GroupNorm(32, chans[0], 1e-6)
        oc = cfg.out_channels
        self.conv_out = tnn.Conv2d(chans[0], oc, 3, padding=1)
        self.time_conv_out = tnn.Conv3d(oc, oc, (3, 1, 1),
                                        padding=(1, 0, 0))

    def forward(self, z, nf):
        h = self.conv_in(z)
        h = self.mid_block(h, nf)
        for blk in self.up_blocks:
            h = blk(h, nf)
        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        bf, c, hh, ww = h.shape
        v = h.reshape(bf // nf, nf, c, hh, ww).permute(0, 2, 1, 3, 4)
        v = self.time_conv_out(v)
        return v.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class TVAE(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TTemporalDecoder(cfg)
        self.quant_conv = tnn.Conv2d(2 * cfg.latent_channels,
                                     2 * cfg.latent_channels, 1)


def test_svd_vae_forward_equivalence():
    cfg = svd.SVD_VAE_TINY
    torch.manual_seed(1)
    tm = TVAE(cfg).eval()
    rng = np.random.default_rng(1)
    f, hh, ww = 3, 16, 16
    x = rng.uniform(-1, 1, (f, 3, hh, ww)).astype(np.float32)

    with torch.no_grad():
        moments = tm.quant_conv(tm.encoder(torch.from_numpy(x)))
        lat_ref = moments[:, :cfg.latent_channels].numpy() \
            * cfg.scaling_factor
        dec_ref = tm.decoder(
            torch.from_numpy(lat_ref / cfg.scaling_factor), f).numpy()

    params = convert.convert_svd_vae(_sd(tm), cfg)
    enc = svd.SVDVAEEncoder(cfg)
    lat = enc.apply({"params": params["encoder"]["params"]},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    lat_np = np.asarray(lat).transpose(0, 3, 1, 2)
    assert np.max(np.abs(lat_np - lat_ref)) < 2e-4

    dec = svd.SVDVAEDecoder(cfg)
    out = dec.apply({"params": params["decoder"]["params"]},
                    jnp.asarray(lat_ref.transpose(0, 2, 3, 1)))
    out_np = np.asarray(out).transpose(0, 3, 1, 2)
    assert np.max(np.abs(out_np - dec_ref)) < 2e-4, \
        np.max(np.abs(out_np - dec_ref))


def test_pmap_vae_forward_equivalence():
    """GeometryCrafter point-map VAE (PMapAutoencoderKLTemporalDecoder
    role, reference geometrycrafter_video.py:311-317): same KL encoder /
    temporal decoder graph with a 4-channel decode (xyz + valid-mask
    logit) — converted weights reproduce the torch mirror."""
    cfg = svd.PMAP_VAE_TINY
    torch.manual_seed(4)
    tm = TVAE(cfg).eval()
    rng = np.random.default_rng(6)
    f, hh, ww = 3, 16, 16
    pmap = rng.uniform(-1, 1, (f, 3, hh, ww)).astype(np.float32)

    with torch.no_grad():
        moments = tm.quant_conv(tm.encoder(torch.from_numpy(pmap)))
        lat_ref = moments[:, :cfg.latent_channels].numpy() \
            * cfg.scaling_factor
        dec_ref = tm.decoder(
            torch.from_numpy(lat_ref / cfg.scaling_factor), f).numpy()
    assert dec_ref.shape[1] == 4

    params = convert.convert_svd_vae(_sd(tm), cfg)
    lat = svd.SVDVAEEncoder(cfg).apply(
        {"params": params["encoder"]["params"]},
        jnp.asarray(pmap.transpose(0, 2, 3, 1)))
    assert np.max(np.abs(np.asarray(lat).transpose(0, 3, 1, 2)
                         - lat_ref)) < 2e-4
    out = svd.SVDVAEDecoder(cfg).apply(
        {"params": params["decoder"]["params"]},
        jnp.asarray(lat_ref.transpose(0, 2, 3, 1)))
    assert np.max(np.abs(np.asarray(out).transpose(0, 3, 1, 2)
                         - dec_ref)) < 2e-4


def test_geometrycrafter_engine_pmap_vae_path():
    """A converted point-map VAE switches GeometryCrafterEngine onto the
    dedicated encode/decode path (pipeline/depth.py) end to end."""
    from metric_depth_video_toolbox_tpu.pipeline import depth as dp
    cfg = svd.PMAP_VAE_TINY
    torch.manual_seed(5)
    pparams = convert.convert_svd_vae(_sd(TVAE(cfg).eval()), cfg)
    eng = dp.GeometryCrafterEngine(
        window=4, overlap=0, work_hw=(16, 16), max_depth=20.0,
        pmap_vae_params=pparams, pmap_vae_cfg=cfg)
    assert eng._pmap_enc is not None
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (4, 24, 24, 3), np.uint8)
    prior = rng.uniform(1.0, 5.0, (4, 24, 24)).astype(np.float32)
    d = eng.infer_video(frames, prior)
    assert d.shape == (4, 24, 24) and np.isfinite(d).all()
    assert (d >= 0).all() and (d <= 20.0).all()


def test_stereocrafter_engine_end_to_end():
    """Converted (tiny) SVD UNet+VAE drive DiffusionInfillEngine: the
    exact StereoCrafter graph runs through the chunked infill path and
    leaves non-hole pixels untouched."""
    from metric_depth_video_toolbox_tpu.pipeline import infill_diffusion

    ucfg = svd.SVD_TINY
    vcfg = svd.SVD_VAE_TINY
    torch.manual_seed(2)
    params = convert.convert_stereocrafter(
        _sd(TSVDUNet(ucfg).eval()), _sd(TVAE(vcfg).eval()), ucfg, vcfg)

    eng = infill_diffusion.DiffusionInfillEngine(
        cfg=ucfg, params=params, work_hw=(32, 32), chunk=5, overlap=2,
        data_parallel=False, vae_cfg=vcfg)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (5, 40, 48, 3), np.uint8)
    hole = np.zeros((5, 40, 48), bool)
    hole[:, 10:20, 12:30] = True
    out = np.asarray(eng.infill_chunk(frames, hole))
    assert out.shape == frames.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out[~hole], frames[~hole])


def test_stereocrafter_engine_with_clip_context():
    """SVD engine with a converted CLIP tower: the cross-attention
    context becomes the real image embedding (projection_dim must match
    cross_attention_dim, as in SVD ViT-H -> 1024)."""
    transformers = pytest.importorskip("transformers")
    from metric_depth_video_toolbox_tpu.models import clip as clip_mod
    from metric_depth_video_toolbox_tpu.pipeline import infill_diffusion

    ucfg = svd.SVD_TINY
    vcfg = svd.SVD_VAE_TINY
    torch.manual_seed(4)
    params = convert.convert_stereocrafter(
        _sd(TSVDUNet(ucfg).eval()), _sd(TVAE(vcfg).eval()), ucfg, vcfg)
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=ucfg.cross_attention_dim)
    tower = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    ccfg = clip_mod.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
        image_size=32, patch_size=8,
        projection_dim=ucfg.cross_attention_dim)
    clip_params = convert.convert_clip_vision(_sd(tower), ccfg)

    eng = infill_diffusion.DiffusionInfillEngine(
        cfg=ucfg, params=params, work_hw=(32, 32), chunk=3, overlap=0,
        data_parallel=False, vae_cfg=vcfg, clip_params=clip_params,
        clip_cfg=ccfg)
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (3, 32, 32, 3), np.uint8)
    hole = np.zeros((3, 32, 32), bool)
    hole[:, 8:16, 8:24] = True
    out = np.asarray(eng.infill_chunk(frames, hole))
    assert out.shape == frames.shape
    np.testing.assert_array_equal(out[~hole], frames[~hole])


def test_svd_denoise_preconditioning():
    """svd_denoise implements the v-prediction EDM identities around the
    raw UNet: out = z/(s^2+1) - F * s/sqrt(s^2+1), input scaled by
    1/sqrt(s^2+1)."""
    calls = {}

    def fake_apply(params, x, c_noise, ctx, ids):
        calls["x"] = x
        calls["c_noise"] = c_noise
        return jnp.ones_like(x[..., :4])

    z = jnp.full((2, 4, 4, 4), 2.0)
    sigma = jnp.float32(3.0)
    out = svd.svd_denoise(fake_apply, None, z, sigma,
                          jnp.zeros((1, 1, 8)), jnp.zeros(3))
    np.testing.assert_allclose(
        np.asarray(calls["x"]), 2.0 / np.sqrt(10.0), rtol=1e-6)
    np.testing.assert_allclose(
        float(calls["c_noise"]), 0.25 * np.log(3.0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out), 2.0 / 10.0 - 3.0 / np.sqrt(10.0), rtol=1e-6)
