"""DINOv2-style ViT backbone (Flax linen).

The encoder family behind every Depth-Anything-class model the reference
wraps (video_metric_convert.py / videoanythingmetric_video.py /
upscale_depth_promptda.py wrap torch DINOv2-ViT models; see reference
other/metric_dpt_func.py:7-17). Re-implemented TPU-first:

- all matmuls in bfloat16 with float32 accumulation (MXU-friendly),
- static shapes: images are padded/resized to patch multiples up front,
- intermediate features returned from selected depths for the DPT head,
- optional sharding constraints on the token axis ('seq') and the
  head/hidden axes ('model') applied by the caller via jax.sharding.

Checkpoint conversion from torch DINOv2/DA-V2 weights lives in
``models.convert``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 14
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    layerscale_init: float = 1.0
    out_indices: Sequence[int] = (2, 5, 8, 11)
    dtype: str = "bfloat16"
    # 'xla' (DEFAULT) = jax.nn.dot_product_attention. Re-measured
    # round 5 on v5e at the production ViT-L config (518x924, batch
    # 32): the full forward runs 47.6 fps with 'xla' vs 39.6 fps with
    # 'flash' — this JAX's XLA attention now beats the stock Pallas
    # flash kernel at ViT token counts, and needs NO 512-padding of
    # the sequence (the pad-once machinery below only engages for the
    # Pallas kernels). 'flash' = stock Pallas TPU flash-attention
    # kernel fed from the packed qkv projection via ONE fused relayout
    # (see _flash_attention); kept selectable for configs where VMEM-
    # resident scores win. 'flash' silently falls back to 'xla'
    # off-TPU (tests/CPU), for tiny head dims, and for unpadded
    # sequences. 'flash_packed' = experimental packed-qkv Pallas
    # kernel (ops/attention_pallas.py) — measured slower than both;
    # opt-in only.
    attention_impl: str = "xla"
    # DA3-style input-adaptive cross-view self-attention: in the listed
    # block indices attention runs over the CONCATENATED tokens of all
    # views in a group (same qkv/proj weights — parameter-free, so any
    # DINOv2-family checkpoint loads unchanged). Empty = plain ViT.
    # The caller opts in per forward via ViT(...)(x, view_group=V).
    cross_view_indices: Sequence[int] = ()
    # None = bf16/f32 matmuls; 'int8' = dynamic weight+activation int8
    # for the block Dense layers (qkv/proj/fc1/fc2 — the FLOP mass),
    # riding the v5e MXU's double-rate int8 path. The param tree is
    # unchanged (quantization happens inside the jitted call), so every
    # checkpoint converter keeps working. See ops/quant.py.
    quant: str | None = None

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


VIT_S = ViTConfig(embed_dim=384, depth=12, num_heads=6,
                  out_indices=(2, 5, 8, 11))
VIT_B = ViTConfig(embed_dim=768, depth=12, num_heads=12,
                  out_indices=(2, 5, 8, 11))
VIT_L = ViTConfig(embed_dim=1024, depth=24, num_heads=16,
                  out_indices=(4, 11, 17, 23))
VIT_G = ViTConfig(embed_dim=1536, depth=40, num_heads=24,
                  out_indices=(9, 19, 29, 39))

PRESETS = {"vits": VIT_S, "vitb": VIT_B, "vitl": VIT_L, "vitg": VIT_G}

# above this many tokens the 'xla' attention path would materialize an
# (N, N) score tensor too large to schedule (DA3 cross-view at
# production dims: ~46 views x ~2.6k tokens = ~120k -> a 920 GB f32
# allocation); such calls reroute through the flash kernel, which is
# sub-quadratic in memory by construction.
_XLA_SCORE_TOKEN_LIMIT = 16384

# Tiny config for tests/smoke runs (also exposed as --model_size vitt).

VIT_TINY = ViTConfig(embed_dim=64, depth=4, num_heads=4,
                     out_indices=(0, 1, 2, 3))
PRESETS["vitt"] = VIT_TINY


def _flash_attention(qkv5, valid=None, conservative=False):
    """Stock Pallas TPU flash attention fed from the packed qkv output.

    This is the DEFAULT TPU attention path for every head count.
    (ops/attention_pallas.packed_flash_attention — an experiment in
    moving the head relayout into VMEM — measured ~4x slower at the
    production ViT-L shape and is opt-in only; see its docstring.)

    qkv5: (B, N, 3, H, HD) bf16 — a FREE bitcast view of the fused qkv
    dense output (B, N, 3*D). The q/k/v extraction + head split +
    (B, H, N, HD) relayout the stock kernel needs is done as ONE fused
    XLA transpose of this tensor; the previous split -> reshape -> per-
    tensor transpose chain materialized ~148 ms/iter of copies at
    ViT-L batch 32 on v5e (19% of the whole forward). Re-measured
    round 5 (isolated attention subgraph incl. this transpose,
    32x16x2560x64 v5e): ~20 ms/iter.

    N must already be padded to a 512 multiple by the caller (the ViT
    pads ONCE for the whole depth — per-layer pads measured 36 ms/iter
    of pure data movement at ViT-L/batch 16).

    ``valid``: (N,) bool marking real tokens. Valid tokens share one
    segment id, pads another, so interleaved pads (e.g. the cross-view
    concatenation of per-view padded sequences) are masked exactly.
    Scores stay in VMEM (the XLA path round-trips the (N, N) bf16 score
    tensor through HBM, which measures memory-bound at ViT-L token
    counts on v5e).
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa_mod

    b, n, _, h, hd = qkv5.shape
    assert n % 512 == 0, n
    qkvT = jnp.transpose(qkv5, (2, 0, 3, 1, 4))     # (3, B, H, N, HD)
    q, k, v = qkvT[0], qkvT[1], qkvT[2]             # free slices

    if valid is None:
        seg = jnp.ones((b, n), jnp.int32)
    else:
        seg = jnp.broadcast_to(valid.astype(jnp.int32)[None], (b, n))
    sids = fa_mod.SegmentIds(q=seg, kv=seg)
    # block sizes: measured on v5e at the production ViT-L shape
    # (32x16x2560x64): bq 1280 / bkm full / bk 1280 runs the
    # attention+qkv subgraph 10% faster than bq full / bk 512 (22.7 vs
    # 25.2 ms — bigger k blocks amortize the softmax renormalization
    # VPU work, which dominates at head dim 64). Falls back to the
    # bq-full/512 config when 1280 does not divide the padded length
    # (block_q/block_k must divide it), and under int8 quantization
    # (``conservative``): the int8 path's extra scoped-VMEM buffers
    # pushed the 1280/full config 504 KB past the 16 MB budget at
    # (32, 16, 2560, 64) — BENCH_r03 recorded NaN for the whole mode.
    if n % 1280 == 0 and not conservative:
        # block_k_major = whole sequence was the measured-best config
        # at ViT-L's n=2560; it must stay capped — the cross-view
        # reroute calls this with n ~ 120k, where a full-sequence
        # k-major block would not fit VMEM
        bs = fa_mod.BlockSizes(block_q=1280, block_k_major=min(n, 2560),
                               block_k=1280, block_b=1)
    else:
        # block_q must DIVIDE the padded length; n is a 512 multiple
        # but not necessarily a 4096 one (e.g. n=4608), so take the
        # largest 512-multiple divisor of n that fits in 4096.
        bq = max(q for q in range(512, min(4096, n) + 1, 512)
                 if n % q == 0)
        bs = fa_mod.BlockSizes(block_q=bq, block_k_major=512,
                               block_k=512, block_b=1)
    out = fa_mod.flash_attention(
        q, k, v, segment_ids=sids,
        causal=False, sm_scale=1.0 / float(hd) ** 0.5, block_sizes=bs)
    return out.transpose(0, 2, 1, 3)                # (B, N, H, HD)


class QDense(nn.Module):
    """Drop-in nn.Dense twin computing through ops.quant.int8_dense.

    Same param names/shapes/inits as nn.Dense (kernel f32 (in, out),
    bias f32 (out,)), so converted checkpoints load unchanged; only the
    matmul arithmetic differs (int8 x int8 -> int32 on the MXU with
    per-token activation and per-channel weight scales).
    """

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from metric_depth_video_toolbox_tpu.ops import quant
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return quant.int8_dense(x, kernel, bias, self.compute_dtype)


def _dense(cfg, features, name):
    if cfg.quant == "int8":
        return QDense(features, cfg.compute_dtype, name=name)
    return nn.Dense(features, dtype=cfg.compute_dtype, name=name)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, valid=None):
        """``valid``: optional (N,) bool marking real tokens when the
        sequence is pre-padded (shared across the batch)."""
        c = self.cfg
        d = c.embed_dim
        hd = d // c.num_heads
        qkv = _dense(c, 3 * d, "qkv")(x)
        use_flash = (c.attention_impl == "flash"
                     and jax.default_backend() == "tpu"
                     and hd >= 64
                     and c.dtype == "bfloat16"
                     and qkv.shape[1] % 512 == 0)
        if (c.attention_impl == "flash_packed"
                and jax.default_backend() == "tpu"
                and c.num_heads % 8 == 0 and hd >= 64
                and c.dtype == "bfloat16" and qkv.shape[1] % 512 == 0):
            # opt-in experimental kernel (ops/attention_pallas.py).
            # MEASURED SLOWER than the stock path at the production
            # ViT-L shape (32x16x2560x64 on v5e: ~80 ms vs ~20 ms for
            # the attention subgraph) and its large-block configs
            # exceed scoped VMEM — kept for reference, NOT the default.
            from metric_depth_video_toolbox_tpu.ops import attention_pallas
            b_, n_ = qkv.shape[0], qkv.shape[1]
            qkv4 = qkv.astype(c.compute_dtype).reshape(
                b_, n_, 3 * c.num_heads, hd)
            valid_v = (valid if valid is not None
                       else jnp.ones((n_,), jnp.int32))
            out = attention_pallas.packed_flash_attention(
                qkv4, valid_v, num_heads=c.num_heads,
                sm_scale=1.0 / float(hd) ** 0.5,
                block_q=128, block_k=512)
        elif use_flash:
            b_, n_ = qkv.shape[0], qkv.shape[1]
            qkv5 = qkv.astype(c.compute_dtype).reshape(
                b_, n_, 3, c.num_heads, hd)
            out = _flash_attention(qkv5, valid=valid,
                                   conservative=c.quant == "int8")
        elif (jax.default_backend() == "tpu" and hd >= 64
                and c.dtype == "bfloat16"
                and qkv.shape[1] >= _XLA_SCORE_TOKEN_LIMIT):
            # XLA attention at huge sequence lengths materializes the
            # (N, N) score tensor: DA3's cross-view blocks concatenate
            # ~46 views x ~2.6k tokens = ~120k tokens, a 920 GB f32
            # allocation that cannot compile. Route through the flash
            # kernel with a LOCAL 512-pad (masked via the valid
            # vector, sliced off after) — the sub-quadratic-memory
            # formulation is mandatory here, not a speed preference.
            b_, n_ = qkv.shape[0], qkv.shape[1]
            n_pad = (-n_) % 512
            base_valid = (valid if valid is not None
                          else jnp.ones((n_,), bool))
            vpad = jnp.pad(base_valid.astype(bool), (0, n_pad))
            qkvp = jnp.pad(qkv.astype(c.compute_dtype),
                           ((0, 0), (0, n_pad), (0, 0)))
            qkv5 = qkvp.reshape(b_, n_ + n_pad, 3, c.num_heads, hd)
            out = _flash_attention(qkv5, valid=vpad,
                                   conservative=c.quant == "int8")
            out = out[:, :n_]
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(t):
                return t.reshape(
                    t.shape[:-1] + (c.num_heads, d // c.num_heads))
            q, k, v = heads(q), heads(k), heads(v)
            q = q.astype(c.compute_dtype)
            k = k.astype(c.compute_dtype)
            v = v.astype(c.compute_dtype)
            # fused XLA attention: still avoids the f32 score tensor;
            # mask pad KEYS out of the softmax when present (pad query
            # rows produce garbage that is positionally sliced off later
            # and never mixes back into valid tokens)
            if valid is not None:
                bias = jnp.where(valid, 0.0, -1e9).astype(q.dtype)
                out = jax.nn.dot_product_attention(
                    q, k, v, bias=bias[None, None, None])
            else:
                out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(out.shape[:-2] + (d,))
        return _dense(c, d, "proj")(out)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hidden = int(c.embed_dim * c.mlp_ratio)
        x = _dense(c, hidden, "fc1")(x)
        # DINOv2 uses torch nn.GELU's default = exact erf. In float32
        # (where weight-exactness is verified vs HF torch) compute it
        # exactly; in bf16 production the tanh approximation's ~1.5e-3
        # relative error sits below bf16 rounding (eps 7.8e-3) and erf
        # measured ~15% of total ViT-L inference time on v5e.
        x = nn.gelu(x, approximate=c.dtype == "bfloat16")
        return _dense(c, c.embed_dim, "fc2")(x)


class LayerScale(nn.Module):
    dim: int
    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init),
                           (self.dim,))
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, valid=None):
        c = self.cfg
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        y = Attention(c, name="attn")(y, valid=valid)
        x = x + LayerScale(c.embed_dim, c.layerscale_init, name="ls1")(y)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        y = Mlp(c, name="mlp")(y)
        return x + LayerScale(c.embed_dim, c.layerscale_init, name="ls2")(y)


class ViT(nn.Module):
    """Returns the list of (B, N, D) token features at cfg.out_indices
    (post-final-norm applied to each, DINOv2 'get_intermediate_layers'
    convention with norm=True), plus the cls token of the last block.
    """
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images, cond=None, view_group=None):
        """images: (B, H, W, 3) float in [0, 1]; H, W % patch_size == 0.
        ``cond``: optional (B, gh, gw, D) additive patch-token
        conditioning (e.g. UniDepth-style camera-ray embeddings).
        ``view_group``: DA3-style multi-view mode — B is a stack of
        view groups of this size, and blocks listed in
        cfg.cross_view_indices attend over the concatenated tokens of
        each whole group (same weights; the cross-view mixing is purely
        an input reshape, so single-view checkpoints load unchanged)."""
        c = self.cfg
        b, h, w, _ = images.shape
        p = c.patch_size
        gh, gw = h // p, w // p

        mean = jnp.asarray([0.485, 0.456, 0.406], c.compute_dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], c.compute_dtype)
        x = (images.astype(c.compute_dtype) - mean) / std

        x = nn.Conv(c.embed_dim, (p, p), strides=(p, p),
                    dtype=c.compute_dtype, name="patch_embed")(x)
        x = x.reshape(b, gh * gw, c.embed_dim)
        if cond is not None:
            x = x + cond.reshape(b, gh * gw, c.embed_dim).astype(x.dtype)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.embed_dim))
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, gh * gw + 1, c.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.embed_dim)), x],
            axis=1)
        x = x + pos.astype(x.dtype)

        # pad the token axis to a 512 multiple ONCE for the whole depth:
        # flash attention wants 512-aligned sequences, and per-layer
        # padding measured 36 ms/iter of pure pad traffic at ViT-L
        # batch 16. Pad rows are masked out of attention via segment
        # ids and sliced off at extraction; LN/MLP on them is the 4.8%
        # tax that buys aligned shapes everywhere.
        n_real = gh * gw + 1
        n_pad = (-n_real) % 512 if (
            c.attention_impl in ("flash", "flash_packed")
            and jax.default_backend() == "tpu") else 0
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))

        final_norm = nn.LayerNorm(dtype=jnp.float32, name="norm")
        wanted = set(c.out_indices)
        stored = {}
        n_tok = x.shape[1]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (n_tok,), 0) < n_real
                 if n_pad else None)
        vg = view_group if (view_group and view_group > 1) else None
        d_ = c.embed_dim
        for i in range(c.depth):
            blk = Block(c, name=f"block{i}")
            if vg and i in c.cross_view_indices:
                # cross-view: concatenate the group's sequences (pads
                # stay interleaved; segment ids mask them exactly)
                xg = x.reshape(b // vg, vg * n_tok, d_)
                vgm = (jnp.tile(valid, vg) if valid is not None else None)
                x = blk(xg, valid=vgm).reshape(b, n_tok, d_)
            else:
                x = blk(x, valid=valid)
            if i in wanted:
                # cast to compute dtype right away: the DPT head's convs
                # cast their input anyway, so this is numerically
                # identical and halves the bytes of 4 materialized
                # (B, N, D) feature tensors in bf16 mode
                stored[i] = final_norm(x[:, :n_real]).astype(c.compute_dtype)
        xn = final_norm(x[:, :n_real])
        # select in out_indices order (duplicates allowed, e.g. tiny configs)
        feats = [stored[i] for i in c.out_indices]
        patch_feats = [f[:, 1:].reshape(b, gh, gw, c.embed_dim)
                       for f in feats]
        return patch_feats, xn[:, 0]
