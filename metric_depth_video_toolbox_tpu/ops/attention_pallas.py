"""Pallas TPU flash attention over the PACKED qkv projection output.

STATUS: opt-in experiment (cfg.attention_impl='flash_packed'), NOT the
default. Measured on v5e at the production ViT-L attention shape
(32x16x2560x64), isolated attention subgraph including the relayout:

    packed kernel (this file), best compiling blocks (128, 512):  ~80 ms
    stock flash kernel fed via ONE fused 5-D transpose (vit.py):  ~20 ms
    jax.nn.dot_product_attention (XLA), same transpose:           ~16 ms

The hypothesis was that the token-major -> head-major HBM relayout
between the qkv projection and the stock kernel could be moved into
VMEM for free; in practice the in-kernel jnp.swapaxes forces Mosaic
into strided VMEM loads that starve the MXU, and the (8, bq, bk) f32
score temporaries push large-block configs past the 16 MB scoped-VMEM
budget (block_k >= 512 with block_q >= 256 fails to compile at ViT-L
dims). The single fused 5-D transpose in models/vit.py already
eliminates the ~148 ms/iter split/reshape/transpose copy chain that
motivated this kernel, which removes its reason to exist as a default.

Retained because the packed-qkv consumption pattern (free bitcast of
the projection output; dim-2 index = role*H + head, the torch/DINOv2
fused-qkv row layout) is the right interface for a future fused
projection+attention kernel. Original design notes follow.

This kernel consumes the projection output directly through a free
bitcast:

    qkv  = Dense(3*D_model)(x)             # (B, N, 3*D_model), bf16
    qkv4 = qkv.reshape(B, N, 3*H, D)       # FREE bitcast, no copy
    out  = packed_flash_attention(qkv4)    # (B, N, H, D)
    proj = Dense(D_model)(out.reshape(B, N, D_model))   # free bitcast

Along dim 2 of qkv4, index j = role*H + h (role 0/1/2 = q/k/v, head h)
— exactly the row layout of a torch/DINOv2 fused qkv weight, so
converted checkpoints need no re-packing.

The token-major -> head-major relayout every attention kernel needs
happens INSIDE the kernel as VMEM register shuffles (jnp.swapaxes on
the loaded block) instead of HBM round-trips: VMEM relayout bandwidth
is ~20x HBM's, so the cost disappears into the matmul time.

Grid (B, H/8, N/block_q, N/block_k); Mosaic wants the last two block
dims (8, 128)-aligned, hence 8-head groups — models whose head count
is not a multiple of 8 fall back to the stock kernel in models/vit.py.
All 8 heads of a group are computed by ONE batched dot_general per
step (Mosaic requires dot batch dims leading, which the in-VMEM
swapaxes provides; a Python per-head loop unrolls and keeps 8 full
score buffers live -> measured 123 MB scoped VMEM = OOM, and
fori_loop over heads needs a dynamic_slice Mosaic cannot lower).
The softmax is the standard online/streaming formulation over k
blocks, so per-step temporaries are (8, block_q, block_k) — VMEM use
is bounded regardless of sequence length.

Padding is masked with an additive -inf on key columns from a (1, N)
validity vector (supports interleaved pads, e.g. DA3 cross-view
concatenation of per-view padded sequences). Query pad rows are NOT
masked: their outputs are garbage by contract and are sliced off by
the caller (same semantics as the segment-id path it replaces).

Capability parity: replaces torch SDPA/xformers attention inside the
reference's depth models (reference video_metric_convert.py loads
torch DINOv2 ViTs; attention is the FLOP core of every engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
HEAD_GROUP = 8
LANES = 128


def _kernel(valid_ref, q_ref, k_ref, v_ref, o_ref,
            acc_ref, m_ref, l_ref, *, sm_scale, nk):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # token-major -> head-major relayout in VMEM (cheap, no HBM traffic)
    qT = jnp.swapaxes(q_ref[0], 0, 1)            # (8, bq, D)
    kT = jnp.swapaxes(k_ref[0], 0, 1)            # (8, bk, D)
    vT = jnp.swapaxes(v_ref[0], 0, 1)            # (8, bk, D)
    neg = jnp.where(valid_ref[0, :] > 0, 0.0, NEG_INF)[None, None, :]

    s = jax.lax.dot_general(
        qT, kT, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (8, bq, bk) f32
    s = s * sm_scale + neg

    m_prev = m_ref[:, :, 0:1]                    # (8, bq, 1)
    l_prev = l_ref[:, :, 0:1]
    m_cur = jnp.max(s, axis=2, keepdims=True)    # (8, bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    # for rows whose keys so far are ALL masked m_new stays -1e30 and
    # exp(s - m_new) = exp(0) = 1 on this block's masked columns; the
    # first block with a real key rescales acc/l by exp(-1e30 - m) = 0,
    # so the garbage never survives into a valid row's output.
    alpha = jnp.exp(m_prev - m_new)              # (8, bq, 1)
    p = jnp.exp(s - m_new)                       # (8, bq, bk) f32
    l_new = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)

    o = jax.lax.dot_general(
        p.astype(vT.dtype), vT, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (8, bq, D) f32
    acc_ref[...] = acc_ref[...] * alpha + o
    m_ref[...] = jax.lax.broadcast_in_dim(
        m_new, m_ref.shape, (0, 1, 2))
    l_ref[...] = jax.lax.broadcast_in_dim(
        l_new, l_ref.shape, (0, 1, 2))

    @pl.when(ki == nk - 1)
    def _finalize():
        inv = 1.0 / l_ref[:, :, 0:1]
        out = acc_ref[...] * inv                 # (8, bq, D)
        o_ref[0] = jnp.swapaxes(out.astype(o_ref.dtype), 0, 1)


@functools.partial(jax.jit, static_argnames=("num_heads", "sm_scale",
                                             "block_q", "block_k",
                                             "interpret"))
def packed_flash_attention(qkv4, valid, num_heads, sm_scale, block_q=256,
                           block_k=512, interpret=False):
    """Flash attention over packed qkv, zero HBM layout copies.

    qkv4:  (B, N, 3*H, D) — a free bitcast view of the qkv projection
           output (B, N, 3*H*D); dim-2 index = role*H + head.
    valid: (N,) bool/int — True for real tokens (pads may be
           interleaved); keys at invalid positions are masked out of
           every softmax. Queries are NOT masked.
    num_heads: H; must be a multiple of 8 (Mosaic block alignment).
    Returns (B, N, H, D) attention output (bitcast back to
    (B, N, H*D) is free).
    """
    b, n, three_h, d = qkv4.shape
    h = num_heads
    assert three_h == 3 * h, (three_h, h)
    assert h % HEAD_GROUP == 0, h
    g = h // HEAD_GROUP
    bq = min(block_q, n)
    bk = min(block_k, n)
    assert n % bq == 0 and n % bk == 0, (n, bq, bk)
    nk = n // bk
    grid = (b, g, n // bq, nk)

    valid2 = valid.astype(jnp.int32).reshape(1, n)
    # block indices along dim 2 are in units of HEAD_GROUP rows: the
    # q/k/v roles start at block offsets 0, g, 2g.
    q_spec = pl.BlockSpec((1, bq, HEAD_GROUP, d),
                          lambda bi, gi, qi, ki: (bi, qi, gi, 0))
    k_spec = pl.BlockSpec((1, bk, HEAD_GROUP, d),
                          lambda bi, gi, qi, ki: (bi, ki, g + gi, 0))
    v_spec = pl.BlockSpec((1, bk, HEAD_GROUP, d),
                          lambda bi, gi, qi, ki: (bi, ki, 2 * g + gi, 0))
    valid_spec = pl.BlockSpec((1, bk), lambda bi, gi, qi, ki: (0, ki))
    o_spec = pl.BlockSpec((1, bq, HEAD_GROUP, d),
                          lambda bi, gi, qi, ki: (bi, qi, gi, 0))

    params = (None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel",
                             "arbitrary")))
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, nk=nk),
        grid=grid,
        in_specs=[valid_spec, q_spec, k_spec, v_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, h, d), qkv4.dtype),
        scratch_shapes=[
            pltpu.VMEM((HEAD_GROUP, bq, d), jnp.float32),
            pltpu.VMEM((HEAD_GROUP, bq, LANES), jnp.float32),
            pltpu.VMEM((HEAD_GROUP, bq, LANES), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(valid2, qkv4, qkv4, qkv4)
