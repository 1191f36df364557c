"""Block-causal flash attention (Pallas TPU) for causal video DiTs.

Why this kernel exists: the Wan-class causal DiT (models/wan.py,
reference inspatio_world_infill.py) masks attention so frame-block i
sees blocks <= i. At the PRODUCTION working point (225-frame chunks at
480x832, reference inspatio_world_infill.py:36-42) the latent sequence
is ~89k tokens — a dense (N, N) additive mask alone is ~16 GB and the
materialized scores far more, so the dense-mask path cannot compile on
one chip (the reference leans on torch flash attention for the same
reason). This kernel streams keys with the online-softmax recurrence,
applies the block-causal predicate per tile from two (N,) block-id
vectors, and skips key tiles that are entirely in the future — memory
is O(block_q * block_k) regardless of sequence length.

Contract:
  q, k, v   (B, H, N, D) — D must be lane-friendly (Wan: 128)
  block_ids (N,) int32 — nondecreasing frame-block index per token
            (frame-major token order makes it nondecreasing, which the
            tile-skip relies on). Query i attends key j iff
            block_ids[j] <= block_ids[i].
  Pads: give pad QUERIES id = max_real_id (they see all real keys ->
  finite garbage, sliced off by the caller) and pad KEYS id =
  max_real_id + 1 (no real query sees them).

Equivalence vs the dense-mask path is proven in interpret mode on CPU
(tests/test_blockcausal_pallas.py), the same pattern as the other
Pallas kernels in this tree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _kernel(qids_ref, kids_ref, q_ref, k_ref, v_ref, o_ref,
            acc_ref, m_ref, l_ref, *, sm_scale, nk):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    qid = qids_ref[0, :]                       # (bq,) int32
    kid = kids_ref[0, :]                       # (bk,) int32
    # ids are nondecreasing, so a whole key tile is in the future iff
    # its smallest id exceeds this query tile's largest id — skip it
    # (this is what restores ~2x over dense masking for causal work)
    live = jnp.min(kid) <= jnp.max(qid)

    @pl.when(live)
    def _step():
        q = q_ref[0, 0]                        # (bq, D)
        k = k_ref[0, 0]                        # (bk, D)
        v = v_ref[0, 0]                        # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, bk) f32
        s = s * sm_scale + jnp.where(
            kid[None, :] <= qid[:, None], 0.0, NEG_INF)

        m_prev = m_ref[:, 0:1]                 # (bq, 1)
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # rows whose keys so far are ALL masked keep m = -1e30; their
        # p on masked columns is exp(0)=1, but the first live tile
        # rescales acc/l by exp(-1e30 - m) = 0, so garbage never
        # survives into a row that has any legal key.
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[...] = jax.lax.broadcast_in_dim(
            alpha * l_prev + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape, (0, 1))
        m_ref[...] = jax.lax.broadcast_in_dim(m_new, m_ref.shape, (0, 1))
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        # every real query has its own block's keys, so l > 0 there;
        # the maximum guards pad rows (sliced off by the caller)
        inv = 1.0 / jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_ref[...] * inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q",
                                             "block_k", "interpret"))
def block_causal_flash_attention(q, k, v, block_ids, sm_scale,
                                 block_q=256, block_k=256,
                                 interpret=False):
    """q, k, v: (B, H, N, D); block_ids: (N,) int32 nondecreasing.
    Returns (B, H, N, D). N must divide by block_q and block_k —
    callers pad (see module docstring for pad id conventions)."""
    b, h, n, d = q.shape
    bq = min(block_q, n)
    bk = min(block_k, n)
    assert n % bq == 0 and n % bk == 0, (n, bq, bk)
    nk = n // bk
    grid = (b, h, n // bq, nk)

    ids2 = block_ids.astype(jnp.int32).reshape(1, n)
    qids_spec = pl.BlockSpec((1, bq), lambda bi, hi, qi, ki: (0, qi))
    kids_spec = pl.BlockSpec((1, bk), lambda bi, hi, qi, ki: (0, ki))
    q_spec = pl.BlockSpec((1, 1, bq, d),
                          lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, bk, d),
                           lambda bi, hi, qi, ki: (bi, hi, ki, 0))
    o_spec = pl.BlockSpec((1, 1, bq, d),
                          lambda bi, hi, qi, ki: (bi, hi, qi, 0))

    params = (None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel",
                             "arbitrary")))
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, nk=nk),
        grid=grid,
        in_specs=[qids_spec, kids_spec, q_spec, kv_spec, kv_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(ids2, ids2, q, k, v)
