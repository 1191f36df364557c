"""int8 quantized matmul path for transformer inference on TPU.

The v5e MXU executes int8 x int8 -> int32 at twice the bf16 FLOP rate,
and ViT-L depth inference is matmul-bound at production batch sizes, so
an opt-in int8 path raises the depth-stage ceiling ~2x. The reference
has no quantized path at all (all torch models run fp16/fp32 on CUDA);
this is a TPU-native speed feature, exposed as ``--quantize int8`` on
the depth CLIs.

Scheme (standard weight+activation dynamic symmetric quantization):

- weights:     per-OUTPUT-channel scale  s_w[j] = max_i |W[i,j]| / 127
- activations: per-TOKEN scale           s_x[t] = max_j |x[t,j]| / 127
- out[t,j] = (sum_i q_x[t,i] * q_w[i,j]) * s_x[t] * s_w[j] + b[j]

Quantization happens INSIDE the jitted call, from the exact same param
tree the checkpoint converters produce (``models/convert.py``): no
separate quantized checkpoint format, no converter changes, and the
non-quantized path is bit-identical to before. The per-call weight
quantization costs O(d_in*d_out) elementwise work against the matmul's
O(tokens*d_in*d_out) — <0.1% at ViT token counts — and XLA fuses the
rank-1 dequantization scale into the matmul epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_symmetric(x, axis, eps=1e-8):
    """Symmetric int8 quantization along ``axis``.

    Returns (q, scale) with q int8 in [-127, 127] and
    x ~= q * scale (scale keeps the reduced axis as size 1).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis,
                     keepdims=True)
    scale = jnp.maximum(absmax, eps) / 127.0
    q = jnp.clip(jnp.rint(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dense(x, kernel, bias=None, compute_dtype=jnp.bfloat16):
    """Quantized equivalent of ``x @ kernel + bias``.

    x: (..., d_in) float; kernel: (d_in, d_out) float (as stored in the
    checkpoint); bias: (d_out,) or None. Returns (..., d_out) in
    ``compute_dtype``. Both operands are quantized on the fly and the
    contraction runs int8 x int8 -> int32 on the MXU.
    """
    lead = x.shape[:-1]
    d_in = x.shape[-1]
    d_out = kernel.shape[-1]
    x2 = x.reshape(-1, d_in)

    q_x, s_x = quantize_symmetric(x2, axis=1)      # (T, d_in), (T, 1)
    q_w, s_w = quantize_symmetric(kernel, axis=0)  # (d_in, d_out), (1, d_out)

    acc = jax.lax.dot_general(
        q_x, q_w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # (T, d_out) int32
    out = acc.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(lead + (d_out,)).astype(compute_dtype)
