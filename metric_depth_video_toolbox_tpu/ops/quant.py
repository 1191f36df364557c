"""int8 quantized matmul path for transformer inference on TPU.

STATUS (measured, v5e, this runtime — round 3): int8 is NOT a speed win
here. XLA's int8 x int8 -> int32 dot reaches 137.9 TOP/s in its best
(2D) layout vs 105.8 TFLOP/s for the same-shape bf16 matmul (1.30x),
and is SLOWER than bf16 in the (B, N, D) 3D layout the ViT actually
uses (3.25 vs 3.00 ms at ViT-L fc1 shape); the double-rate int8 MXU
path the v5e datasheet advertises is not reached through this XLA
toolchain. Full ViT-L int8: 32.1 fps as shipped in r2 (2D-reshape
layout, 0.83x bf16), 37.1 fps after the ND-dot fix below (0.96x bf16's
38.8). The flag is retained as an opt-in
memory/bandwidth mode (int8 operands halve matmul HBM traffic) and for
forward compatibility with toolchains that do hit the double-rate
path; the depth CLIs print the measured numbers when it is enabled.

Scheme (standard weight+activation dynamic symmetric quantization):

- weights:     per-OUTPUT-channel scale  s_w[j] = max_i |W[i,j]| / 127
- activations: per-TOKEN scale           s_x[t] = max_j |x[t,j]| / 127
- out[t,j] = (sum_i q_x[t,i] * q_w[i,j]) * s_x[t] * s_w[j] + b[j]

Quantization happens INSIDE the jitted call, from the exact same param
tree the checkpoint converters produce (``models/convert.py``): no
separate quantized checkpoint format, no converter changes, and the
non-quantized path is bit-identical to before. Accuracy of the scheme
is covered by tests/test_quant.py (including DP-sharded == unsharded).
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

    The contraction runs directly on the ND activation (no flatten to
    2D: the reshape forced ~0.1 ms layout copies around every matmul —
    47.8 ms/iter across ViT-L at batch 8 in the round-3 trace).
    """
    nd = x.ndim
    q_x, s_x = quantize_symmetric(x, axis=nd - 1)   # (..., d_in), (..., 1)
    q_w, s_w = quantize_symmetric(kernel, axis=0)   # (d_in, d_out), (1, d_out)

    acc = jax.lax.dot_general(
        q_x, q_w, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)           # (..., d_out) int32
    out = acc.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(compute_dtype)
