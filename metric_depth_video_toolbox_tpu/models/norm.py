"""Shared inference-mode normalization layers (Flax).

Torch model families the reference wraps use InstanceNorm (RAFT feature
encoder) and BatchNorm (RAFT context encoder, U2Net). This is an
inference framework: BatchNorm running statistics are converted params
and never update.
"""

from __future__ import annotations

import flax.linen as nn
import jax


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False): per-sample per-channel over HW."""

    @nn.compact
    def __call__(self, x):
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5)


class EvalBatchNorm(nn.Module):
    """BatchNorm2d in eval mode: running stats are converted params."""
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        mean = self.param("mean", nn.initializers.zeros, (self.dim,))
        var = self.param("var", nn.initializers.ones, (self.dim,))
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return ((x - mean) * inv + bias).astype(x.dtype)
