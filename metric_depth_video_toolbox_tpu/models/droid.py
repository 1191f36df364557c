"""DROID-SLAM class learned tracking front-end (Flax).

The real-graph path for the reference's Mega-SAM camera tracker
(sam_track_video.py:169-206: a trained DROID net — correlation volumes
+ a learned ConvGRU update operator + dense bundle adjustment — loaded
from ``megasam_final.pth``). TPU-native re-design of the inference
loop: correlation pyramids are MXU matmuls, lookups are batched
bilinear gathers, the update operator is a conv stack over all graph
edges at once, and the pose solve accumulates per-edge normal equations
into one (6T, 6T) system solved on device (pipeline/slam.py
droid_track_video) — no CUDA kernels, no per-edge python loops.

Architecture (the public DROID-SLAM droid_net.py layout; module names
below = the checkpoint keys ``convert_droid`` consumes, after stripping
the DataParallel ``module.`` prefix):

  fnet                 BasicEncoder(norm='instance'): 7x7/2 stem + 3
                       two-block residual layers (64, 96/2, 128/2) +
                       1x1 out conv -> 128-d features at 1/8 res.
                       InstanceNorm2d(affine=False) carries no params.
  cnet                 BasicEncoder(norm='none') -> hidden+context
                       channels, split tanh/relu.
  update.corr_encoder  Conv1x1(cor_planes->128) ReLU Conv3x3 ReLU
  update.flow_encoder  Conv7x7(4->128) ReLU Conv3x3(->64) ReLU
  update.gru           ConvGRU with DROID's global context: a gated
                       spatial mean (w: 1x1) feeds 1x1 ``*_glo`` terms
                       added into the z/r/q gates.
  update.delta         Conv3x3 ReLU Conv3x3 -> 2  (flow revision)
  update.weight        Conv3x3 ReLU Conv3x3 -> 2, sigmoid (confidence)
  update.agg           GraphAgg: per-source-frame mean over edges ->
                       conv stack -> eta (softplus damping * .01) and
                       an 8x8x9 convex-upsample mask.

Forward equivalence vs a torch mirror of this layout:
tests/test_weight_exact_droid.py.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models.norm import InstanceNorm
from metric_depth_video_toolbox_tpu.models.raft import (
    _corr_pyramid, _lookup)


@dataclasses.dataclass(frozen=True)
class DroidConfig:
    stem: int = 64
    layers: Sequence[int] = (64, 96, 128)
    feat_dim: int = 128
    hidden: int = 128
    context: int = 128
    corr_levels: int = 4
    corr_radius: int = 3
    upsample_factor: int = 8
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def cor_planes(self):
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2


DROID = DroidConfig()
DROID_TINY = DroidConfig(stem=8, layers=(8, 12, 16), feat_dim=16,
                         hidden=16, context=16, corr_levels=2,
                         corr_radius=1, dtype="float32")


def _conv(out, k, name, dtype, stride=1):
    pad = ((k // 2, k // 2), (k // 2, k // 2))
    return nn.Conv(out, (k, k), strides=(stride, stride), padding=pad,
                   dtype=dtype, name=name)


class DroidResBlock(nn.Module):
    """Original-RAFT ResidualBlock (the one DROID vendors): conv (bias)
    -> norm -> relu twice; 1x1(+norm) downsample path; relu after sum."""
    planes: int
    norm: str  # 'instance' | 'none'
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    def _n(self, x):
        return InstanceNorm()(x) if self.norm == "instance" else x

    @nn.compact
    def __call__(self, x):
        y = nn.relu(self._n(_conv(self.planes, 3, "conv1", self.dtype,
                                  self.stride)(x)))
        y = nn.relu(self._n(_conv(self.planes, 3, "conv2",
                                  self.dtype)(y)))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = self._n(_conv(self.planes, 1, "downsample",
                              self.dtype, self.stride)(x))
        return nn.relu(x + y)


class DroidEncoder(nn.Module):
    """DROID BasicEncoder: (T, H, W, 3) ImageNet-normalized ->
    (T, H/8, W/8, out_dim)."""
    cfg: DroidConfig
    out_dim: int
    norm: str

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = c.compute_dtype
        x = _conv(c.stem, 7, "conv1", dt, 2)(x.astype(dt))
        if self.norm == "instance":
            x = InstanceNorm()(x)
        x = nn.relu(x)
        for li, width in enumerate(c.layers):
            stride = 1 if li == 0 else 2
            x = DroidResBlock(width, self.norm, stride, dt,
                              name=f"layer{li + 1}_0")(x)
            x = DroidResBlock(width, self.norm, 1, dt,
                              name=f"layer{li + 1}_1")(x)
        return _conv(self.out_dim, 1, "conv2", dt)(x)


class DroidConvGRU(nn.Module):
    """DROID ConvGRU: 3x3 gates over cat(net, inp) plus a global
    context — sigmoid(w(net)) * net spatially averaged, passed through
    1x1 ``*_glo`` convs into each gate."""
    hidden: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, net, inp):
        dt = self.dtype
        glo = nn.sigmoid(_conv(self.hidden, 1, "w", dt)(net)) * net
        glo = glo.mean(axis=(1, 2), keepdims=True)
        hx = jnp.concatenate([net, inp], axis=-1)
        z = nn.sigmoid(_conv(self.hidden, 3, "convz", dt)(hx)
                       + _conv(self.hidden, 1, "convz_glo", dt)(glo))
        r = nn.sigmoid(_conv(self.hidden, 3, "convr", dt)(hx)
                       + _conv(self.hidden, 1, "convr_glo", dt)(glo))
        q = nn.tanh(_conv(self.hidden, 3, "convq", dt)(
            jnp.concatenate([r * net, inp], axis=-1))
            + _conv(self.hidden, 1, "convq_glo", dt)(glo))
        return (1 - z) * net + z * q


class DroidUpdate(nn.Module):
    """Learned update operator over all graph edges at once.

    Inputs (E = edge count, h x w = 1/8 grid):
      net (E, h, w, hidden)   GRU state per edge
      inp (E, h, w, context)  context features of each edge's source
      corr (E, h, w, cor_planes)  correlation lookups
      flow (E, h, w, 4)       induced flow + residual-to-target
      src (E,) int32          edge source frame index (for GraphAgg)
      n_frames                static frame count

    Returns (net, delta, weight, eta, upmask): delta/weight (E,h,w,2),
    eta (T,h,w) damping, upmask (T,h,w,8*8*9)."""
    cfg: DroidConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow, src=None, n_frames=None):
        c = self.cfg
        dt = c.compute_dtype
        cf = nn.relu(_conv(128 if c.feat_dim >= 128 else c.hidden * 2,
                           1, "corr_enc1", dt)(corr.astype(dt)))
        cf = nn.relu(_conv(c.hidden, 3, "corr_enc2", dt)(cf))
        ff = nn.relu(_conv(128 if c.feat_dim >= 128 else c.hidden * 2,
                           7, "flow_enc1", dt)(flow.astype(dt)))
        ff = nn.relu(_conv(c.hidden // 2, 3, "flow_enc2", dt)(ff))
        net = DroidConvGRU(c.hidden, dt, name="gru")(
            net, jnp.concatenate([inp.astype(dt), cf, ff], axis=-1))

        d = nn.relu(_conv(c.hidden, 3, "delta1", dt)(net))
        delta = _conv(2, 3, "delta2", jnp.float32)(d)
        wgt = nn.relu(_conv(c.hidden, 3, "weight1", dt)(net))
        weight = nn.sigmoid(_conv(2, 3, "weight2", jnp.float32)(wgt))

        eta = upmask = None
        if src is not None:
            # GraphAgg: mean over edges sharing a source frame
            a = nn.relu(_conv(c.hidden, 3, "agg_conv1", dt)(net))
            sums = jax.ops.segment_sum(a, src, num_segments=n_frames)
            cnt = jax.ops.segment_sum(jnp.ones((a.shape[0],), a.dtype),
                                      src, num_segments=n_frames)
            mean = sums / jnp.maximum(cnt, 1.0)[:, None, None, None]
            a = nn.relu(_conv(c.hidden, 3, "agg_conv2", dt)(mean))
            eta = 0.01 * nn.softplus(
                _conv(1, 3, "agg_eta", jnp.float32)(a)[..., 0])
            upmask = _conv(c.upsample_factor ** 2 * 9, 1, "agg_upmask",
                           jnp.float32)(a)
        return net, delta, weight, eta, upmask


class DroidNet(nn.Module):
    """Feature extraction + one update step (init-time __call__ touches
    every parameter so converters can be tree-checked)."""
    cfg: DroidConfig

    def setup(self):
        c = self.cfg
        self.fnet = DroidEncoder(c, c.feat_dim, "instance")
        self.cnet = DroidEncoder(c, c.hidden + c.context, "none")
        self.update = DroidUpdate(c)

    def features(self, images):
        """images (T, H, W, 3) in [0, 1] -> (fmap, net0, inp0) at 1/8
        res (DROID normalizes with the ImageNet stats buffers)."""
        c = self.cfg
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
        x = (images - mean) / std
        fmap = self.fnet(x).astype(jnp.float32)
        ctx = self.cnet(x)
        net = jnp.tanh(ctx[..., :c.hidden]).astype(jnp.float32)
        inp = nn.relu(ctx[..., c.hidden:]).astype(jnp.float32)
        return fmap, net, inp

    def __call__(self, images):
        c = self.cfg
        fmap, net, inp = self.features(images)
        t, h, w, _ = fmap.shape
        corr = jnp.zeros((t, h, w, c.cor_planes))
        flow = jnp.zeros((t, h, w, 4))
        src = jnp.arange(t, dtype=jnp.int32)
        return self.update(net, inp, corr, flow, src, t)


def config_from_params(params, dtype="bfloat16"):
    """Infer a DroidConfig from a converted param tree so checkpoints
    are self-describing (widths, hidden/context split, correlation
    pyramid geometry all come from the tensors)."""
    import numpy as np
    p = params["params"]
    fnet, cnet, upd = p["fnet"], p["cnet"], p["update"]
    stem = int(np.asarray(fnet["conv1"]["kernel"]).shape[-1])
    n_layers = sum(1 for k in fnet if k.startswith("layer")
                   and k.endswith("_0"))
    layers = tuple(
        int(np.asarray(fnet[f"layer{i + 1}_0"]["conv1"]["kernel"]
                       ).shape[-1]) for i in range(n_layers))
    feat_dim = int(np.asarray(fnet["conv2"]["kernel"]).shape[-1])
    hidden = int(np.asarray(upd["gru"]["convz"]["kernel"]).shape[-1])
    context = int(np.asarray(cnet["conv2"]["kernel"]).shape[-1]) - hidden
    cor_planes = int(np.asarray(upd["corr_enc1"]["kernel"]).shape[-2])
    for radius in (3, 1, 2, 4):
        if cor_planes % (2 * radius + 1) ** 2 == 0:
            levels = cor_planes // (2 * radius + 1) ** 2
            if 1 <= levels <= 6:
                break
    up = int(round((int(np.asarray(upd["agg_upmask"]["kernel"]
                                   ).shape[-1]) // 9) ** 0.5))
    return DroidConfig(stem=stem, layers=layers, feat_dim=feat_dim,
                       hidden=hidden, context=context,
                       corr_levels=levels, corr_radius=radius,
                       upsample_factor=up, dtype=dtype)


def corr_pyramid(f1, f2, levels):
    """All-pairs correlation pyramid between per-edge feature maps
    (E, h, w, C) — an MXU batched matmul (models.raft implementation)."""
    return _corr_pyramid(f1, f2, levels)


def corr_lookup(pyr, coords, radius):
    """(E, h, w, levels*(2r+1)^2) correlation features around per-pixel
    target coords (x, y)."""
    return _lookup(pyr, coords, radius)
