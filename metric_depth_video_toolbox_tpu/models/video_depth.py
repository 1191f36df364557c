"""Temporally-consistent video depth (Video-Depth-Anything), Flax.

Fills the role of Video-Depth-Anything in the reference
(video_metric_convert.py:97 ``infer_video_depth``: 32-frame windows
processed jointly, later windows scale/shift-aligned to the first).

The graph mirrors the upstream VDA layout (video_depth_anything/
dpt_temporal.py + motion_module.py) so the published checkpoints
(video_depth_anything_vits/vitl.pth, reference download_weights.py)
convert weight-exact via ``models.convert.convert_vda``:

- DINOv2 ViT backbone per frame (shared with DA-V2),
- DPTHeadTemporal: the DA-V2 DPT head with FOUR AnimateDiff-style
  temporal transformer ("motion") modules inserted at layer_3, layer_4
  (post-resize, pre-scratch) and path_4, path_3 (post-refinenet4/3) —
  in_channels out_channels[2], out_channels[3], features, features,
- each motion module: GroupNorm -> proj_in -> N x [2 temporal
  self-attention blocks (sinusoidal positional encoding over the frame
  axis) + GEGLU feed-forward] -> proj_out -> residual.

Head-level forward equivalence is proven against a torch
re-implementation of this op order in tests/test_weight_exact_vda.py.

TPU mapping: the window axis is a first-class batch axis — on a device
mesh the window shards over 'data'; the temporal attention (sequence
length = window = 32 per spatial token) is the only cross-frame (and
hence cross-device) op and rides ICI.

Long videos: ``infer_video_depth`` slides a window with overlap and
stitches scale/shift on the overlap (reference behavior, the same
mechanism DA3/DepthCrafter use — SURVEY.md section 5 'long-context').
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from metric_depth_video_toolbox_tpu.utils import host as host_mod
from metric_depth_video_toolbox_tpu.utils.host import robust_call, to_host
from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod
from metric_depth_video_toolbox_tpu.ops import solvers


@dataclasses.dataclass(frozen=True)
class VideoDepthConfig:
    vit: vit_mod.ViTConfig = vit_mod.VIT_L
    dpt: dpt_mod.DPTConfig = dpt_mod.DPTConfig()
    temporal_heads: int = 8
    # transformer blocks per motion module (VDA ships 1)
    temporal_layers: int = 1
    norm_groups: int = 32
    pe_max_len: int = 4096
    window: int = 32
    overlap: int = 8


TINY = VideoDepthConfig(vit=vit_mod.VIT_TINY, dpt=dpt_mod.DPT_TINY,
                        temporal_heads=2, temporal_layers=1,
                        norm_groups=4, window=8, overlap=2)


def _sinusoidal_pe(t, d):
    """AnimateDiff PositionalEncoding table (t, d): interleaved
    sin/cos of pos / 10000^(2i/d)."""
    pos = np.arange(t, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32)
                 * (-np.log(10000.0) / d))
    pe = np.zeros((t, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: (d + 1) // 2])
    return pe


class TemporalAttention(nn.Module):
    """VersatileAttention(Temporal_Self): per spatial token, attend
    across the frame axis with sinusoidal position encoding added
    before qkv (diffusers CrossAttention layout: to_q/k/v bias-free,
    to_out projection)."""
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        """x: (N, T, C) — N spatial tokens, T frames."""
        n, t, c = x.shape
        x = x + jnp.asarray(_sinusoidal_pe(t, c), x.dtype)
        hd = c // self.heads
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_v")(x)

        def heads(y):
            return y.reshape(n, t, self.heads, hd)
        out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
        out = out.reshape(n, t, c)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class TemporalTransformerBlock(nn.Module):
    """2x [LN -> temporal self-attention -> residual] then
    LN -> GEGLU feed-forward -> residual (AnimateDiff block)."""
    dim: int
    heads: int
    dtype: jnp.dtype
    n_attn: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_attn):
            y = nn.LayerNorm(dtype=jnp.float32, name=f"norm{i}")(x)
            x = x + TemporalAttention(self.dim, self.heads, self.dtype,
                                      name=f"attn{i}")(y)
        y = nn.LayerNorm(dtype=jnp.float32, name="ff_norm")(x)
        # GEGLU: proj to 2*4*dim, hidden * gelu(gate)
        y = nn.Dense(self.dim * 8, dtype=self.dtype, name="geglu")(y)
        h, gate = jnp.split(y, 2, axis=-1)
        y = h * nn.gelu(gate, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(y)
        return x + y


class TemporalModule(nn.Module):
    """TemporalTransformer3DModel: GroupNorm -> proj_in -> blocks ->
    proj_out -> residual, applied per frame stack (T, H, W, C)."""
    dim: int
    heads: int
    layers: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        t, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=min(self.groups, c),
                         dtype=jnp.float32, name="norm")(x)
        y = y.reshape(t, h * w, c)
        y = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(y)
        # temporal tokens: (H*W, T, C)
        y = y.transpose(1, 0, 2)
        for i in range(self.layers):
            y = TemporalTransformerBlock(self.dim, self.heads, self.dtype,
                                         name=f"block{i}")(y)
        y = y.transpose(1, 0, 2)
        y = nn.Dense(c, dtype=self.dtype, name="proj_out")(y)
        return y.reshape(t, h, w, c) + residual


class DPTHeadTemporal(nn.Module):
    """DA-V2 DPT head + 4 motion modules (upstream dpt_temporal.py):
    motion 0/1 on the two coarsest reassembled levels, motion 2/3 on the
    outputs of the two coarsest fusions."""
    cfg: VideoDepthConfig

    @nn.compact
    def __call__(self, feats):
        c = self.cfg
        d = c.dpt
        dt = d.compute_dtype
        t, gh, gw, _ = feats[0].shape
        patch = c.vit.patch_size

        def motion(i, dim, x):
            return TemporalModule(dim, c.temporal_heads, c.temporal_layers,
                                  c.norm_groups, dt, name=f"motion{i}")(x)

        scales = (4, 2, 1, 0.5)
        pyr = []
        for i, (f, ch) in enumerate(zip(feats, d.out_channels)):
            y = nn.Conv(ch, (1, 1), dtype=dt, name=f"project{i}")(f)
            if d.torch_resize:
                if i == 0:
                    y = nn.ConvTranspose(ch, (4, 4), strides=(4, 4),
                                         dtype=dt, name="resize0")(y)
                elif i == 1:
                    y = nn.ConvTranspose(ch, (2, 2), strides=(2, 2),
                                         dtype=dt, name="resize1")(y)
                elif i == 3:
                    y = nn.Conv(ch, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)), dtype=dt,
                                name="resize3")(y)
            else:
                hw = (int(gh * scales[i]), int(gw * scales[i]))
                y = jax.image.resize(
                    y, (t,) + hw + (y.shape[-1],), "bilinear").astype(dt)
            if i == 2:
                y = motion(0, d.out_channels[2], y)
            elif i == 3:
                y = motion(1, d.out_channels[3], y)
            y = nn.Conv(d.features, (3, 3), dtype=dt, use_bias=False,
                        name=f"scratch{i}")(y)
            pyr.append(y)

        x = dpt_mod.FeatureFusion(d, name="fusion3")(
            pyr[3], out_hw=pyr[2].shape[1:3])
        x = motion(2, d.features, x)
        x = dpt_mod.FeatureFusion(d, name="fusion2")(
            x, skip=pyr[2], out_hw=pyr[1].shape[1:3])
        x = motion(3, d.features, x)
        x = dpt_mod.FeatureFusion(d, name="fusion1")(
            x, skip=pyr[1], out_hw=pyr[0].shape[1:3])
        last_hw = (pyr[0].shape[1] * 2, pyr[0].shape[2] * 2) \
            if d.torch_resize else None
        x = dpt_mod.FeatureFusion(d, name="fusion0")(x, skip=pyr[0],
                                                     out_hw=last_hw)

        x = nn.Conv(d.features // 2, (3, 3), dtype=dt,
                    name="head_conv1")(x)
        full_hw = (gh * patch, gw * patch)
        up = dpt_mod.resize_align_corners if d.torch_resize \
            else dpt_mod._resize
        if d.fast_head:
            x = nn.Conv(32, (3, 3), dtype=dt, name="head_conv2")(x)
            x = nn.relu(x)
            x = up(x, full_hw)
        else:
            x = up(x, full_hw)
            x = nn.Conv(32, (3, 3), dtype=dt, name="head_conv2")(x)
            x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=jnp.float32, name="head_conv3")(x)
        if d.head_act == "sigmoid":
            return nn.sigmoid(x)
        return nn.relu(x)


class VideoDepthAnything(nn.Module):
    cfg: VideoDepthConfig

    @nn.compact
    def __call__(self, frames):
        """frames: (T, H, W, 3) in [0,1] -> (T, H, W) relative
        disparity (or sigmoid metric when dpt.head_act='sigmoid')."""
        c = self.cfg
        feats, _ = vit_mod.ViT(c.vit, name="backbone")(frames)
        out = DPTHeadTemporal(c, name="head")(feats)
        return out[..., 0].astype(jnp.float32)


def stitch_windows(window_disps, window, overlap, total):
    """Scale/shift-align each window's disparity to the previous one on the
    overlap, then concatenate (host-side orchestration; each alignment is a
    device closed-form solve). window_disps: list of (W_i, H, W) arrays."""
    out = [to_host(window_disps[0])]
    for disp in window_disps[1:]:
        disp = to_host(disp)
        prev_tail = out[-1][-overlap:]
        cur_head = disp[:overlap]
        import jax as _jax
        s, t = to_host(_jax.jit(solvers.scale_and_shift)(
            jnp.asarray(cur_head), jnp.asarray(prev_tail)))
        aligned = disp * float(s) + float(t)
        out.append(aligned[overlap:])
    full = np.concatenate(out, axis=0)
    return full[:total]


def _pack_disparity16(d, layout):
    """Device side: f32 (T, h, w) disparity -> 16-bit quantized
    hi/lo byte planes, tile-bitpacked for the slow D2H tunnel.

    Quantization step = (max-min)/65535 per window — below the 16-bit
    depth-save codec's own step (SURVEY.md §0: the reference stores
    ~1.5 mm steps at 100 m), and the hi-byte plane of smooth neural
    disparity is near-flat so it packs to almost nothing."""
    from metric_depth_video_toolbox_tpu.ops import tilepack

    lo = jnp.min(d)
    hi = jnp.max(d)
    q = jnp.round((d - lo) / jnp.maximum(hi - lo, 1e-12)
                  * 65535.0).astype(jnp.uint32)
    planes = jnp.stack([(q >> 8).astype(jnp.uint8),
                        (q & 255).astype(jnp.uint8)], axis=-1)
    out = tilepack.pack(planes, layout)
    out["dmin"] = lo
    out["dmax"] = hi
    return out


def _fetch_packed_buckets(device_out, layout):
    """Host side: fetch meta + only the occupied buckets of an
    already-dispatched pack, unpack, dequantize. Exact inverse of
    _pack_disparity16 up to the 16-bit quantization. Raises
    DeviceFetchTimeout (no internal retry) so the caller can
    re-dispatch the whole window."""
    from metric_depth_video_toolbox_tpu.ops import tilepack

    host_meta = to_host({k: device_out[k]
                         for k in ("bids", "counts", "dmin", "dmax")})
    buckets = tilepack.fetch_buckets(host_meta, device_out,
                                     host_mod.to_host)
    planes = tilepack.unpack(host_meta["bids"], buckets, layout)
    q = (planes[..., 0].astype(np.uint16) << 8) | planes[..., 1]
    lo = float(host_meta["dmin"])
    hi = float(host_meta["dmax"])
    return lo + q.astype(np.float32) * ((hi - lo) / 65535.0)


def _fetch_packed_disparity(run_fn, args, layout):
    """Dispatch + packed fetch in one call (the non-pipelined path and
    the re-dispatch fallback)."""
    return _fetch_packed_buckets(run_fn(*args), layout)


def infer_video_depth(apply_fn, params, frames_u8, work_hw, out_hw,
                      window=32, overlap=8, batch_hook=None, mesh=None,
                      transfer_hw=None, pack_transfer=False):
    """Sliding-window video depth over an arbitrary-length clip.

    frames_u8: (T, H, W, 3) uint8. Returns (T, out_h, out_w) float32
    relative disparity, temporally stitched.

    With ``mesh`` (a 1D 'data' Mesh) the window's time axis shards over
    devices: per-frame ViT work is pure DP, and the temporal attention
    becomes the only cross-device op — XLA inserts the collectives over
    the time axis (the sequence-parallel layout SURVEY.md §5 describes
    for the reference's windowed long-video mechanism).

    ``transfer_hw``: fetch disparity at this resolution instead of
    ``out_hw`` (typically ``work_hw``): on tunneled runtimes the
    (T, 1080, 1920) float32 fetch is ~8.3 MB/frame over a single-digit
    MB/s link, 4.3x the bytes of the model's native output. The caller
    upsamples on host AFTER fetching — bilinear resize is linear, so
    resize-then-affine equals affine-then-resize exactly; only the
    nonlinear reciprocal must stay after the upsample (VDAEngine does
    this). Returns (T,) + transfer_hw in that case.
    """
    t_total = frames_u8.shape[0]
    # overlap >= window would make the slide step 0 -> infinite dispatch
    overlap = min(overlap, window - 1)
    step = max(window - overlap, 1)

    put = jnp.asarray
    if mesh is not None:
        from metric_depth_video_toolbox_tpu.parallel import sharding
        params = jax.device_put(params, sharding.replicated(mesh))
        put = lambda w: jax.device_put(jnp.asarray(w),
                                       sharding.batch_sharding(mesh))

    # params must be an ARGUMENT, not a closure capture: closed-over device
    # arrays are lowered as MLIR constants (a full device->host copy of
    # every weight at trace time).
    fetch_hw = tuple(transfer_hw or out_hw)
    layout = None
    if pack_transfer:
        from metric_depth_video_toolbox_tpu.ops import tilepack
        layout = tilepack.PackLayout(window, fetch_hw[0], fetch_hw[1], 2)

    @jax.jit
    def run_window(p, win_u8):
        x = win_u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (window, work_hw[0], work_hw[1], 3),
                             "bilinear")
        d = apply_fn(p, x)
        if d.shape[1:3] != fetch_hw:
            d = jax.image.resize(d, (window,) + fetch_hw, "bilinear")
        if pack_transfer:
            # the (T, h, w) f32 fetch dominates wall time on tunneled
            # runtimes (single-digit MB/s D2H); 16-bit quantize +
            # tile-bitpack cuts it ~5x for smooth neural disparity
            return _pack_disparity16(d, layout)
        return d

    # dispatch-ahead double buffering: window N+1's device compute is
    # dispatched BEFORE window N's (slow, tunnel-bound) fetch blocks
    # the host, so fetch and compute overlap — jax dispatch is async,
    # the data dependency chain stays exact, and a wedged fetch still
    # falls back to a fresh dispatch (the robust_call contract).
    starts = []
    s = 0
    while s < t_total:
        starts.append(s)
        if s + window >= t_total:
            break
        s += step

    def dispatch(s0):
        idx = np.clip(np.arange(s0, s0 + window), 0, t_total - 1)
        return run_window(params, put(frames_u8[idx]))

    def fetch(s0, dev_out):
        if pack_transfer:
            try:
                return _fetch_packed_buckets(dev_out, layout)
            except host_mod.DeviceFetchTimeout:
                # re-dispatch whole window (robust_call semantics)
                return _fetch_packed_disparity(
                    run_window, (params,
                                 put(frames_u8[np.clip(
                                     np.arange(s0, s0 + window), 0,
                                     t_total - 1)])), layout)
        try:
            return to_host(dev_out)
        except host_mod.DeviceFetchTimeout:
            return robust_call(run_window, params, put(frames_u8[
                np.clip(np.arange(s0, s0 + window), 0, t_total - 1)]))

    disps = []
    pending = (starts[0], dispatch(starts[0]))
    for nxt in starts[1:]:
        ahead = (nxt, dispatch(nxt))
        s0, dev = pending
        d = fetch(s0, dev)
        if batch_hook is not None:
            batch_hook(s0, d)
        disps.append(d[: min(window, t_total - s0)])
        pending = ahead
    s0, dev = pending
    d = fetch(s0, dev)
    if batch_hook is not None:
        batch_hook(s0, d)
    disps.append(d[: min(window, t_total - s0)])
    if len(disps) == 1:
        return disps[0][:t_total]
    return stitch_windows(disps, window, overlap, t_total)
