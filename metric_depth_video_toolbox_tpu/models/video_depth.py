"""Temporally-consistent video depth (VDA-class), Flax.

Fills the role of Video-Depth-Anything in the reference
(video_metric_convert.py:97 ``infer_video_depth``: 32-frame windows
processed jointly, later windows scale/shift-aligned to the first).
Architecture: shared ViT per frame + temporal attention blocks mixing
tokens across the window at the coarse feature levels + DPT head per
frame. The window axis is a first-class batch axis — on a device mesh the
window shards over 'data' and the temporal attention becomes the only
cross-frame (and hence cross-device) op, riding ICI.

Long videos: ``infer_video_depth`` slides a window with overlap and
stitches scale/shift on the overlap (reference behavior, and the same
mechanism DA3/DepthCrafter use — SURVEY.md section 5 'long-context').
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from metric_depth_video_toolbox_tpu.utils.host import robust_call, to_host
from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod
from metric_depth_video_toolbox_tpu.ops import solvers


@dataclasses.dataclass(frozen=True)
class VideoDepthConfig:
    vit: vit_mod.ViTConfig = vit_mod.VIT_L
    dpt: dpt_mod.DPTConfig = dpt_mod.DPTConfig()
    temporal_layers: int = 2
    window: int = 32
    overlap: int = 8


TINY = VideoDepthConfig(vit=vit_mod.VIT_TINY, dpt=dpt_mod.DPT_TINY,
                        temporal_layers=1, window=8, overlap=2)


class TemporalBlock(nn.Module):
    """Attention over the time axis, independently per spatial token."""
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: (T, N, D) — attend across T for each token n."""
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        y = y.transpose(1, 0, 2)  # (N, T, D)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")(y, y)
        y = y.transpose(1, 0, 2)
        x = x + y
        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        z = nn.Dense(self.dim * 2, dtype=self.dtype, name="fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(z)
        return x + z


class VideoDepthAnything(nn.Module):
    cfg: VideoDepthConfig

    @nn.compact
    def __call__(self, frames):
        """frames: (T, H, W, 3) in [0,1] -> (T, H, W) relative disparity."""
        c = self.cfg
        feats, _ = vit_mod.ViT(c.vit, name="backbone")(frames)
        # temporal mixing on the two coarsest levels
        t, gh, gw, d = feats[-1].shape
        dt = c.vit.compute_dtype
        for lvl in (-1, -2):
            f = feats[lvl].reshape(t, gh * gw, d).astype(dt)
            for i in range(c.temporal_layers):
                f = TemporalBlock(d, c.vit.num_heads, dt,
                                  name=f"temporal{lvl}_{i}")(f)
            feats[lvl] = f.reshape(t, gh, gw, d)
        out = dpt_mod.DPTHead(c.dpt, patch_size=c.vit.patch_size,
                              name="head")(feats)
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


def infer_video_depth(apply_fn, params, frames_u8, work_hw, out_hw,
                      window=32, overlap=8, batch_hook=None, mesh=None):
    """Sliding-window video depth over an arbitrary-length clip.

    frames_u8: (T, H, W, 3) uint8. Returns (T, out_h, out_w) float32
    relative disparity, temporally stitched.

    With ``mesh`` (a 1D 'data' Mesh) the window's time axis shards over
    devices: per-frame ViT work is pure DP, and the temporal attention
    becomes the only cross-device op — XLA inserts the collectives over
    the time axis (the sequence-parallel layout SURVEY.md §5 describes
    for the reference's windowed long-video mechanism).
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
    @jax.jit
    def run_window(p, win_u8):
        x = win_u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (window, work_hw[0], work_hw[1], 3),
                             "bilinear")
        d = apply_fn(p, x)
        return jax.image.resize(d, (window,) + tuple(out_hw), "bilinear")

    disps = []
    start = 0
    while start < t_total:
        idx = np.arange(start, start + window)
        idx = np.clip(idx, 0, t_total - 1)  # pad tail by repeating
        win = frames_u8[idx]
        d = robust_call(run_window, params, put(win))
        if batch_hook is not None:
            batch_hook(start, d)
        n_new = min(window, t_total - start)
        disps.append(d[:n_new])
        if start + window >= t_total:
            break
        start += step
    if len(disps) == 1:
        return disps[0][:t_total]
    return stitch_windows(disps, window, overlap, t_total)
