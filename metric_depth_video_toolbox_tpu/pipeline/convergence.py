"""Convergence-depth finder: per-frame mean depth of the focus area.

Reference find_convergence_depth.py:44-94 — decode depth, optionally mask
to the subject (mask > 240), mean per frame, NaN when the mask is empty.
Here the whole batch reduces in one device op (masked mean over (T, H, W)).
Writes ``<depth_video>_convergence_depths.json``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import sidecar
from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.ops import codec
from metric_depth_video_toolbox_tpu.utils.host import to_host


@jax.jit
def masked_mean_depth(depth, mask_weight):
    """(T, H, W) depth x (T, H, W) weights -> (T,) means; NaN where the
    weights sum to zero."""
    num = jnp.sum(depth * mask_weight, axis=(-2, -1))
    den = jnp.sum(mask_weight, axis=(-2, -1))
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-9), jnp.nan)


def find_convergence_depths(depth_video, mask_video=None, max_depth=100.0,
                            batch_size=16, output=None):
    dv = vio.VideoReader(depth_video)
    mv = vio.VideoReader(mask_video) if mask_video else None

    dec = jax.jit(lambda rgb: codec.decode_depth_frame(rgb, max_depth,
                                                       average_rg=False))
    out = []
    while True:
        rgb = dv.read_batch(batch_size)
        if rgb is None:
            break
        depth = dec(jnp.asarray(rgb))
        if mv is not None:
            m = mv.read_batch(rgb.shape[0])
            if m is None:
                weight = jnp.ones(depth.shape, jnp.float32)
            else:
                gray = m.astype(np.float32).mean(-1)
                if m.shape[0] < rgb.shape[0]:
                    pad = np.ones((rgb.shape[0] - m.shape[0],) +
                                  gray.shape[1:], np.float32) * 255.0
                    gray = np.concatenate([gray, pad], 0)
                weight = jnp.asarray(gray > 240).astype(jnp.float32)
        else:
            weight = jnp.ones(depth.shape, jnp.float32)
        out.extend(to_host(masked_mean_depth(depth, weight)).tolist())
    dv.close()
    if mv is not None:
        mv.close()

    output = output or (depth_video + "_convergence_depths.json")
    sidecar.save_convergence_depths(output, np.asarray(out, np.float32))
    return output
