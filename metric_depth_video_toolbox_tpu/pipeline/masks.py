"""Mask generation stage: color video -> grayscale subject-mask video.

Reference generate_video_mask.py (rembg/U²-Net per frame, micro-batches).
Here the segmentation model runs on batched device frames; the output is a
binary 0/255 grayscale FFV1 video named ``<video>_mask.mkv``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.models import segmentation as seg
from metric_depth_video_toolbox_tpu.utils.host import robust_call


class MaskEngine:
    def __init__(self, cfg=None, params=None, work=320, rng_seed=0,
                 threshold=0.5):
        self.cfg = cfg or seg.SEG_FULL
        self.model = seg.U2Net(self.cfg)
        self.work = work
        self.threshold = threshold
        self._params = params
        self._rng = jax.random.PRNGKey(rng_seed)

    def _ensure(self, b):
        if self._params is None:
            x = jnp.zeros((1, self.work, self.work, 3))
            self._params = jax.jit(self.model.init)(self._rng, x)

    def masks_for(self, frames_u8):
        """(B, H, W, 3) uint8 -> (B, H, W) uint8 in {0, 255}."""
        b, h, w = frames_u8.shape[:3]
        self._ensure(b)

        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        if (h, w) in cache:  # avoid per-batch retrace of a fresh def
            return robust_call(cache[(h, w)], self._params,
                               jnp.asarray(frames_u8))

        # params as argument (closure-captured device arrays become MLIR
        # constants — a full weight download at trace time)
        @jax.jit
        def run(params, x_u8):
            x = x_u8.astype(jnp.float32) / 255.0
            x = jax.image.resize(x, (x.shape[0], self.work, self.work, 3),
                                 "bilinear")
            p = self.model.apply(params, x)
            p = jax.image.resize(p, (x.shape[0], h, w), "bilinear")
            return (p > self.threshold).astype(jnp.uint8) * 255

        cache[(h, w)] = run
        return robust_call(run, self._params, jnp.asarray(frames_u8))


def generate_video_mask(color_video, output=None, batch_size=8,
                        engine=None, max_frames=-1):
    eng = engine or MaskEngine()
    output = output or (color_video + "_mask.mkv")
    reader = vio.VideoReader(color_video, max_frames=max_frames)
    writer = vio.VideoWriter(output, reader.fps, reader.width,
                             reader.height)
    n = 0
    while True:
        batch = reader.read_batch(batch_size)
        if batch is None:
            break
        masks = eng.masks_for(batch)
        for m in masks:
            writer.write(np.stack([m, m, m], axis=-1))
        n += masks.shape[0]
    reader.close()
    writer.commit(n)
    return output
