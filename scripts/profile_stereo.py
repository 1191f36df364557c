"""Per-feature cost breakdown of the device stereo step (real TPU).

Times the jitted batched stereo_frame under feature toggles so kernel
work can be attributed: light (no anchors/mask), +mask, +anchors, full
TRUE movie config. Run twice per config; the second number is truth
(CLAUDE.md warm-up rule is handled by timing after a warm iteration).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 1080, 1920
BATCH = 16
ITERS = 6


def main():
    import jax
    import jax.numpy as jnp

    from metric_depth_video_toolbox_tpu.ops import codec, geometry as geo
    from metric_depth_video_toolbox_tpu.pipeline import stereo

    rng = np.random.default_rng(0)
    depth = rng.uniform(1.0, 60.0, (BATCH, H, W)).astype(np.float32)
    depth[:, :, W // 3: W // 2] = 3.0
    depth[:, H // 3: H // 2, :] *= 0.5
    color = rng.integers(0, 255, (BATCH, H, W, 3), dtype=np.uint8)
    k = np.asarray(geo.camera_matrix_from_fov(W, H, xfov_deg=60.0),
                   np.float32)
    enc = jax.jit(lambda d: codec.encode_depth_frame(d, 100.0))
    depth_rgb = np.asarray(enc(jnp.asarray(depth)))

    def run(name, **kw):
        cfg = stereo.StereoConfig(
            width=W, height=H, out_width=W, out_height=H,
            max_depth=100.0, remove_edges=True,
            warp_method="sweep", has_convergence=True, **kw)
        vstep = jax.vmap(partial(stereo.stereo_frame, cfg=cfg),
                         in_axes=(0, 0, None, None, None, None, None))
        step = jax.jit(lambda *a: (
            lambda o: (o["image"].astype(jnp.int32).sum()
                       + o["infill_mask"].astype(jnp.int32).sum()))(
                           vstep(*a)))
        args = (jnp.asarray(depth_rgb), jnp.asarray(color), jnp.asarray(k),
                jnp.asarray(k), jnp.eye(4), jnp.asarray(2.0),
                jnp.asarray(1.0))
        _ = float(np.asarray(step(*args)))
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                _ = float(np.asarray(step(*args)))
            best = min(best, time.perf_counter() - t0)
        fps = BATCH * ITERS / best
        ms = 1000.0 * best / (BATCH * ITERS)
        print(f"{name:32s} {fps:8.1f} fps  {ms:7.2f} ms/frame")
        return ms

    light = run("light (no anchors, no mask)",
                place_edge_points=False, make_infill_mask=False)
    mask = run("+infill mask", place_edge_points=False,
               make_infill_mask=True)
    anch = run("+edge anchors", place_edge_points=True,
               make_infill_mask=False)
    full = run("TRUE config (anchors+mask)", place_edge_points=True,
               make_infill_mask=True)
    print(f"mask cost   {mask - light:6.2f} ms")
    print(f"anchor cost {anch - light:6.2f} ms")
    print(f"full delta  {full - light:6.2f} ms")


if __name__ == "__main__":
    main()
