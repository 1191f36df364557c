"""Kernel-level timing: single disparity_sweep vs fused dual sweep.

Times the raw Pallas calls on 1080p inputs for two scene statistics:
'random' (per-pixel uniform depth — the bench worst case: every
(tile, plane) is active) and 'smooth' (piecewise-smooth slabs + ramp —
what real depth-model output looks like; activity bitmaps are sparse).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 1080, 1920
PLANES = 128
ITERS = 8


def scenes(rng):
    rnd = rng.uniform(1.0, 60.0, (H, W)).astype(np.float32)
    rnd[:, W // 3: W // 2] = 3.0
    sm = np.tile(np.linspace(8.0, 40.0, H, dtype=np.float32)[:, None],
                 (1, W))
    sm[200:700, 300:800] = 3.0
    sm[400:900, 1100:1600] = 6.0
    sm[:, 500:560] = 12.0
    return {"random": rnd, "smooth": sm}


def main():
    import jax
    import jax.numpy as jnp
    from metric_depth_video_toolbox_tpu.ops import warp_pallas as wp
    from metric_depth_video_toolbox_tpu.ops import geometry as geo
    from metric_depth_video_toolbox_tpu.ops import rasterize

    rng = np.random.default_rng(0)
    color = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    extra = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    k = np.asarray(geo.camera_matrix_from_fov(W, H, xfov_deg=60.0),
                   np.float32)
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 0.063 / 2

    def timeit(fn):
        fn()
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                fn()
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return 1000.0 * best

    for name, depth in scenes(rng).items():
        d = jnp.asarray(depth)
        c = jnp.asarray(color)
        e = jnp.asarray(extra)

        def single():
            res = rasterize.stereo_sweep_warp(
                d, c, k, m, num_planes=PLANES, remove_edges=True,
                neutralize_rotation=False, interpret=False)
            return float(res.depth.sum())

        def single_anchor():
            pts = geo.unproject_depth(d, k, of_by_one=False)
            edge = rasterize.cell_edge_mask(pts, 89.0)
            ed = jnp.where(edge, d, 0.0)
            payload = jnp.concatenate([c, e], axis=-1)
            res = rasterize.stereo_sweep_warp(
                ed, payload, k, m, num_planes=PLANES // 4,
                remove_edges=False, neutralize_rotation=False,
                interpret=False)
            return float(res.depth.sum())

        def dual():
            main_r, ac, ae, af = rasterize.stereo_sweep_warp_dual(
                d, c, e, k, m, num_planes=PLANES,
                neutralize_rotation=False, interpret=False)
            return float(main_r.depth.sum() + ae.sum())

        jmain = jax.jit(single)
        janch = jax.jit(single_anchor)
        jdual = jax.jit(dual)
        t_m = timeit(lambda: jax.block_until_ready(jmain()))
        t_a = timeit(lambda: jax.block_until_ready(janch()))
        t_d = timeit(lambda: jax.block_until_ready(jdual()))
        print(f"{name:8s} main {t_m:6.2f} ms  anchor {t_a:6.2f} ms  "
              f"two-call {t_m + t_a:6.2f} ms  dual {t_d:6.2f} ms")


if __name__ == "__main__":
    main()
