"""Production-dim TPU compile sweep over the model zoo.

Round-5 lesson: tiny-dim CPU tests prove graph/weight correctness but
cannot see TPU-only, production-dim-only failures — round 5 found the
DEFAULT movie engine (DA3) could not even compile at its real shapes
(920 GB score tensor), the int8 flash path VMEM-OOMed (round 3), and
the production Wan chunk needed a new kernel. This script initializes
every model family at its PRODUCTION working shape and runs ONE
jitted forward on the real chip, recording ok/fail + wall time.

Run on TPU (each entry compiles once; the persistent cache makes
re-runs cheap):

    python scripts/compile_sweep.py            # everything
    python scripts/compile_sweep.py --only raft,u2net

Production shapes are the reference wrappers' working points (cited
per entry). This is a compile/health gate, not a benchmark — timings
include compilation unless the cache is warm.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _bench_cache():
    import bench

    bench._enable_compile_cache()


def sweep_raft():
    """RAFT-large at source resolution (reference optical_flow.py runs
    the torchvision model at video res, streamed pair batches)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import raft

    model = raft.RAFT(raft.RAFT_LARGE)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 255, (1, 1080, 1920, 3)), jnp.float32)
    b = jnp.asarray(rng.integers(0, 255, (1, 1080, 1920, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), a, b)
    out = jax.jit(lambda p, x, y: jnp.sum(model.apply(p, x, y)))(
        params, a, b)
    assert np.isfinite(float(np.asarray(out)))


def sweep_cotracker():
    """CoTracker3 at the production clip shape: 120-frame clips
    (reference track_points_in_video.py:323-356), model res 384x512,
    one 256-track chunk (the engine's static chunk width)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import cotracker as ct

    model = ct.CoTracker3(ct.COTRACKER3)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.integers(0, 255, (120, 384, 512, 3)),
                        jnp.float32)
    q = jnp.asarray(
        np.stack([rng.integers(0, 120, 256),
                  rng.uniform(0, 511, 256),
                  rng.uniform(0, 383, 256)], 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), video, q)
    out = jax.jit(lambda p, v, qq: jnp.sum(
        model.apply(p, v, qq)["coords"]))(params, video, q)
    assert np.isfinite(float(np.asarray(out)))


def sweep_u2net():
    """U2Net at rembg's 320x320 working size (generate_video_mask)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import segmentation as seg

    model = seg.U2Net()  # SEG_FULL default
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (4, 320, 320, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, v: jnp.sum(model.apply(p, v)))(params, x)
    assert np.isfinite(float(np.asarray(out)))


def sweep_droid():
    """DROID front-end at the SLAM working res (mega-sam class runs
    ~1/8-res correlation on ~384x512 inputs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import droid

    model = droid.DroidNet(droid.DROID)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 384, 512, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, v: jnp.sum(
        model.apply(p, v)[0]))(params, x)
    assert np.isfinite(float(np.asarray(out)))


def sweep_unidepth():
    """UniDepth-V2 ViT-L at the 14-multiple working res (reference
    unidepth_video.py per-frame infer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import unidepth as ud

    model = ud.UniDepthNet(ud.UNIDEPTH_L)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 518, 924, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, v: jnp.sum(model.apply(p, v)[0]))(params, x)
    assert np.isfinite(float(np.asarray(out)))


def sweep_unik3d():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import unidepth as ud

    model = ud.UniK3DNet(ud.UNIDEPTH_L)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 518, 924, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, v: jnp.sum(model.apply(p, v)[0]))(params, x)
    assert np.isfinite(float(np.asarray(out)))


def sweep_moge():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import moge as mg

    model = mg.MoGeNet(mg.MOGE_L)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 518, 924, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, v: jnp.sum(
        jax.tree_util.tree_leaves(model.apply(p, v))[0]))(params, x)
    assert np.isfinite(float(np.asarray(out)))


def sweep_depthpro():
    """DepthPro at the apple working point: 1536x1536, 35-patch
    multiscale (reference depthpro_video.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import depthpro as dp

    model = dp.DepthProNet(dp.DEPTHPRO_L)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 1536, 1536, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, v: jnp.sum(
        jax.tree_util.tree_leaves(model.apply(p, v))[0]))(params, x)
    assert np.isfinite(float(np.asarray(out)))


def sweep_promptda():
    """PromptDA at full-res RGB + 256x192 prompt (reference
    upscale_depth_promptda.py:62-81), 14-multiple padded."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import promptda as pda

    model = pda.PromptDA(pda.PromptDAConfig())  # production default
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 1092, 1932, 3)), jnp.float32)
    prompt = jnp.asarray(rng.uniform(0.5, 5.0, (1, 192, 256)),
                         jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, prompt)
    out = jax.jit(lambda p, v, pr: jnp.sum(model.apply(p, v, pr)))(
        params, x, prompt)
    assert np.isfinite(float(np.asarray(out)))


def sweep_mvs():
    """MVSAnywhere-class cost-volume at the wrapper's working res with
    the reference's +-3 source views (video_mvsa.py:151-160)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import mvs

    model = mvs.MVSNet(mvs.MVSConfig())
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.uniform(0, 1, (384, 512, 3)), jnp.float32)
    src = jnp.asarray(rng.uniform(0, 1, (6, 384, 512, 3)), jnp.float32)
    k = jnp.asarray([[128.0, 0, 64], [0, 128.0, 48], [0, 0, 1]])
    poses = jnp.broadcast_to(jnp.eye(4), (6, 4, 4))
    valid = jnp.ones((6,), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ref, src, k,
                                 poses, valid)
    out = jax.jit(lambda p, *a: jnp.sum(
        model.apply(p, *a)["depth"]))(params, ref, src, k, poses, valid)
    assert np.isfinite(float(np.asarray(out)))


SWEEPS = {
    "raft": sweep_raft,
    "cotracker": sweep_cotracker,
    "u2net": sweep_u2net,
    "droid": sweep_droid,
    "unidepth": sweep_unidepth,
    "unik3d": sweep_unik3d,
    "moge": sweep_moge,
    "depthpro": sweep_depthpro,
    "promptda": sweep_promptda,
    "mvs": sweep_mvs,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    names = ([n.strip() for n in args.only.split(",") if n.strip()]
             if args.only else list(SWEEPS))
    _bench_cache()
    results = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            SWEEPS[name]()
            results[name] = {"ok": True,
                             "s": round(time.perf_counter() - t0, 1)}
        except Exception as e:
            results[name] = {"ok": False,
                             "s": round(time.perf_counter() - t0, 1),
                             "err": f"{type(e).__name__}: {e}"[:300]}
        print(f"[sweep] {name}: "
              f"{'OK' if results[name]['ok'] else 'FAIL'} "
              f"({results[name]['s']}s) "
              f"{results[name].get('err', '')}", flush=True)
    print(json.dumps(results))
    return 0 if all(r["ok"] for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
