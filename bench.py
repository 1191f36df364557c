"""Benchmark: the headline metric from BASELINE.json — 1080p frames/sec/
chip for depth inference + stereo rerender (the movie->SBS hot path).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the denominator is a
measured reference-equivalent single-thread numpy path (same math the
reference runs per frame: decode -> unproject -> transform -> project ->
z-buffer splat for both eyes) on this host, as prescribed by SURVEY.md §6.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

_T_START = time.perf_counter()
# Total wall budget: the round-4 driver run timed out (rc=124) before
# ANY JSON was printed — the cold-process remote compile of the stereo
# program alone took ~470 s and the detail benches (diffusion UNet at
# 1024x768, VDA engine) each add minutes of compile. Strategy: persist
# compiled executables across processes (cache dir below, warmed during
# the round so the driver's fresh process hits it), print the headline
# JSON as soon as the headline metrics exist, and start a detail bench
# only while inside the budget. The final reprint includes every detail
# that fit; a timeout kill between prints still leaves a valid line.
_BUDGET_S = float(os.environ.get("MDVT_BENCH_BUDGET_S", "560"))


def _remaining():
    return _BUDGET_S - (time.perf_counter() - _T_START)


def _enable_compile_cache():
    import jax

    cache = os.environ.get(
        "MDVT_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimization, never a failure
        print(f"# compile cache unavailable: {e}")

H, W = 1080, 1920
BATCH = 16
ITERS = 6
DEPTH_BATCH = 32
DEPTH_ITERS = 4


def _synth_cached(fn, tag, rng_seed, b):
    """Disk-cache the deterministic synthetic batches: generating 132M
    gaussians for the 1080p scene costs ~27 s of the bench's budget on
    this 1-core host. Keyed by (generator, seed, batch, H, W)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench_cache",
                        f"{tag}_s{rng_seed}_b{b}_{H}x{W}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["depth"], z["color"]
    depth, color = fn(np.random.default_rng(rng_seed), b)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, depth=depth, color=color)
    except OSError:
        pass
    return depth, color


def _synth_batch(rng, b):
    """Piecewise-smooth scene statistics, like real depth-model output.

    Neural depth maps are locally smooth by construction (ViT/DPT heads
    upsample low-res features); per-pixel-random depth never occurs in
    the movie pipeline and exercises neither path representatively. The
    scene: a ground ramp + several foreground slabs at staggered depths
    (silhouette edges -> real edge-anchor + infill-mask work) + 1%
    multiplicative noise (sensor/model grain). The SAME frames feed the
    numpy reference path, so vs_baseline stays apples-to-apples.
    """
    yy = np.linspace(0.0, 1.0, H, dtype=np.float32)[:, None]
    base = 8.0 + 42.0 * yy                      # 8..50 m ground ramp
    depth = np.tile(base, (1, W))[None].repeat(b, axis=0)
    objs = [  # (top, bottom, left, right, depth_m)
        (H // 5, 3 * H // 5, W // 8, W // 3, 3.0),
        (H // 3, 9 * H // 10, W // 2, 2 * W // 3, 6.5),
        (H // 2, 4 * H // 5, 3 * W // 4, 9 * W // 10, 12.0),
        (0, H // 4, 2 * W // 5, 3 * W // 5, 25.0),
    ]
    for i, (t, bt, lf, rt, z) in enumerate(objs):
        depth[:, t:bt, lf:rt] = z * (1.0 + 0.05 * np.sin(i))
    depth *= 1.0 + 0.01 * rng.standard_normal((b, H, W)).astype(np.float32)
    depth = np.clip(depth, 1.0, 99.0).astype(np.float32)
    # Color: film-like statistics, same argument as the depth scene
    # above — real frames are textured but locally correlated (lossless
    # codecs get ~2x on film; pure per-pixel noise is incompressible
    # and occurs in no movie). Composition: smooth lighting gradients +
    # per-object albedo + fine sinusoidal texture + sensor grain.
    yy = np.linspace(0, 1, H, dtype=np.float32)[:, None, None]
    xx = np.linspace(0, 1, W, dtype=np.float32)[None, :, None]
    base = 90 + 70 * yy + 40 * xx * np.array([1.0, 0.8, 0.6], np.float32)
    tex = 18 * np.sin(xx * 97.0 + yy * 31.0) * np.cos(yy * 211.0)
    col = np.broadcast_to(base + tex, (b, H, W, 3)).copy()
    for i, (t, bt, lf, rt, _z) in enumerate(objs):
        col[:, t:bt, lf:rt] += np.asarray(
            [[25, -30, 10], [-35, 20, 30], [15, 25, -25],
             [-20, -15, 35]][i], np.float32)
    col += 3.0 * rng.standard_normal((b, H, W, 3)).astype(np.float32)
    color = np.clip(col, 0, 255).astype(np.uint8)
    return depth, color


def _synth_batch_random(rng, b):
    """Adversarial worst case: per-pixel random depth (every
    (tile, plane) of the sweep kernel active). Reported as a detail
    metric so scene-structure sensitivity is visible."""
    depth = rng.uniform(1.0, 60.0, (b, H, W)).astype(np.float32)
    depth[:, :, W // 3: W // 2] = 3.0
    depth[:, H // 3: H // 2, :] *= 0.5
    color = rng.integers(0, 255, (b, H, W, 3), dtype=np.uint8)
    return depth, color


def bench_stereo(jit_warm=True, scene="smooth", fused=None):
    """Device stereo step in the MOVIE-PIPELINE configuration: edge-point
    splatting + infill-mask emission ON (movie step5 defaults; the
    reference hot path includes both, stereo_rerender.py:589-607,
    740-817)."""
    import jax
    import jax.numpy as jnp

    from metric_depth_video_toolbox_tpu.ops import codec, geometry as geo
    from metric_depth_video_toolbox_tpu.pipeline import stereo

    synth = _synth_batch if scene == "smooth" else _synth_batch_random
    depth, color = _synth_cached(synth, scene, 0, BATCH)
    kw = {} if fused is None else {"fused_anchor_sweep": fused}
    cfg = stereo.StereoConfig(width=W, height=H, out_width=W, out_height=H,
                              max_depth=100.0, remove_edges=True,
                              place_edge_points=True,
                              make_infill_mask=True,
                              warp_method="sweep", has_convergence=True,
                              **kw)
    k = np.asarray(geo.camera_matrix_from_fov(W, H, xfov_deg=60.0),
                   np.float32)
    enc = jax.jit(lambda d: codec.encode_depth_frame(d, 100.0))
    depth_rgb = np.asarray(enc(jnp.asarray(depth)))

    # ITERS batches run CHAINED on device: each iteration's input takes
    # a (numerically zero, non-foldable: 0.0*float can be NaN) data
    # dependency on the previous checksum, so the device executes them
    # strictly serially, and ONE scalar fetch ends the program. This
    # measures true device throughput — the per-iteration host fetch it
    # replaces added a tunnel round trip (~1 ms/frame) that the
    # production driver's async pipeline never pays. (A bare
    # block_until_ready is NOT truthful on this runtime — it can
    # acknowledge before execution completes — hence the checksum
    # dependency chain.)
    vstep = jax.vmap(partial(stereo.stereo_frame, cfg=cfg),
                     in_axes=(0, 0, None, None, None, None, None))

    def chk(o):
        return (o["image"].astype(jnp.int32).sum()
                + o["infill_mask"].astype(jnp.int32).sum())

    @partial(jax.jit, static_argnames=("n",))
    def run_n(d, c, k1, k2, tf, conv, sc, n):
        def body(_, acc):
            o = vstep(d, c, k1, k2, tf,
                      conv + 0.0 * acc.astype(jnp.float32) * 1e-30, sc)
            return chk(o)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    args = (jnp.asarray(depth_rgb), jnp.asarray(color), jnp.asarray(k),
            jnp.asarray(k), jnp.eye(4), jnp.asarray(2.0), jnp.asarray(1.0))
    _ = float(np.asarray(run_n(*args, n=ITERS)))
    t0 = time.perf_counter()
    _ = float(np.asarray(run_n(*args, n=ITERS)))
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def bench_e2e_file_to_file(n_frames=24):
    """True end-to-end stereo stage: FFV1 files in -> SBS + infill-mask
    FFV1 files out through the real driver (async prefetch decode +
    async encode), wall-clock. This is the number the movie pipeline
    actually experiences per scene (host I/O included)."""
    import tempfile

    import jax.numpy as jnp
    import jax

    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.ops import codec
    from metric_depth_video_toolbox_tpu.pipeline import stereo

    depth, color = _synth_cached(_synth_batch, "smooth", 2, 4)
    enc = jax.jit(lambda d: codec.encode_depth_frame(d, 100.0))
    depth_rgb = np.asarray(enc(jnp.asarray(depth)))
    with tempfile.TemporaryDirectory() as td:
        dpath = td + "/bench_depth.mkv"
        cpath = td + "/bench_color.mkv"
        reps = (n_frames + 3) // 4
        vio.save_rgb_video(np.tile(depth_rgb, (reps, 1, 1, 1))[:n_frames],
                           dpath, 24)
        vio.save_rgb_video(np.tile(color, (reps, 1, 1, 1))[:n_frames],
                           cpath, 24)
        # warm compile outside the timed window (first jit of the step)
        stereo.render_stereo_video(
            dpath, cpath, output=td + "/warm.mkv", xfov=60.0,
            max_depth=100.0, infill_mask=True, batch_size=8,
            max_frames=8)
        t0 = time.perf_counter()
        stereo.render_stereo_video(
            dpath, cpath, output=td + "/out.mkv", xfov=60.0,
            max_depth=100.0, infill_mask=True, batch_size=8)
        dt = time.perf_counter() - t0
    return n_frames / dt


def bench_depth_inference(size="vits", batch=None, hw=(14 * 37, 14 * 66),
                          quant=None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from metric_depth_video_toolbox_tpu.models import depth_anything as da

    batch = batch or DEPTH_BATCH
    cfg = da.preset(size, metric=False)
    if quant:  # --quantize int8 speed mode (ops/quant.py)
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, quant=quant))
    model = da.DepthAnything(cfg)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (batch,) + hw + (3,)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    jax.block_until_ready(params)

    # chained iterations, one end fetch — same truth argument as
    # bench_stereo (per-iter fetch taxed ~1.7 fps of tunnel RTT)
    @partial(jax.jit, static_argnames=("n",))
    def run_n(p, v, n):
        def body(_, acc):
            return jnp.sum(model.apply(
                p, v + (0.0 * acc * 1e-30).astype(v.dtype)))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    _ = float(np.asarray(run_n(params, x, DEPTH_ITERS)))
    t0 = time.perf_counter()
    _ = float(np.asarray(run_n(params, x, DEPTH_ITERS)))
    dt = time.perf_counter() - t0
    return batch * DEPTH_ITERS / dt


def bench_infill_diffusion():
    """Diffusion infill at the StereoCrafter production working point
    (DIFFUSION_SVD UNet, 25-frame chunk at 1024x768, 5 EDM steps —
    reference stereo_crafter_infill.py:220,97-99). Frames/s of a warm
    infill_chunk; random-init weights (same FLOPs as converted ones)."""
    from metric_depth_video_toolbox_tpu.models import diffusion as dif
    from metric_depth_video_toolbox_tpu.pipeline import infill_diffusion

    eng = infill_diffusion.DiffusionInfillEngine(
        cfg=dif.DIFFUSION_SVD, work_hw=(768, 1024), chunk=25, overlap=6)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (25, 768, 1024, 3), dtype=np.uint8)
    holes = np.zeros((25, 768, 1024), bool)
    holes[:, 300:460, 400:640] = True
    eng.infill_chunk(frames, holes)  # compile + warm
    t0 = time.perf_counter()
    out = eng.infill_chunk(frames, holes)
    dt = time.perf_counter() - t0
    assert out.shape == frames.shape and np.isfinite(
        out.astype(np.float32)).all()
    return 25 / dt


def bench_vda_engine(n_frames=48):
    """Engine-level ViT-L video-depth fps: the full VDAEngine window
    path (windowed temporal model + metric-anchor scale/shift), the
    movie pipeline's default depth engine mechanics
    (video_metric_convert.py:77-150). Includes host<->device transfers
    — the fps a real scene experiences once files are in memory."""
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage

    eng = dstage.VDAEngine(size="vitl", input_size=518,
                           metric_anchor_frames=8, max_depth=100.0)
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, (n_frames, 518, 924, 3), dtype=np.uint8)
    eng.infer_video(frames[: eng.cfg.window + 1])  # compile both windows
    t0 = time.perf_counter()
    d = eng.infer_video(frames)
    dt = time.perf_counter() - t0
    assert d.shape == frames.shape[:3] and np.isfinite(d).all()
    return n_frames / dt


def bench_da3_engine(n_frames=46):
    """Engine-level DA3 fps at the production config (DA3_L, windowed
    40/6/6, resolution 504 — the movie pipeline's DEFAULT engine,
    reference video_da3.py:274): windowed cross-view ViT + DualDPT +
    pose/scale stitching, incl. transfers. Cross-view attention runs
    ~135k concatenated tokens/window — the round-5 flash reroute is
    what makes this compile at all (an (N, N) score tensor here is
    920 GB)."""
    from metric_depth_video_toolbox_tpu.models import da3 as da3_mod

    eng = da3_mod.DA3Engine()
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (n_frames, 504, 896, 3),
                          dtype=np.uint8)
    d, c2w, xf = eng.infer_video(frames)  # compile
    t0 = time.perf_counter()
    d, c2w, xf = eng.infer_video(frames)
    dt = time.perf_counter() - t0
    assert d.shape == frames.shape[:3] and np.isfinite(d).all()
    assert c2w.shape == (n_frames, 4, 4)
    return n_frames / dt


def bench_reference_equivalent_numpy(n_frames=3):
    """Single-thread numpy version of the same per-frame work the reference
    does on host (unproject -> transform -> project -> 2x z-buffer splat),
    as the baseline denominator. The host core is shared, so the median
    of per-frame timings is reported."""
    depth, color = _synth_cached(_synth_batch, "smooth", 0, 1)
    depth, color = depth[0], color[0]
    fx = W / (2 * np.tan(np.radians(30.0)))
    cx, cy = W / 2, H / 2
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    times = []
    for _ in range(n_frames):
        t0 = time.perf_counter()
        for shift in (-0.0315, 0.0315):
            x3 = (xs - cx) * depth / fx + shift
            y3 = (ys - cy) * depth / fx
            z = depth
            u = np.round(x3 / z * fx + cx).astype(np.int64)
            v = np.round(y3 / z * fx + cy).astype(np.int64)
            ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
            flat = v[ok] * W + u[ok]
            zbuf = np.full(H * W, np.inf, np.float32)
            np.minimum.at(zbuf, flat, z[ok])
            img = np.zeros((H * W, 3), np.uint8)
            win = z[ok] <= zbuf[flat] + 1e-3
            img[flat[win]] = color[ok][win]
            # infill-mask emission (the reference hot path also builds
            # the disocclusion mask, stereo_rerender.py:740-817)
            hole = ~np.isfinite(zbuf)
            mask = np.zeros((H * W, 3), np.uint8)
            mask[hole] = (0, 0, 255)
        times.append(time.perf_counter() - t0)
    return 1.0 / float(np.median(times))


def _emit(stereo_fps, depth_fps, ref_fps, detail):
    """Print the ONE headline JSON line (reprinted as details land —
    the driver takes the last line, and a timeout kill between prints
    still leaves a complete earlier line)."""
    combined = 1.0 / (1.0 / stereo_fps + 1.0 / depth_fps)
    # reference pipeline also needs depth inference; its stereo path alone
    # is the dominant cost we can measure here, so compare combined vs it.
    result = {
        "metric": "1080p_sbs_pipeline_frames_per_sec_per_chip",
        "value": round(combined, 3),
        "unit": "frames/s",
        "vs_baseline": round(combined / ref_fps, 2),
        "detail": {k: round(v, 3) for k, v in detail.items()},
    }
    print(json.dumps(result), flush=True)


def _probe_device(timeout_s=90.0):
    """jax.devices() can hang FOREVER when the relay tunnel is down
    (observed >1 h outages; CLAUDE.md). Probe it on a daemon thread so
    a dead tunnel turns into a visible retry loop instead of a silent
    driver-timeout with no JSON at all (round 4's failure mode)."""
    import threading

    ok = []

    def probe():
        import jax
        ok.append(str(jax.devices()))

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    return bool(ok)


def main():
    _enable_compile_cache()
    while not _probe_device():
        if _remaining() < 120:
            print("# TPU tunnel unreachable for the whole bench budget;"
                  " no measurement possible", flush=True)
            return 3
        print(f"# TPU tunnel unreachable; retrying "
              f"({_remaining():.0f}s budget left)", flush=True)
        time.sleep(30)
    # ---- headline metrics first; emit as soon as they exist ----
    stereo_fps = bench_stereo()  # movie config: edge points + mask ON
    print(f"# [{time.perf_counter() - _T_START:.0f}s] stereo "
          f"{stereo_fps:.2f} fps", flush=True)
    depth_fps = bench_depth_inference("vitl")  # DEPTH_BATCH
    print(f"# [{time.perf_counter() - _T_START:.0f}s] depth "
          f"{depth_fps:.2f} fps", flush=True)
    ref_fps = bench_reference_equivalent_numpy(n_frames=5)
    detail = {
        "stereo_render_fps_movie_cfg": stereo_fps,
        "depth_inference_fps_vitl_518": depth_fps,
        "reference_equiv_numpy_fps": ref_fps,
    }
    _emit(stereo_fps, depth_fps, ref_fps, detail)

    # ---- detail metrics, budget-gated, cheapest-compile first ----
    nan = float("nan")
    details = [
        ("stereo_render_fps_random_depth",  # shares the stereo program
         lambda: bench_stereo(scene="random"), 30),
        ("depth_inference_fps_vitl_518_int8",
         lambda: bench_depth_inference("vitl", quant="int8"), 90),
        ("e2e_file_to_file_stereo_fps", bench_e2e_file_to_file, 120),
        ("vda_engine_fps_vitl", bench_vda_engine, 120),
        ("diffusion_infill_fps_svd_25x1024x768",
         bench_infill_diffusion, 120),
        ("da3_engine_fps_prod", bench_da3_engine, 150),
    ]
    for name, fn, min_need in details:
        if _remaining() < min_need:
            print(f"# skipping {name}: {_remaining():.0f}s left "
                  f"< {min_need}s budget", flush=True)
            detail[name] = nan
            continue
        try:
            detail[name] = fn()
        except Exception as e:
            print(f"# {name} failed: {e}", flush=True)
            detail[name] = nan
        print(f"# [{time.perf_counter() - _T_START:.0f}s] {name} "
              f"{detail[name]:.2f}", flush=True)
        _emit(stereo_fps, depth_fps, ref_fps, detail)


if __name__ == "__main__":
    import sys

    sys.exit(main())
