"""Rolling-average affine->metric alignment (the reference docs'
video_metric_convert default that --no_rolling_average disables,
docs/USAGE.md:25; the current reference code only keeps the
first-frames fit — this build offers both)."""

import numpy as np

from metric_depth_video_toolbox_tpu.ops import solvers


def test_rolling_scale_shift_tracks_drifting_affine():
    """disp = a_t * inv_depth + b_t with slowly drifting (a_t, b_t):
    the recovered per-frame trajectory must track the drift so the
    aligned inverse depth matches the metric truth everywhere — the
    first-frames fit by construction cannot."""
    rng = np.random.default_rng(0)
    t, h, w = 120, 24, 32
    inv_true = 1.0 / rng.uniform(2.0, 20.0, (t, h, w)).astype(np.float32)
    frames = np.arange(t, dtype=np.float32)
    a_t = 2.0 + 0.01 * frames          # scale drifts 2.0 -> 3.2
    b_t = 0.05 + 0.001 * frames        # shift drifts too
    disp = a_t[:, None, None] * inv_true + b_t[:, None, None]

    idx = np.arange(0, t, 4)
    # solve disp -> inv_true (the engine fits model disp to metric inv)
    s, sh = solvers.rolling_scale_shift(disp[idx], inv_true[idx], idx, t,
                                        window=8)
    inv_rec = disp * s[:, None, None] + sh[:, None, None]
    err = np.abs(inv_rec - inv_true) / inv_true
    assert float(np.median(err)) < 0.02

    # the first-frames fit leaves a large tail error on the same data
    import jax
    s0, sh0 = jax.jit(solvers.scale_and_shift)(disp[:32], inv_true[:32])
    inv_first = disp * float(s0) + float(sh0)
    tail = np.abs(inv_first[-20:] - inv_true[-20:]) / inv_true[-20:]
    assert float(np.median(tail)) > 5 * float(np.median(err[-20:]))


def test_rolling_smoothing_window():
    """A noisy per-anchor fit must be smoothed by the window."""
    rng = np.random.default_rng(1)
    t = 64
    inv = 1.0 / rng.uniform(2.0, 20.0, (t, 16, 16)).astype(np.float32)
    noise = 1.0 + 0.2 * rng.standard_normal(t).astype(np.float32)
    disp = noise[:, None, None] * inv
    idx = np.arange(0, t, 1)
    s_raw, _ = solvers.rolling_scale_shift(disp, inv, idx, t, window=1)
    s_smooth, _ = solvers.rolling_scale_shift(disp, inv, idx, t, window=16)
    assert np.std(np.diff(s_smooth)) < 0.3 * np.std(np.diff(s_raw))


def test_vda_engine_rolling_smoke():
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    eng = dstage.VDAEngine(size="vitt", input_size=28, window=4,
                           overlap=1, max_depth=10.0, data_parallel=False,
                           rolling_average=8, anchor_stride=2)
    frames = np.random.default_rng(2).integers(
        0, 255, (10, 28, 28, 3), np.uint8)
    d = eng.infer_video(frames)
    assert d.shape == (10, 28, 28)
    assert np.isfinite(d).all() and d.min() >= 0 and d.max() <= 10.0
    # reference-depth path
    ref = np.full((10, 28, 28), 5.0, np.float32)
    d2 = eng.infer_video(frames, reference_depth=ref)
    assert np.isfinite(d2).all()
