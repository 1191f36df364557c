"""int8 quantized inference path (ops/quant.py + ViTConfig.quant).

The quantized path must (a) keep the param tree bit-identical to the
float path so every checkpoint converter keeps working, and (b) stay
numerically close enough that depth output is unaffected at codec
precision. The reference has no quantized path (torch fp16/fp32 on
CUDA) — this is the TPU-native speed mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metric_depth_video_toolbox_tpu.models import vit as vit_mod
from metric_depth_video_toolbox_tpu.ops import quant


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_int8_dense_matches_float_matmul():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    ref = x @ w + b
    out = quant.int8_dense(x, w, b, compute_dtype=jnp.float32)
    assert out.dtype == jnp.float32
    assert _rel_l2(out, ref) < 0.02


def test_int8_dense_batched_and_scaled_rows():
    # per-token scales must absorb wildly different row magnitudes
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 96)) * (10.0 ** rng.integers(
        -3, 4, size=(2, 7, 1)))
    w = jnp.asarray(rng.normal(size=(96, 32)), jnp.float32)
    out = quant.int8_dense(jnp.asarray(x, jnp.float32), w, None,
                           compute_dtype=jnp.float32)
    ref = jnp.asarray(x, jnp.float32) @ w
    assert out.shape == (2, 7, 32)
    assert _rel_l2(out, ref) < 0.02


def test_quantize_symmetric_range_and_zero_guard():
    q, s = quant.quantize_symmetric(jnp.zeros((4, 8)), axis=1)
    assert q.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(q))) == 0
    assert np.all(np.isfinite(np.asarray(s)))
    x = jnp.asarray(np.linspace(-3, 3, 32, dtype=np.float32))[None]
    q, s = quant.quantize_symmetric(x, axis=1)
    assert int(jnp.max(jnp.abs(q))) == 127


def test_vit_quant_same_param_tree_and_close_output():
    cfg = dataclasses.replace(vit_mod.VIT_TINY, dtype="float32",
                              attention_impl="xla")
    qcfg = dataclasses.replace(cfg, quant="int8")
    imgs = jnp.asarray(
        np.random.default_rng(2).uniform(size=(1, 28, 28, 3)), jnp.float32)
    params = vit_mod.ViT(cfg).init(jax.random.PRNGKey(0), imgs)
    # identical tree: the quantized model loads the SAME checkpoint
    qshape = jax.eval_shape(
        lambda p: vit_mod.ViT(qcfg).init(jax.random.PRNGKey(0), imgs), None)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(qshape))
    feats, cls = vit_mod.ViT(cfg).apply(params, imgs)
    qfeats, qcls = vit_mod.ViT(qcfg).apply(params, imgs)
    for f, qf in zip(feats, qfeats):
        f = np.asarray(f, np.float64).ravel()
        qf = np.asarray(qf, np.float64).ravel()
        cos = f @ qf / (np.linalg.norm(f) * np.linalg.norm(qf) + 1e-12)
        assert cos > 0.98, cos


def test_quantized_dp_sharding_matches_unsharded():
    """DP-sharded quantized inference matches the unsharded run. The
    int8 dots accumulate exactly in int32, but the surrounding bf16 ops
    fuse differently per sharding, so the criterion is the same
    bf16-depth tolerance the float parallel test uses, plus a tight
    mean bound (the conftest mesh has 8 virtual devices)."""
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    frames = np.random.default_rng(7).integers(
        0, 255, (8, 28, 28, 3), np.uint8)
    base = dstage.SingleFrameEngine(size="vitt", input_size=28,
                                    max_depth=10.0, data_parallel=False,
                                    quantize="int8")
    d0 = base.infer_video(frames, batch=8)
    sharded = dstage.SingleFrameEngine(size="vitt", input_size=28,
                                       max_depth=10.0, data_parallel=True,
                                       quantize="int8",
                                       params=base._params)
    d1 = sharded.infer_video(frames, batch=8)
    np.testing.assert_allclose(d0, d1, atol=0.5)
    assert float(np.abs(d0 - d1).mean()) < 0.02


def test_depthpro_real_graph_quantized_smoke():
    """The converted-checkpoint DepthPro path shares vit_mod.Block, so
    --quantize int8 applies to its patch/image encoders too."""
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    from tests.test_weight_exact_depthpro import _tiny_pair
    _, _, params = _tiny_pair(True)
    eng = dstage.SingleFrameEngine(size="vitt", params=params,
                                   variant="depthpro", max_depth=50.0,
                                   data_parallel=False, quantize="int8")
    assert eng._depthpro_cfg.vit.quant == "int8"
    frames = np.random.default_rng(4).integers(
        0, 255, (1, 128, 128, 3), np.uint8)
    d, fovs = eng.infer_video(frames, batch=1, return_fov=True)
    assert d.shape == (1, 128, 128)
    assert np.all(np.isfinite(d)) and float(d.max()) <= 50.0


def test_single_frame_engine_quantized_smoke():
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    eng = dstage.SingleFrameEngine(size="vitt", input_size=28,
                                   max_depth=10.0, data_parallel=False,
                                   quantize="int8")
    assert eng.cfg.vit.quant == "int8"
    frames = np.random.default_rng(3).integers(
        0, 255, size=(2, 32, 48, 3), dtype=np.uint8)
    d = eng.infer_video(frames)
    assert d.shape == (2, 32, 48)
    assert np.all(np.isfinite(d)) and d.min() >= 0 and d.max() <= 10.0
