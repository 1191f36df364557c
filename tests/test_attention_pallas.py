"""packed_flash_attention (interpret mode on CPU): equivalence vs
dense XLA attention with key masking, across head-group counts,
multiple k blocks, and interleaved pads.

Mirrors tests/test_warp_pallas.py's interpret-mode pattern: round-3/4
breakages were exactly the TPU-only class that CPU fallback tests
cannot see; interpret mode runs the real kernel body.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metric_depth_video_toolbox_tpu.ops import attention_pallas as ap


def _dense_reference(qkv4, valid, num_heads, sm_scale):
    """Straight softmax attention over the packed layout, f64-free
    numpy/XLA oracle with pad keys masked out."""
    b, n, three_h, d = qkv4.shape
    h = num_heads
    q = qkv4[:, :, 0 * h: 1 * h]            # (B, N, H, D)
    k = qkv4[:, :, 1 * h: 2 * h]
    v = qkv4[:, :, 2 * h: 3 * h]
    bias = jnp.where(valid, 0.0, -1e30)[None, None, None, :]
    return jax.nn.dot_product_attention(
        q, k, v, bias=bias.astype(q.dtype), scale=sm_scale)


def _run(h, n, valid, block_q=64, block_k=64, d=64, b=2, seed=0):
    rng = np.random.default_rng(seed)
    qkv4 = rng.standard_normal((b, n, 3 * h, d)).astype(np.float32)
    sm_scale = 1.0 / float(d) ** 0.5
    out = ap.packed_flash_attention(
        jnp.asarray(qkv4), jnp.asarray(valid), num_heads=h,
        sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        interpret=True)
    ref = _dense_reference(jnp.asarray(qkv4), jnp.asarray(valid), h,
                           sm_scale)
    return np.asarray(out), np.asarray(ref)


@pytest.mark.parametrize("h", [8, 16, 24])
def test_packed_flash_matches_dense_head_groups(h):
    """One/two/three 8-head groups (ViT-L has 16 heads, ViT-G 24);
    n=256 with 64-blocks = 4 q blocks x 4 k blocks, so the online
    softmax streams over multiple key blocks."""
    n = 256
    valid = np.ones((n,), bool)
    out, ref = _run(h, n, valid)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_packed_flash_interleaved_pads():
    """DA3 cross-view concatenation interleaves per-view pad runs in
    the middle of the sequence; pad KEYS must be excluded from every
    softmax while pad QUERY rows are by-contract garbage (sliced off
    by the caller) and are not compared."""
    n, h = 256, 8
    valid = np.ones((n,), bool)
    valid[100:128] = False          # interior pad run (view boundary)
    valid[240:] = False             # tail pads
    out, ref = _run(h, n, valid, seed=1)
    rows = np.where(valid)[0]
    np.testing.assert_allclose(out[:, rows], ref[:, rows],
                               atol=2e-5, rtol=2e-5)
    assert np.isfinite(out).all()   # pad rows garbage but finite


def test_packed_flash_pad_only_leading_block():
    """A whole leading k block of pads: the m=-inf -> first-real-key
    rescale path (kernel _init comment) must zero out the garbage."""
    n, h = 256, 8
    valid = np.ones((n,), bool)
    valid[:64] = False              # entire first key block masked
    out, ref = _run(h, n, valid, seed=2)
    rows = np.where(valid)[0]
    np.testing.assert_allclose(out[:, rows], ref[:, rows],
                               atol=2e-5, rtol=2e-5)


def test_packed_flash_uneven_blocks():
    """block_q != block_k and blocks that do not tile the sequence
    equally (n=384: 3 q blocks of 128, 6 k blocks of 64)."""
    n, h = 384, 16
    valid = np.ones((n,), bool)
    valid[380:] = False
    out, ref = _run(h, n, valid, block_q=128, block_k=64, seed=3)
    rows = np.where(valid)[0]
    np.testing.assert_allclose(out[:, rows], ref[:, rows],
                               atol=2e-5, rtol=2e-5)
