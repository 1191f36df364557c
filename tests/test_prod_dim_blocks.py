"""Production-dimension block-level forward equivalence (VERDICT r3 #6).

Every weight-exact test in the suite runs at tiny dims (fast on CPU —
the right default), but both round-3 breakages (flash-attention
blocking, int8 VMEM) were production-dim-only: a dim-dependent bug
passes every tiny test. These tests run ONE block per model family at
the REAL widths the flagship configs ship (ViT-L 1024/16-heads at the
real 518x924 token count ~2560; SVD UNet at its production channel
stack 320/640/1280/1280, reference stereo_crafter_infill.py's
diffusers UNetSpatioTemporalConditionModel; Wan-1.3B DiT at dim 1536 /
ffn 8960 / umT5 4096) in float32 on CPU — seconds each, catches the
dim-dependent class (head-count splits, channel bookkeeping, rotary
table sizes, converter transposes) that tiny dims cannot.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from metric_depth_video_toolbox_tpu.models import convert
from metric_depth_video_toolbox_tpu.models import svd as svd_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod
from metric_depth_video_toolbox_tpu.models import wan as wan_mod
from tests import torch_mirrors as tm


@pytest.fixture(autouse=True)
def _precise_matmul():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_vitl_block_production_dims():
    """One ViT-L transformer block at the flagship shape: embed 1024,
    16 heads, mlp 4096, and the REAL token count of the 518x924 depth
    input (37*66 patches + cls = 2443; the shipped path pads to 2560 —
    reference scale video_da3.py:274). float32 vs the torch DINOv2
    block mirror."""
    d, heads, n = 1024, 16, 2443
    torch.manual_seed(5)
    tb = tm.TBlock(d, heads).eval()
    g = torch.Generator().manual_seed(6)
    sd = {k: torch.randn(v.shape, generator=g) * (0.02 if v.ndim > 1
                                                  else 0.05)
          for k, v in tb.state_dict().items()}
    tb.load_state_dict(sd)

    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (1, n, d)).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).numpy()

    s = _sd(tb)
    params = {"params": {
        "norm1": {"scale": s["norm1.weight"], "bias": s["norm1.bias"]},
        "attn": {
            "qkv": {"kernel": s["attn.qkv.weight"].T,
                    "bias": s["attn.qkv.bias"]},
            "proj": {"kernel": s["attn.proj.weight"].T,
                     "bias": s["attn.proj.bias"]},
        },
        "ls1": {"gamma": s["ls1.gamma"]},
        "norm2": {"scale": s["norm2.weight"], "bias": s["norm2.bias"]},
        "mlp": {
            "fc1": {"kernel": s["mlp.fc1.weight"].T,
                    "bias": s["mlp.fc1.bias"]},
            "fc2": {"kernel": s["mlp.fc2.weight"].T,
                    "bias": s["mlp.fc2.bias"]},
        },
        "ls2": {"gamma": s["ls2.gamma"]},
    }}
    cfg = dataclasses.replace(vit_mod.VIT_L, depth=1, dtype="float32")
    out = vit_mod.Block(cfg).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    err = np.max(np.abs(np.asarray(out) - ref))
    assert err < 2e-4, err


def test_svd_unet_production_channel_stack():
    """The FULL SVD UNet at its production channel widths
    (320/640/1280/1280, heads 5/10/20/20, cross-attn 1024 — the
    diffusers SVD config the reference loads,
    stereo_crafter_infill.py:118-131) on a small latent grid. Spatial
    extent does not change the per-channel arithmetic; the channel/
    head/skip bookkeeping — where converter transposes and head splits
    live — runs at the real dims."""
    cfg = dataclasses.replace(svd_mod.SVDConfig(), dtype="float32")
    assert cfg.block_out_channels == (320, 640, 1280, 1280)
    torch.manual_seed(11)
    tmdl = None
    # local import of the torch mirror (same file the tiny test uses)
    from tests import test_weight_exact_svd as svd_tests
    tmdl = svd_tests.TSVDUNet(cfg).eval()

    rng = np.random.default_rng(12)
    f, hh, ww = 2, 16, 16
    x = rng.normal(0, 1, (f, cfg.in_channels, hh, ww)).astype(np.float32)
    ctx = rng.normal(0, 1, (1, 1, cfg.cross_attention_dim)).astype(
        np.float32)
    add_ids = np.array([6.0, 127.0, 0.02], np.float32)
    c_noise = np.float32(0.7)
    with torch.no_grad():
        ref = tmdl(torch.from_numpy(x), torch.tensor(c_noise),
                   torch.from_numpy(ctx),
                   torch.from_numpy(add_ids)).numpy()

    params = convert.convert_svd_unet(_sd(tmdl), cfg)
    out = svd_mod.SVDUNet(cfg).apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(c_noise), jnp.asarray(ctx), jnp.asarray(add_ids))
    err = np.max(np.abs(np.asarray(out).transpose(0, 3, 1, 2) - ref))
    assert err < 5e-4, err


def test_wan_dit_block_production_dims():
    """One Wan-1.3B DiT block at the real widths: dim 1536, ffn 8960,
    12 heads (head dim 128 — the 3D-rotary table size), umT5 context
    width 4096 (reference inspatio_world_infill.py's
    InSpatio-World-1.3B). float32, 1 layer, small token grid."""
    from tests import test_weight_exact_wan as wan_tests

    cfg = dataclasses.replace(
        wan_mod.WAN_1_3B, layers=1, dtype="float32",
        vae=wan_mod.WAN_TINY.vae)
    assert (cfg.dim, cfg.ffn_dim, cfg.heads,
            cfg.text_dim) == (1536, 8960, 12, 4096)
    # rebind the mirror module's globals to the production config; the
    # mirror classes read CFG/D/HEADS/HD/P at construction time
    old = (wan_tests.CFG, wan_tests.D, wan_tests.HEADS, wan_tests.HD,
           wan_tests.P)
    wan_tests.CFG, wan_tests.D, wan_tests.HEADS = cfg, cfg.dim, cfg.heads
    wan_tests.HD, wan_tests.P = cfg.dim // cfg.heads, cfg.patch_hw
    try:
        torch.manual_seed(21)
        tmdl = wan_tests.TWanDiT().eval()
        g = torch.Generator().manual_seed(22)
        sd = {k: torch.randn(v.shape, generator=g) * 0.02
              for k, v in tmdl.state_dict().items()}
        tmdl.load_state_dict(sd)

        rng = np.random.default_rng(23)
        t, lh, lw = 3, 8, 8
        x = rng.normal(0, 1, (1, t, lh, lw, cfg.z_ch)).astype(np.float32)
        cond = rng.normal(0, 1, (1, t, lh, lw, cfg.cond_ch)).astype(
            np.float32)
        ctx = rng.normal(0, 1, (1, cfg.n_prompt_tokens,
                                cfg.text_dim)).astype(np.float32)
        t_frames = np.array([[0.75, 0.75, 0.75]], np.float32)
        with torch.no_grad():
            ref = tmdl(torch.from_numpy(x), torch.from_numpy(t_frames),
                       torch.from_numpy(cond),
                       torch.from_numpy(ctx)).numpy()

        params = convert.convert_wan(_sd(tmdl), cfg)
        model = wan_mod.WanDiT(cfg)
        out = model.apply(params, jnp.asarray(x),
                          jnp.asarray(t_frames), jnp.asarray(cond),
                          jnp.asarray(ctx))
        err = np.max(np.abs(np.asarray(out) - ref))
        assert err < 5e-4, err
    finally:
        (wan_tests.CFG, wan_tests.D, wan_tests.HEADS, wan_tests.HD,
         wan_tests.P) = old
