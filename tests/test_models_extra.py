"""Smoke tests for the remaining model families on tiny configs:
diffusion (VAE/UNet/sampler), RAFT flow, PromptDA, DA3 engine,
segmentation, CoTrackerLite."""

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import da3 as da3_mod
from metric_depth_video_toolbox_tpu.models import diffusion as dif
from metric_depth_video_toolbox_tpu.models import promptda
from metric_depth_video_toolbox_tpu.models import raft
from metric_depth_video_toolbox_tpu.models import segmentation as seg
from metric_depth_video_toolbox_tpu.models import tracker as trk


def test_vae_roundtrip_shapes():
    vae = dif.VAE(latent_channels=4, width=8, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), x)
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (2, 4, 4, 4)
    y = vae.apply(params, z, method=vae.decode)
    assert y.shape == (2, 32, 32, 3)
    out = np.asarray(y)
    assert (out >= 0).all() and (out <= 1).all()


def test_video_inpainter_sample_pipeline(rng):
    cfg = dif.DIFFUSION_TINY
    model = dif.VideoInpainter(cfg, vae_width=8)
    frames = jnp.asarray(rng.uniform(0, 1, (3, 32, 32, 3))
                         .astype(np.float32))
    mask = jnp.zeros((3, 32, 32)).at[:, 8:16, 8:16].set(1.0)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames, mask)
    cond_lat = model.apply(params, frames, method=model.encode)
    m = jax.image.resize(mask, cond_lat.shape[:3], "linear")[..., None]
    cond = jnp.concatenate([cond_lat, m], axis=-1)
    z = dif.sample(
        lambda p, zz, s, c: model.apply(p, zz, s, c, method=model.denoise),
        params, jax.random.PRNGKey(1), cond_lat.shape, cfg, cond)
    assert z.shape == cond_lat.shape
    out = model.apply(params, z, method=model.decode)
    assert out.shape == (3, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_edm_sigmas_monotone():
    s = np.asarray(dif.edm_sigmas(dif.DIFFUSION_TINY))
    assert s[0] > s[1] and s[-1] == 0.0


def test_raft_flow_shapes_and_visualization(rng):
    model = raft.RAFT(raft.RAFT_TINY)
    a = jnp.asarray(rng.integers(0, 255, (32, 48, 3)).astype(np.uint8))
    b = jnp.asarray(rng.integers(0, 255, (32, 48, 3)).astype(np.uint8))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), a, b)
    flow = model.apply(params, a, b)
    assert flow.shape == (32, 48, 2)
    rgb = raft.flow_to_rgb(flow)
    assert rgb.shape == (32, 48, 3) and rgb.dtype == jnp.uint8


def test_promptda_upscales_with_prompt(rng):
    cfg = promptda.PROMPT_TINY
    model = promptda.PromptDA(cfg)
    img = jnp.zeros((1, 28, 28, 3))
    prompt = jnp.asarray(rng.uniform(1, 10, (1, 7, 7)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, prompt)
    d = model.apply(params, img, prompt)
    assert d.shape == (1, 28, 28)
    dn = np.asarray(d)
    # sigmoid head denormalized to the prompt's own metric range
    pn = np.asarray(prompt)
    assert (dn >= pn.min() - 1e-5).all() and (dn <= pn.max() + 1e-5).all()


def test_da3_model_outputs(rng):
    model = da3_mod.DA3(da3_mod.DA3_TINY)
    frames = jnp.asarray(rng.uniform(0, 1, (3, 28, 28, 3))
                         .astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames)
    out = model.apply(params, frames)
    assert out["depth"].shape == (3, 28, 28)
    assert out["w2c"].shape == (3, 4, 4)
    fov = np.asarray(out["xfov_deg"])
    assert np.isfinite(fov).all() and ((fov > 0) & (fov < 180)).all()
    # w2c rotations are orthonormal (rotation-only Procrustes from rays)
    r = np.asarray(out["w2c"])[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", r, r)
    assert np.allclose(eye, np.eye(3)[None], atol=1e-4)
    # DA3 depth-ray head: raw 6ch world ray map (origin + direction)
    rays = np.asarray(out["rays"])
    assert rays.shape == (3, 28, 28, 6)
    assert np.isfinite(rays).all()


def test_da3_cameras_from_raymap_exact():
    """A synthetic ray map from a known camera must be recovered
    exactly: center, rotation, and focal/FOV (the DA3 depth-ray
    parameterization — cameras are solved, not predicted)."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    h = w = 16
    img_w = 64.0
    f_true = 48.0
    r_true = Rotation.from_euler("xyz", [10, -20, 5], degrees=True
                                 ).as_matrix().astype(np.float32)
    c_true = np.array([0.5, -1.0, 2.0], np.float32)
    sx = img_w / w
    uu = (np.arange(w) - (w - 1) / 2) * sx
    vv = (np.arange(h) - (h - 1) / 2) * sx
    g = np.stack(np.broadcast_arrays(uu[None, :] / f_true,
                                     vv[:, None] / f_true,
                                     np.float32(1.0)), axis=-1)
    g = g / np.linalg.norm(g, axis=-1, keepdims=True)
    d_world = np.einsum("ij,hwj->hwi", r_true, g)
    o_world = np.broadcast_to(c_true, (h, w, 3))
    rays = np.concatenate([o_world, d_world], axis=-1)[None]
    w2c, xfov = da3_mod.cameras_from_raymap(jnp.asarray(rays), img_w)
    w2c = np.asarray(w2c)[0]
    np.testing.assert_allclose(w2c[:3, :3], r_true.T, atol=1e-4)
    np.testing.assert_allclose(w2c[:3, 3], -r_true.T @ c_true, atol=1e-3)
    fov_true = 2 * np.degrees(np.arctan2(img_w / 2, f_true))
    np.testing.assert_allclose(np.asarray(xfov)[0], fov_true, atol=0.2)


def test_da3_production_default_is_vitl_class():
    """Reference default engine is DA3 nested-giant-large
    (video_da3.py:274); our engine must not default to a toy."""
    import metric_depth_video_toolbox_tpu.models.vit as vit_mod
    assert da3_mod.DA3_L.vit.embed_dim == vit_mod.VIT_L.embed_dim
    e = da3_mod.DA3Engine(params={"dummy": 0})  # no init at this size
    assert e.cfg is da3_mod.DA3_L
    assert da3_mod.preset("vitl") is da3_mod.DA3_L
    assert da3_mod.preset("vitt") is da3_mod.DA3_TINY


def test_da3_engine_windowed(rng):
    eng = da3_mod.DA3Engine(cfg=da3_mod.DA3_TINY, images_per_batch=4,
                            overlap=2, num_ref_frames=2, resolution=28)
    frames = rng.integers(0, 255, (7, 28, 28, 3)).astype(np.uint8)
    depth, c2w, fov = eng.infer_video(frames)
    assert depth.shape == (7, 28, 28)
    assert c2w.shape == (7, 4, 4)
    assert np.isfinite(depth).all() and np.isfinite(c2w).all()


def test_u2net_segmentation(rng):
    model = seg.U2Net(seg.SEG_TINY)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    p = model.apply(params, x)
    assert p.shape == (1, 32, 32)
    pn = np.asarray(p)
    assert (pn >= 0).all() and (pn <= 1).all()


def test_cotracker_lite_refines(rng):
    model = trk.CoTrackerLite(dim=16, window_radius=2, refine_iters=2)
    frames = jnp.asarray(rng.integers(0, 255, (3, 32, 32, 3))
                         .astype(np.uint8))
    queries = jnp.asarray([[16.0, 16.0], [8.0, 24.0]], jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames, queries)
    traj = model.apply(params, frames, queries)
    assert traj.shape == (3, 2, 2)
    assert np.isfinite(np.asarray(traj)).all()
