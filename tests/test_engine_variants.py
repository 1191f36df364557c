"""Single-frame engine variant behaviors (reference parity, SURVEY §2.2):

- unidepth: --xfov mandatory, K-conditioned (ray-embedding params exist)
- moge: NaN model output -> max_depth (reference moge_video.py:171)
- depthpro: model-estimated per-frame FOV (depthpro_video.py:154-159)
- unik3d: per-frame focal re-estimation from unprojected points
- movie step2: unknown per-scene Engine override warns + falls back
  (instead of silently rewriting), and single-frame scenes route through
  the two-pass FOV flow (reference movie_2_3D.py:326-328, 337-344)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.pipeline import depth as dstage


def _frames(rng, n=2, h=28, w=28):
    return rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8)


def _tiny(variant, **kw):
    return dstage.SingleFrameEngine(size="vitt", input_size=28,
                                    data_parallel=False, variant=variant,
                                    **kw)


def test_unidepth_requires_xfov():
    with pytest.raises(ValueError, match="xfov"):
        _tiny("unidepth")


def test_unidepth_k_conditioning_params(rng):
    eng = _tiny("unidepth", xfov=60.0)
    d = eng.infer_video(_frames(rng), batch=2)
    assert d.shape == (2, 28, 28)
    # the ray-embedding projection must exist in the param tree
    assert "ray_embed" in eng._params["params"]


def test_moge_nan_maps_to_max_depth(rng):
    eng = _tiny("moge", max_depth=50.0)
    # force the model output to NaN: the variant must clamp to max_depth
    real_apply = eng._apply

    def nan_apply(params, x, r=None):
        out = real_apply(params, x) if r is None else real_apply(
            params, x, r)
        d = out[0] if isinstance(out, tuple) else out
        d = jnp.full_like(d, jnp.nan)
        return (d, out[1]) if isinstance(out, tuple) else d
    eng._apply = nan_apply
    d = eng.infer_video(_frames(rng), batch=2)
    np.testing.assert_allclose(d, 50.0)


def test_moge_real_graph_dispatch(rng):
    """A converted MoGe checkpoint (convert_moge layout) switches the
    moge variant onto the real MoGeNet graph (models.moge), keeping the
    shared focal/z-shift solve and --xfov fixed-focal contract."""
    from metric_depth_video_toolbox_tpu.models import moge as moge_mod

    cfg = moge_mod.MOGE_TINY
    net = moge_mod.MoGeNet(cfg)
    params = jax.jit(net.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 28, 28, 3)))
    eng = _tiny("moge", params=params)
    assert isinstance(eng.model, moge_mod.MoGeNet)
    assert eng.estimates_fov
    d, fovs = eng.infer_video(_frames(rng), batch=2, return_fov=True)
    assert d.shape == (2, 28, 28) and np.isfinite(d).all()
    assert fovs is not None and np.isfinite(fovs).all()
    # --xfov pins the sidecar fovs (fixed-focal solve, moge_video.py:162)
    eng2 = _tiny("moge", params=params, xfov=55.0)
    assert isinstance(eng2.model, moge_mod.MoGeNet)
    d2, fovs2 = eng2.infer_video(_frames(rng), batch=2, return_fov=True)
    assert np.isfinite(d2).all()
    np.testing.assert_allclose(fovs2, 55.0)


def test_depthpro_estimates_fov(rng):
    eng = _tiny("depthpro")
    d, fovs = eng.infer_video(_frames(rng, n=3), batch=3, return_fov=True)
    assert d.shape == (3, 28, 28)
    assert fovs is not None and fovs.shape == (3,)
    assert (fovs > 20).all() and (fovs < 120).all()


def test_unik3d_reestimates_focal(rng):
    eng = _tiny("unik3d", xfov=60.0)
    assert eng.cfg.point_head  # direct metric point-map head
    d, fovs = eng.infer_video(_frames(rng, n=2), batch=2, return_fov=True)
    assert fovs is not None and fovs.shape == (2,)
    assert np.isfinite(fovs).all()


def test_unik3d_focal_comes_from_model_points(rng):
    """The per-frame FOV must be fit from the MODEL's predicted 3D
    points (reference unik3d_video.py:22-101), not recovered from its
    own unprojected depth (which would circularly return the nominal
    FOV): synthetic points for a 75-deg camera must yield ~75 even
    though the engine was given xfov=60."""
    import jax.numpy as jnp

    eng = _tiny("unik3d", xfov=60.0)
    eng.infer_video(_frames(rng), batch=2)  # init params + caches
    h = w = 28  # input_size=28 -> work_hw == frame size
    fx = (w / 2.0) / np.tan(np.radians(75.0) / 2.0)
    z = rng.uniform(3.0, 9.0, (h, w)).astype(np.float32)
    u = np.arange(w, dtype=np.float32)[None, :] - w / 2.0
    v = np.arange(h, dtype=np.float32)[:, None] - h / 2.0
    pts = np.stack([u * z / fx, v * z / fx, z], axis=-1).astype(np.float32)

    def fake_apply(params, x, r=None):
        b = x.shape[0]
        return (jnp.broadcast_to(jnp.asarray(pts), (b, h, w, 3)),
                jnp.full((b, h, w), 5.0))  # all-valid mask logits
    eng._apply = fake_apply
    eng._step_cache = {}
    d, fovs = eng.infer_video(_frames(rng), batch=2, return_fov=True)
    np.testing.assert_allclose(fovs, 75.0, atol=0.5)
    np.testing.assert_allclose(d[0], z, atol=1e-3)


def test_geometrycrafter_is_distinct_pointmap_engine(tmp_path, rng):
    """GeometryCrafter is its own engine (not a depthcrafter alias):
    prior depth -> point maps -> point-map-conditioned diffusion, Z
    channel out, median-rescaled to the prior."""
    from metric_depth_video_toolbox_tpu.models import diffusion as dif

    assert "geometrycrafter" in dstage.ENGINES
    assert dstage.ENGINES["geometrycrafter"] is not \
        dstage.ENGINES["depthcrafter"]

    eng = dstage.GeometryCrafterEngine(
        cfg=dif.DIFFUSION_TINY, window=4, overlap=1,
        work_hw=(32, 32), xfov=60.0, max_depth=100.0)
    frames = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    prior = rng.uniform(2.0, 10.0, (4, 32, 32)).astype(np.float32)
    depth = eng.infer_video(frames, prior)
    assert depth.shape == (4, 32, 32)
    assert np.isfinite(depth).all()
    # median-rescaled to the prior: medians agree
    assert abs(np.median(depth) / np.median(prior) - 1.0) < 0.2


def test_movie_step2_warns_on_unknown_engine(tmp_path, capsys, monkeypatch):
    from metric_depth_video_toolbox_tpu.pipeline import movie

    calls = []
    monkeypatch.setattr(movie.depth_stage, "run_batch",
                        lambda eng, vids, **kw: calls.append((eng, vids)))
    monkeypatch.setattr(movie, "_two_pass_single_frame",
                        lambda vids, variant, md, kw: calls.append(
                            ("two_pass:" + variant, vids)))
    scenes = [
        {"finished": False, "Scene Number": 1, "Engine": "bogus_engine",
         "depth_video_file": str(tmp_path / "no1.mkv"),
         "scene_video_file": str(tmp_path / "s1.mkv")},
        {"finished": False, "Scene Number": 2, "Engine": "moge",
         "depth_video_file": str(tmp_path / "no2.mkv"),
         "scene_video_file": str(tmp_path / "s2.mkv")},
    ]
    movie.step2_estimate_depth(scenes, engine="vda")
    out = capsys.readouterr().out
    assert "WARNING" in out and "bogus_engine" in out
    # unknown fell back to the movie default engine (vda)
    assert any(c[0] == "vda" for c in calls)
    # moge routed through the two-pass single-frame flow
    assert any(c[0] == "two_pass:moge" for c in calls)


def test_movie_two_pass_fov_lock(tmp_path):
    """Real two-pass run on a tiny clip: depth + locked xfovs sidecar."""
    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.io import sidecar
    from metric_depth_video_toolbox_tpu.pipeline import movie

    rng = np.random.default_rng(0)
    clip = str(tmp_path / "scene.mkv")
    vio.save_rgb_video(rng.integers(0, 255, (3, 28, 28, 3), np.uint8),
                       clip, 24)
    movie._two_pass_single_frame(
        [clip], "unik3d", 100.0,
        {"size": "vitt", "input_size": 28, "data_parallel": False})
    out = clip + "_depth.mkv"
    assert vio.is_valid_video(out)
    fovs = sidecar.load_xfovs(out + "_xfovs.json")
    fovs = np.asarray(fovs, np.float32)
    # locked: every frame carries the same (median) estimate
    assert np.allclose(fovs, fovs[0])


def test_diffusion_engines_dispatch_svd_graph(rng):
    """An SVDConfig selects the weight-exact SVD graph (DepthCrafter /
    GeometryCrafter are SVD fine-tunes) in both diffusion engines; the
    tiny stand-in stays the default (VERDICT r1 weak #7)."""
    from metric_depth_video_toolbox_tpu.models import svd as svdm
    from metric_depth_video_toolbox_tpu.models import diffusion as dif

    cfg = svdm.SVD_TINY
    vae = svdm.SVD_VAE_TINY
    dc = dstage.DepthCrafterEngine(cfg=cfg, vae_cfg=vae, window=2,
                                   overlap=1, work_hw=(32, 32))
    assert isinstance(dc.model, svdm.SVDInpainter)
    assert isinstance(dstage.DepthCrafterEngine().model, dif.VideoInpainter)

    frames = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    ref = rng.uniform(2.0, 10.0, (2, 32, 32)).astype(np.float32)
    depth = dc.infer_video(frames, ref)
    assert depth.shape == (2, 32, 32) and np.isfinite(depth).all()

    gc = dstage.GeometryCrafterEngine(cfg=cfg, vae_cfg=vae, window=2,
                                      overlap=1, work_hw=(32, 32),
                                      xfov=60.0)
    assert isinstance(gc.model, svdm.SVDInpainter)
    depth = gc.infer_video(frames, ref)
    assert depth.shape == (2, 32, 32) and np.isfinite(depth).all()


def test_depthcrafter_default_work_res_matches_reference():
    """Shipped default working resolution = the reference's working
    point: aspect-preserving, long side <= 768, x64-rounded (reference
    depthcrafter_video.py:52 --max_res 768) — NOT a fixed square
    (VERDICT r3 weak #6)."""
    eng = dstage.DepthCrafterEngine()
    assert eng.work_hw is None and eng.max_res == 768
    assert eng._resolve_work_hw(1080, 1920) == (448, 768)
    eng2 = dstage.DepthCrafterEngine()
    assert eng2._resolve_work_hw(1920, 1080) == (768, 448)
    eng3 = dstage.DepthCrafterEngine()  # small inputs are not upscaled
    assert eng3._resolve_work_hw(32, 32) == (64, 64)


def test_vda_low_res_transfer_matches_dense(monkeypatch):
    """The tunneled-runtime disparity fetch at working resolution +
    host bilinear upsample (models/video_depth.py transfer_hw) must
    reproduce the dense-path depth to float rounding — bilinear is
    linear, so resize-before-affine is exact; cv2 INTER_LINEAR matches
    jax.image.resize 'bilinear' to ~1e-5."""
    from metric_depth_video_toolbox_tpu.utils import host as host_mod

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 42, 56, 3)).astype(np.uint8)

    def build():
        return dstage.VDAEngine(size="vitt", input_size=28, window=4,
                                overlap=1, data_parallel=False,
                                metric_anchor_frames=2, rng_seed=3)

    dense = build().infer_video(frames)
    monkeypatch.setattr(host_mod, "tunneled_runtime", lambda: True)
    packed = build().infer_video(frames)
    assert packed.shape == dense.shape
    # depth is 1/(disp*s+t): tiny resize rounding diffs amplify near
    # disp ~ 0, so compare in inverse-depth space
    a, b = 1.0 / np.maximum(dense, 1e-3), 1.0 / np.maximum(packed, 1e-3)
    assert np.max(np.abs(a - b)) < 1e-3, np.max(np.abs(a - b))
