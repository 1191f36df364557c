"""Image filters and infill ops against small analytic cases."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import image as im
from metric_depth_video_toolbox_tpu.ops import infill


def test_gaussian_kernel_matches_cv2_semantics():
    k = np.asarray(im.gaussian_kernel_1d(5, 0.0))
    assert np.isclose(k.sum(), 1.0, atol=1e-6)
    assert k[2] == k.max() and np.allclose(k, k[::-1])


def test_gaussian_blur_preserves_constant():
    img = jnp.full((16, 16, 3), 100.0)
    out = np.asarray(im.gaussian_blur(img, 5))
    assert np.allclose(out[4:-4, 4:-4], 100.0, atol=1e-3)


def test_masked_blur_ignores_black(rng):
    img = np.full((20, 20, 3), 200.0, np.float32)
    img[8:12, 8:12] = 0.0  # black hole acts transparent
    out = np.asarray(im.masked_blur(jnp.asarray(img), ksize=5))
    # valid pixels adjacent to the hole must stay ~200 (no dark bleed)
    assert np.allclose(out[7, 7], 200.0, atol=1.0)
    # hole pixels stay black
    assert np.allclose(out[9, 9], 0.0)


def test_dilate_erode():
    m = np.zeros((11, 11), np.float32)
    m[5, 5] = 1.0
    d = np.asarray(im.dilate(jnp.asarray(m), 3))
    assert d[4:7, 4:7].all() and d.sum() == 9
    e = np.asarray(im.erode(jnp.asarray(d), 3))
    assert e[5, 5] == 1.0 and e.sum() == 1


def test_bilinear_sample_interpolates():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    xy = jnp.asarray([[1.5, 1.5], [0.0, 0.0], [-5.0, 0.0]], jnp.float32)
    out = np.asarray(im.bilinear_sample(img, xy))
    assert np.isclose(out[0, 0], (5 + 6 + 9 + 10) / 4)
    assert np.isclose(out[1, 0], 0.0)
    assert np.isclose(out[2, 0], 0.0)  # out of bounds -> fill


def test_inpaint_diffusion_fills_hole():
    img = np.full((16, 16, 3), 128.0, np.float32)
    hole = np.zeros((16, 16), bool)
    hole[6:10, 6:10] = True
    img[hole] = 0.0
    out = np.asarray(im.inpaint_diffusion(jnp.asarray(img),
                                          jnp.asarray(hole), iterations=8))
    assert np.allclose(out[hole], 128.0, atol=1.0)


def test_normal_march_infill_copies_across_hole():
    h, w = 16, 32
    color = np.zeros((h, w, 3), np.uint8)
    color[:, :10] = [255, 0, 0]   # left: red
    color[:, 20:] = [0, 0, 255]   # right: blue
    hole = np.zeros((h, w), bool)
    hole[:, 10:20] = True
    normals = np.zeros((h, w, 3), np.float32)
    normals[:, 10:20, 0] = 1.0  # march +x -> fill from the blue side
    out = np.asarray(infill.normal_march_infill(
        jnp.asarray(color), jnp.asarray(hole), jnp.asarray(normals)))
    assert (out[:, 10:20, 2] == 255).all()
    assert (out[:, :10, 0] == 255).all()  # untouched


def test_mark_lower_side_marks_far_edge():
    h, w = 16, 32
    nm = np.zeros((h, w, 3), np.uint8)
    # region cols 10..19 with normals pointing +x (encoded 255 = +1)
    nm[:, 10:20, 0] = 255
    nm[:, 10:20, 1] = 128
    out = np.asarray(infill.mark_lower_side(jnp.asarray(nm)))
    blue = (out[..., 2] == 255)
    ys, xs = np.where(blue)
    assert xs.size > 0
    assert (xs == 19).all()  # last in-region pixel on the +x side


def test_lhm_color_transfer_matches_stats(rng):
    gen = rng.normal(size=(32, 32, 3)).astype(np.float32) * 10 + 50
    ref = rng.normal(size=(32, 32, 3)).astype(np.float32) * 25 + 120
    out = np.asarray(infill.lhm_color_transfer(jnp.asarray(gen),
                                               jnp.asarray(ref)))
    assert np.allclose(out.reshape(-1, 3).mean(0),
                       ref.reshape(-1, 3).mean(0), atol=1.0)
    assert np.allclose(np.cov(out.reshape(-1, 3).T),
                       np.cov(ref.reshape(-1, 3).T), rtol=0.15, atol=2.0)


def test_blur_under_mask_smooths_only_masked(rng):
    img = rng.integers(0, 255, (24, 24, 3)).astype(np.float32)
    mask = np.zeros((24, 24), np.float32)
    mask[10:14, 10:14] = 1.0
    out = np.asarray(infill.blur_under_mask(jnp.asarray(img),
                                            jnp.asarray(mask), ksize=5))
    assert np.allclose(out[0:3, 0:3], img[0:3, 0:3], atol=1e-3)
    assert not np.allclose(out[11:13, 11:13], img[11:13, 11:13], atol=1e-3)


def test_infill_engine_presets_run(tmp_path, rng):
    """Named diffusion-infill presets (stereocrafter/m2svid/inspatio)
    drive the chunked SBS infill end-to-end at a tiny working size."""
    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.pipeline import infill_diffusion

    t, h, w = 4, 24, 64  # SBS: two 24x32 eyes
    frames = rng.integers(0, 255, (t, h, w, 3)).astype(np.uint8)
    masks = np.zeros((t, h, w, 3), np.uint8)
    masks[:, 8:16, 10:20] = 128
    sbs = str(tmp_path / "s.mkv")
    mk = str(tmp_path / "m.mkv")
    vio.save_rgb_video(frames, sbs, 24)
    vio.save_rgb_video(masks, mk, 24)

    from metric_depth_video_toolbox_tpu.models import wan as wan_mod
    from metric_depth_video_toolbox_tpu.pipeline.infill_diffusion \
        import CausalInfillEngine
    for preset in ("stereocrafter", "inspatio_world"):
        # inspatio_world runs its OWN architecture: the Wan-class
        # causal DiT (reference inspatio_world_infill.py), not SVD
        kw = ({"cfg": wan_mod.WAN_TINY, "work_hw": (32, 32)}
              if preset == "inspatio_world" else {"work_hw": (24, 32)})
        eng, drv = infill_diffusion.make_engine(
            preset, chunk=3, overlap=1, **kw)
        if preset == "inspatio_world":
            assert isinstance(eng, CausalInfillEngine)
        out = infill_diffusion.infill_sbs_video_diffusion(
            sbs, mk, output=str(tmp_path / f"{preset}.mkv"), engine=eng,
            mirror_left=drv["mirror_left"],
            drift_correct=drv["drift_correct"])
        n, ww, hh, _ = vio.video_info(out)
        assert (n, ww, hh) == (t, w, h)


def test_infill_mono_conditioning(tmp_path, rng):
    """m2svid-style engines condition on the original mono video; the
    conditioning latent changes the output inside the holes."""
    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.pipeline import infill_diffusion

    t, h, w = 3, 24, 64
    frames = rng.integers(0, 255, (t, h, w, 3)).astype(np.uint8)
    masks = np.zeros((t, h, w, 3), np.uint8)
    masks[:, 6:18, 40:56] = 128
    mono = rng.integers(0, 255, (t, h, w // 2, 3)).astype(np.uint8)
    sbs = str(tmp_path / "s.mkv")
    mk = str(tmp_path / "m.mkv")
    cv = str(tmp_path / "c.mkv")
    vio.save_rgb_video(frames, sbs, 24)
    vio.save_rgb_video(masks, mk, 24)
    vio.save_rgb_video(mono, cv, 24)

    eng, drv = infill_diffusion.make_engine(
        "m2svid", work_hw=(24, 32), chunk=3, overlap=1)
    assert eng.mono_conditioning
    out = infill_diffusion.infill_sbs_video_diffusion(
        sbs, mk, output=str(tmp_path / "o.mkv"), engine=eng,
        color_video=cv, mirror_left=drv["mirror_left"],
        drift_correct=drv["drift_correct"])
    n, ww, hh, _ = vio.video_info(out)
    assert (n, ww, hh) == (t, w, h)
