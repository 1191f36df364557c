"""Diffusion-based SBS infill (StereoCrafter-class driver).

Orchestration parity with reference stereo_crafter_infill.py:
  - 25-frame chunks with 6-frame overlap where the first overlap frames
    are re-fed as already-infilled context (:242-257)
  - the left eye is processed mirrored (:116-124,152)
  - the model works at a fixed working resolution and the result is
    composited back only inside the mask (:147-169)
  - linear-histogram color match against the non-hole pixels (:138,145)
  - lower-edge halo blend: mark_lower_side -> dilate -> Gaussian alpha
    blend (:172-188)

The denoiser is ``models.diffusion.VideoInpainter``; with converted
StereoCrafter weights it reproduces the reference engine, with random
weights it exercises the identical compute/orchestration path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.models import diffusion as dif
from metric_depth_video_toolbox_tpu.ops import image as im
from metric_depth_video_toolbox_tpu.ops import infill as infill_ops
from metric_depth_video_toolbox_tpu.utils.host import robust_call


class DiffusionInfillEngine:
    def __init__(self, cfg=None, params=None, work_hw=(256, 256),
                 chunk=25, overlap=6, rng_seed=0,
                 mono_conditioning=False, data_parallel=True,
                 vae_cfg=None, clip_params=None, clip_cfg=None):
        self.cfg = cfg or dif.DIFFUSION_TINY
        self._clip = None
        if hasattr(self.cfg, "cross_attention_dim"):
            # SVDConfig -> the weight-exact StereoCrafter graph
            # (models.svd); converted SVD/StereoCrafter checkpoints
            # load via convert.convert_stereocrafter
            from metric_depth_video_toolbox_tpu.models import svd as svdm
            self.model = svdm.SVDInpainter(
                self.cfg, vae_cfg or svdm.SVDVAEConfig())
            if clip_params is not None:
                # CLIP image-embedding conditioning (the SVD pipeline's
                # cross-attention context; models.clip)
                from metric_depth_video_toolbox_tpu.models import clip \
                    as clip_mod
                tower = clip_mod.CLIPVisionTower(
                    clip_cfg or clip_mod.CLIP_VIT_H)
                self._clip = (tower, clip_params,
                              clip_cfg or clip_mod.CLIP_VIT_H)
        else:
            self.model = dif.VideoInpainter(self.cfg)
        self.work_hw = work_hw
        self.chunk = chunk
        self.overlap = overlap
        self.mono_conditioning = mono_conditioning
        self._params = params
        self._rng = jax.random.PRNGKey(rng_seed)
        # chunk-time-axis sharding over a 1D mesh: spatial UNet work is
        # pure DP over frames; the temporal attentions are the only
        # cross-device ops (the 225-frame inspatio preset needs this —
        # one chip cannot hold 225 latents of the production UNet)
        self._mesh = None
        if data_parallel and jax.device_count() > 1:
            from metric_depth_video_toolbox_tpu.parallel import mesh as mm
            n = jax.device_count()
            while chunk % n:
                n -= 1
            if n > 1:
                self._mesh = mm.frame_mesh(n)

    def _ensure(self):
        if self._params is None:
            f = jnp.zeros((self.chunk,) + self.work_hw + (3,))
            m = jnp.zeros((self.chunk,) + self.work_hw)
            mono = f if self.mono_conditioning else None
            self._params = jax.jit(
                lambda r, a, b: self.model.init(r, a, b, mono=mono)
            )(self._rng, f, m)

    def infill_chunk(self, frames_u8, hole_mask, mono_u8=None):
        """(T, H, W, 3) uint8 + (T, H, W) bool -> infilled uint8.
        ``mono_u8``: source-view conditioning frames (m2svid/inspatio
        style) when the engine was built with mono_conditioning.

        With a mesh, the chunk's time axis shards over devices and the
        temporal attention layers become the only cross-device ops."""
        self._ensure()
        if self._mesh is not None:
            from metric_depth_video_toolbox_tpu.parallel import sharding
            self._params = jax.device_put(
                self._params, sharding.replicated(self._mesh))
        t, h, w = frames_u8.shape[:3]
        wh, ww = self.work_hw
        use_mono = self.mono_conditioning
        if use_mono and mono_u8 is None:
            # param shapes include the mono-cond channels; a zero
            # conditioning keeps them static when no mono video is given
            mono_u8 = np.zeros_like(np.asarray(frames_u8))

        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        key = (t, h, w, use_mono)
        clip_p = self._clip[1] if self._clip is not None else None
        if key in cache:  # avoid per-chunk retrace of a fresh def
            self._rng, sub = jax.random.split(self._rng)
            return robust_call(
                cache[key], self._params, sub, self._put(frames_u8),
                self._put(hole_mask),
                self._put(mono_u8) if use_mono else None, clip_p)

        clip_bundle = self._clip

        @jax.jit
        def run(params, rng, f_u8, m, mono_in, clip_p):
            f = f_u8.astype(jnp.float32) / 255.0
            fw = jax.image.resize(f, (t, wh, ww, 3), "bilinear")
            mw = jax.image.resize(m.astype(jnp.float32), (t, wh, ww),
                                  "nearest")
            masked = fw * (1.0 - mw[..., None])
            cond_lat = self.model.apply(params, masked,
                                        method=self.model.encode)
            mlat = jax.image.resize(mw, cond_lat.shape[:3],
                                    "linear")[..., None]
            parts = [cond_lat, mlat]
            if mono_in is not None:
                mono_f = mono_in.astype(jnp.float32) / 255.0
                mono_w = jax.image.resize(mono_f, (t, wh, ww, 3),
                                          "bilinear")
                parts.append(self.model.apply(params, mono_w,
                                              method=self.model.encode))
            cond = jnp.concatenate(parts, axis=-1)
            ctx = None
            if clip_p is not None:
                from metric_depth_video_toolbox_tpu.models import clip \
                    as clip_mod
                tower, _, ccfg = clip_bundle
                # SVD conditions cross-attention on the CLIP embedding
                # of the conditioning frame (chunk frame 0)
                emb = tower.apply(clip_p, clip_mod.preprocess(
                    masked[:1], ccfg.image_size))
                ctx = emb[:, None, :]  # (1, 1, proj_dim)
            if ctx is not None:
                def denoise_fn(p, zz, s, c):
                    return self.model.apply(
                        p, zz, s, c, ctx, method=self.model.denoise)
            else:
                def denoise_fn(p, zz, s, c):
                    return self.model.apply(
                        p, zz, s, c, method=self.model.denoise)
            z = dif.sample(denoise_fn, params, rng, cond_lat.shape,
                           self.cfg, cond)
            out = self.model.apply(params, z, method=self.model.decode)
            out = jax.image.resize(out, (t, h, w, 3), "bilinear")
            # composite back only inside the mask + LHM color match
            outm = jax.vmap(
                lambda g, r, wt: infill_ops.lhm_color_transfer(
                    g, r, ref_weights=wt))(
                out * 255.0, f_u8.astype(jnp.float32),
                1.0 - m.astype(jnp.float32))
            comp = jnp.where(m[..., None], outm,
                             f_u8.astype(jnp.float32))
            return jnp.clip(comp, 0, 255).astype(jnp.uint8)

        cache[key] = run
        self._rng, sub = jax.random.split(self._rng)
        return robust_call(run, self._params, sub, self._put(frames_u8),
                           self._put(hole_mask),
                           self._put(mono_u8) if use_mono else None,
                           clip_p)

    def _put(self, arr):
        if self._mesh is None or arr is None:
            return jnp.asarray(arr) if arr is not None else None
        from metric_depth_video_toolbox_tpu.parallel import sharding
        a = jnp.asarray(arr)
        return jax.device_put(a, sharding.batch_sharding(self._mesh,
                                                         a.ndim))


class CausalInfillEngine:
    """InSpatio-World-class infill: Wan-rate causal video DiT over
    Wan-VAE latents (models.wan) — the reference's flagship engine run
    as its OWN architecture, not an SVD preset.

    Mirrors the reference conditioning scheme exactly
    (inspatio_world_infill.py):
      - render latent: holes blacked out of the warped frames (:431)
      - ref latent: the SOURCE video, encoded ONCE and shared between
        the left and right eye passes (:425-443) — here via a content-
        keyed cache across infill_chunk calls
      - mask latent: 4 temporal channels per latent frame (:316,
        convert_mask_video role; models.wan.mask_to_latent)
      - frame count padded so T_lat splits into causal blocks of 3
        (:225-236), block-causal few-step generation (:331-338)
    Same infill_chunk contract as DiffusionInfillEngine, so the chunked
    SBS driver below is shared.
    """

    def __init__(self, cfg=None, params=None, work_hw=(480, 832),
                 chunk=225, overlap=6, rng_seed=0,
                 mono_conditioning=True, data_parallel=True):
        from metric_depth_video_toolbox_tpu.models import wan as wan_mod
        self.wan = wan_mod
        self.cfg = cfg or wan_mod.WAN_1_3B
        self.model = wan_mod.WanDiT(self.cfg)
        self.enc = wan_mod.WanVAEEncoder(self.cfg.vae)
        self.dec = wan_mod.WanVAEDecoder(self.cfg.vae)
        self.work_hw = work_hw
        self.chunk = chunk
        self.overlap = overlap
        self.mono_conditioning = mono_conditioning
        self._params = params
        self._rng = jax.random.PRNGKey(rng_seed)
        self._ref_cache = (None, None)  # (key, ref_latent)
        self._run_cache = {}
        self._enc_run_cache = {}  # (t, tp) -> jitted ref encoder
        del data_parallel  # full-seq causal attention: single-chip v1

    def _t_pad(self, t):
        return self.wan.pad_to_valid_t(t, self.cfg.block_frames)

    def _ensure(self):
        if self._params is not None:
            if isinstance(self._params, dict) and "dit" in self._params:
                self._compact_params()
            return
        tp = self._t_pad(min(self.chunk, 5))
        wh, ww = self.work_hw
        f = jnp.zeros((1, tp, wh, ww, 3))
        r0, r1, r2 = jax.random.split(self._rng, 3)
        ep = jax.jit(self.enc.init)(r0, f)
        z = jax.eval_shape(lambda: self.enc.apply(ep, f))
        dp = jax.jit(self.dec.init)(r1, jnp.zeros(z.shape, jnp.float32))
        tl, lh, lw = z.shape[1:4]
        gp = jax.jit(self.model.init)(
            r2, jnp.zeros((1, tl, lh, lw, self.cfg.z_ch)),
            jnp.zeros((1, tl)),
            jnp.zeros((1, tl, lh, lw, self.cfg.cond_ch)), None)
        self._params = {"dit": gp, "enc": ep, "dec": dp}
        self._compact_params()

    def _compact_params(self):
        """bf16-store the 1.3B DiT weights in bf16 production mode:
        every matmul already casts to bf16, so storage precision only
        affects the few f32 embedding layers (sub-rounding), and the
        f32 tree's 5.2 GB of resident HBM was a third of the chip."""
        if self.cfg.dtype != "bfloat16" or self._params is None:
            return
        self._params["dit"] = jax.tree_util.tree_map(
            lambda a: (a.astype(jnp.bfloat16)
                       if hasattr(a, "dtype") and a.dtype == jnp.float32
                       else a), self._params["dit"])

    # frames per encode segment / latents per decode segment for the
    # streamed VAE: the full-video activations of the PRODUCTION chunk
    # (225 frames @ 480x832) are ~17 GB at the encoder stem — far past
    # one chip's HBM. Streaming is exact (models/wan.py stream methods,
    # tests/test_wan_stream.py) so it is simply always on; encode
    # segments must be x4 (temporal stride alignment) and tp = 4k-3
    # makes the ragged tail legal. Sizes chosen small: a segment's
    # full-res conv temps are ~0.3 GB/frame and several are live at
    # once, next to ~6 GB of resident f32 params (32-frame segments
    # measured a runtime HBM OOM on the 15.75 G chip).
    ENC_SEG = 8
    DEC_SEG = 2
    # latents per interleaved decode+composite segment: 2 latents =
    # 8 pixel frames of full-res decoder temps at a time (8-latent
    # segments measured a runtime OOM even with bf16 DiT params — the
    # decoder keeps ~5 full-res temps live per segment)
    DEC_SEG4 = 2

    def _vae_encode(self, x):
        """(1, T, wh, ww, 3) float device/host -> (1, T_lat, lh, lw,
        z) via segment-streamed encode (shape-keyed jits)."""
        t = x.shape[1]
        outs, cache, s = [], None, 0
        while s < t:
            ln = min(self.ENC_SEG, t - s)
            key = ("enc", ln, cache is None)
            run = self._enc_run_cache.get(key)
            if run is None:
                run = jax.jit(lambda p, seg, c: self.enc.apply(
                    p, seg, c, method="stream"))
                self._enc_run_cache[key] = run
            z, cache = run(self._params["enc"], x[:, s:s + ln], cache)
            jax.block_until_ready(z)  # serialize: queued segments'
            outs.append(z)            # peaks must not overlap in HBM
            s += ln
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

    def _vae_decode(self, z):
        """(1, T_lat, lh, lw, zc) -> (1, 4*T_lat-3, wh, ww, 3) via
        segment-streamed decode."""
        tl = z.shape[1]
        outs, cache, s = [], None, 0
        while s < tl:
            ln = min(self.DEC_SEG, tl - s)
            key = ("dec", ln, cache is None)
            run = self._enc_run_cache.get(key)
            if run is None:
                run = jax.jit(lambda p, seg, c: self.dec.apply(
                    p, seg, c, method="stream"))
                self._enc_run_cache[key] = run
            y, cache = run(self._params["dec"], z[:, s:s + ln], cache)
            jax.block_until_ready(y)  # see _vae_encode
            outs.append(y)
            s += ln
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

    def _encode_ref(self, mono_u8, tp):
        """Source latent, cached by content so the second eye's pass
        reuses the first's encode (reference shared_ref_latent)."""
        key = (mono_u8.shape,
               hash(np.ascontiguousarray(
                   mono_u8[::max(1, mono_u8.shape[0] // 4), ::16, ::16]
               ).tobytes()))
        if self._ref_cache[0] == key:
            return self._ref_cache[1]
        wh, ww = self.work_hw
        t = mono_u8.shape[0]

        # shape-keyed jit cache: a fresh @jax.jit closure per call would
        # recompile (~100 s remote-compile) on every new chunk
        prep = self._enc_run_cache.get(("ref_prep", t, tp))
        if prep is None:
            @jax.jit
            def prep(m_u8):
                m = m_u8.astype(jnp.float32) / 127.5 - 1.0
                m = jax.image.resize(m, (1, t, wh, ww, 3), "bilinear")
                m = jnp.concatenate(
                    [m, jnp.repeat(m[:, -1:], tp - t, axis=1)], axis=1) \
                    if tp > t else m
                return m
            self._enc_run_cache[("ref_prep", t, tp)] = prep
        ref = self._vae_encode(prep(jnp.asarray(mono_u8)[None]))
        jax.block_until_ready(ref)
        self._ref_cache = (key, ref)
        return ref

    def infill_chunk(self, frames_u8, hole_mask, mono_u8=None):
        """(T, H, W, 3) uint8 render + (T, H, W) bool holes ->
        infilled uint8 (composited into the holes, LHM color-matched
        like the reference's transfer_lhm_video_refmask :463-476)."""
        self._ensure()
        t, h, w = frames_u8.shape[:3]
        tp = self._t_pad(t)
        wh, ww = self.work_hw
        if mono_u8 is None:
            mono_u8 = np.zeros_like(np.asarray(frames_u8))
        ref = self._encode_ref(np.asarray(mono_u8), tp)
        tl = self.wan.latent_frames(tp)
        lh, lw = ref.shape[2], ref.shape[3]

        # three jitted stages with the streamed VAE between them: one
        # monolithic jit (prep+encode+sample+decode+composite) held the
        # full-video VAE activations live and cannot compile at the
        # production chunk (225x480x832)
        key = (t, h, w)
        stages = self._run_cache.get(key)
        if stages is None:
            cfg, model, wan_mod = self.cfg, self.model, self.wan

            @jax.jit
            def prep(f_u8, m):
                f = f_u8.astype(jnp.float32) / 127.5 - 1.0
                fw = jax.image.resize(f, (t, wh, ww, 3), "bilinear")
                mw = jax.image.resize(
                    m.astype(jnp.float32), (t, wh, ww), "nearest")
                # reference blacks holes out of the render (:431);
                # black = 0 u8 = -1 in [-1,1]
                fw = jnp.where(mw[..., None] > 0, -1.0, fw)
                if tp > t:
                    fw = jnp.concatenate(
                        [fw, jnp.repeat(fw[-1:], tp - t, axis=0)])
                    mw = jnp.concatenate(
                        [mw, jnp.repeat(mw[-1:], tp - t, axis=0)])
                return fw[None], mw

            @jax.jit
            def make_cond(render, ref_lat, mw):
                mlat = wan_mod.mask_to_latent(mw, tl, lh, lw)[None]
                return jnp.concatenate([render, ref_lat, mlat],
                                       axis=-1)

            step_fn = wan_mod.make_sample_step(
                lambda p, x, tf, c, ctx: model.apply(p, x, tf, c, ctx),
                cfg, 1, tl)

            def sample(params, rng, render, ref_lat, mw):
                # host loop of jitted steps — one giant scan program
                # is a ~20 min single execution at the production
                # chunk, which the tunnel watchdog kills
                return wan_mod.sample_causal(
                    None, params, rng, make_cond(render, ref_lat, mw),
                    cfg, step_fn=step_fn)

            def post(decoded_seg, f_u8, m):
                # per-frame math — segmented by the host loop below so
                # the full-chunk f32 temps (~1.4 GB each at production
                # dims) never coexist with the resident DiT params
                ln = f_u8.shape[0]
                out = (decoded_seg * 0.5 + 0.5) * 255.0
                out = jax.image.resize(out, (ln, h, w, 3), "bilinear")
                outm = jax.vmap(
                    lambda g, r, wt: infill_ops.lhm_color_transfer(
                        g, r, ref_weights=wt))(
                    out, f_u8.astype(jnp.float32),
                    1.0 - m.astype(jnp.float32))
                comp = jnp.where(m[..., None], outm,
                                 f_u8.astype(jnp.float32))
                return jnp.clip(comp, 0, 255).astype(jnp.uint8)

            stages = (prep, sample, jax.jit(post))
            self._run_cache[key] = stages

        prep, sample, post = stages
        self._rng, sub = jax.random.split(self._rng)
        f_dev = jnp.asarray(frames_u8)
        m_dev = jnp.asarray(hole_mask)
        fw, mw = prep(f_dev, m_dev)
        render = self._vae_encode(fw)
        del fw  # drop stage outputs eagerly: at the production chunk
        z = sample(self._params["dit"], sub, render, ref, mw)
        del render, mw  # each held ~1 GB through the next stage
        # decode + composite INTERLEAVED per latent segment: the full
        # decoded video never exists on device (a 1.08 GB contiguous
        # alloc in the post-sampler fragmented heap failed on the
        # second production chunk), and each u8 segment is fetched as
        # soon as it is composited
        out = np.empty((t, h, w, 3), np.uint8)
        tl_ = z.shape[1]
        cache, s_lat, s_pix = None, 0, 0
        while s_lat < tl_ and s_pix < t:
            ln_lat = min(self.DEC_SEG4, tl_ - s_lat)
            key_d = ("dec4", ln_lat, cache is None)
            run = self._enc_run_cache.get(key_d)
            if run is None:
                run = jax.jit(lambda p, seg, c: self.dec.apply(
                    p, seg, c, method="stream"))
                self._enc_run_cache[key_d] = run
            y, cache = run(self._params["dec"],
                           z[:, s_lat:s_lat + ln_lat], cache)
            ln_pix = min(y.shape[1], t - s_pix)
            out[s_pix:s_pix + ln_pix] = robust_call(
                post, y[0, :ln_pix], f_dev[s_pix:s_pix + ln_pix],
                m_dev[s_pix:s_pix + ln_pix])
            s_lat += ln_lat
            s_pix += ln_pix
        del z
        return out


def infill_sbs_video_diffusion(sbs_video, infill_mask_video, output=None,
                               color_video=None, engine=None,
                               max_frames=-1, chunk=25, overlap=6,
                               mirror_left=True, drift_correct=False,
                               apply_edge_blending=True,
                               **kw):
    """Chunked diffusion infill over an SBS video. ``drift_correct``
    applies the phase-correlation drift fix of the generated frames
    against the render conditioning (the InSpatio-class engine's
    stabilizer, reference inspatio_world_infill.py:55-196)."""
    eng = engine or DiffusionInfillEngine(chunk=chunk, overlap=overlap)
    output = output or (sbs_video + "_infilled.mkv")
    sv = vio.VideoReader(sbs_video, max_frames=max_frames)
    mv = vio.VideoReader(infill_mask_video)
    frames = sv.read_all()
    masks_rgb = mv.read_all()
    sv.close()
    mv.close()
    t = frames.shape[0]
    masks_rgb = masks_rgb[:t]
    hole = np.any(masks_rgb != 0, axis=-1)
    half = frames.shape[2] // 2

    # original mono video as extra conditioning (m2svid/inspatio
    # engines, reference m2svid_infill.py:89-98)
    mono = None
    if color_video and getattr(eng, "mono_conditioning", False):
        cvr = vio.VideoReader(color_video, max_frames=max_frames)
        mono = cvr.read_all()[:t]
        cvr.close()

    out_frames = frames.copy()
    for eye in ("left", "right"):
        if eye == "left":
            f, m = frames[:, :, :half], hole[:, :, :half]
        else:
            f, m = frames[:, :, half:], hole[:, :, half:]
        mono_eye = mono
        if eye == "left" and mirror_left:
            f = f[:, :, ::-1]
            m = m[:, :, ::-1]
            if mono_eye is not None:
                mono_eye = mono_eye[:, :, ::-1]
        result = np.empty_like(f)
        start = 0
        context = None
        while start < t:
            end = min(start + eng.chunk, t)
            idx = np.arange(start, start + eng.chunk)
            idx = np.clip(idx, 0, t - 1)
            cf = f[idx].copy()
            cm = m[idx].copy()
            if context is not None:
                n_ctx = min(eng.overlap // 2, context.shape[0])
                if n_ctx > 0:  # overlap < 2 carries no context frames
                    cf[:n_ctx] = context[-n_ctx:]
                    cm[:n_ctx] = False  # already infilled, as context
            filled = eng.infill_chunk(
                cf, cm, mono_u8=mono_eye[idx] if mono_eye is not None
                else None)
            if drift_correct:
                from metric_depth_video_toolbox_tpu.ops import drift as dr
                filled = dr.drift_correct_video(filled, cf)
            n_new = end - start
            result[start:end] = filled[:n_new]
            context = filled[:n_new]
            start += eng.chunk - eng.overlap if end < t else eng.chunk
        if eye == "left" and mirror_left:
            result = result[:, :, ::-1]
            out_frames[:, :, :half] = result
        elif eye == "left":
            out_frames[:, :, :half] = result
        else:
            out_frames[:, :, half:] = result

    # lower-edge halo blend per frame (device batch); always on for the
    # stereocrafter engine, flag-gated for m2svid (reference
    # m2svid_infill.py:470 --apply_edge_blending, default off there)
    if apply_edge_blending:
        @jax.jit
        def halo(frames_u8, masks_u8):
            def one(fr, mk):
                lower = infill_ops.mark_lower_side(mk)
                lm = im.dilate((lower[..., 2] == 255).astype(jnp.float32),
                               ksize=5)
                return infill_ops.blur_under_mask(fr, lm, ksize=7)
            return jax.vmap(one)(frames_u8, masks_u8)

        out_frames = robust_call(halo, jnp.asarray(out_frames),
                                 jnp.asarray(masks_rgb))
    vio.save_rgb_video(np.asarray(out_frames), output, sv.fps)
    return output


# Engine presets mirroring the reference infill zoo's working shapes
# (SURVEY.md §2.3): chunk/overlap/resolution and behavioral flags.
ENGINE_PRESETS = {
    # stereo_crafter_infill.py:220,97-99 — 25/6 chunks at 1024x768
    "stereocrafter": dict(chunk=25, overlap=6, work_hw=(768, 1024),
                          mirror_left=True, drift_correct=False),
    # m2svid_infill.py:215-219 — 512x512 frames, mono-video conditioning;
    # edge blending is opt-in there (m2svid_infill.py:470 default off)
    "m2svid": dict(chunk=25, overlap=6, work_hw=(512, 512),
                   mirror_left=True, drift_correct=False,
                   mono_conditioning=True, apply_edge_blending=False),
    # inspatio_world_infill.py:36-42 — 225/6 chunks at 480x832, shared
    # source latents + drift correction; edge blending opt-in (:503)
    "inspatio_world": dict(chunk=225, overlap=6, work_hw=(480, 832),
                           mirror_left=False, drift_correct=True,
                           mono_conditioning=True,
                           apply_edge_blending=False),
}


def make_engine(preset="stereocrafter", cfg=None, params=None, **overrides):
    """Build an infill engine + driver kwargs from a preset.

    ``inspatio_world`` (or any WanConfig cfg) builds the Wan-class
    causal DiT engine (CausalInfillEngine) — the reference's flagship
    infill as its own architecture; the other presets build the
    SVD-class DiffusionInfillEngine."""
    p = dict(ENGINE_PRESETS[preset])
    p.update(overrides)
    from metric_depth_video_toolbox_tpu.models import wan as wan_mod
    if preset == "inspatio_world" or isinstance(cfg, wan_mod.WanConfig):
        eng = CausalInfillEngine(
            cfg=cfg if isinstance(cfg, wan_mod.WanConfig) else None,
            params=params, work_hw=p.pop("work_hw"),
            chunk=p["chunk"], overlap=p["overlap"],
            mono_conditioning=p.pop("mono_conditioning", True))
        for k in ("vae_cfg", "clip_params", "clip_cfg"):
            p.pop(k, None)
        return eng, p
    eng = DiffusionInfillEngine(
        cfg=cfg, params=params, work_hw=p.pop("work_hw"),
        chunk=p["chunk"], overlap=p["overlap"],
        mono_conditioning=p.pop("mono_conditioning", False),
        vae_cfg=p.pop("vae_cfg", None),
        clip_params=p.pop("clip_params", None),
        clip_cfg=p.pop("clip_cfg", None))
    return eng, p


def infill_sbs_video_external(sbs_video, infill_mask_video, command,
                              output=None, color_video=None):
    """External infill engine hook: run a user-supplied command with the
    reference's CLI contract (the role of the author's private
    stereo_dissoclusion_net_infill.py wrapper). The command receives
    --sbs_color_video / --sbs_mask_video / --output and must write the
    infilled video to --output."""
    import subprocess
    output = output or (sbs_video + "_infilled.mkv")
    argv = list(command) + ["--sbs_color_video", sbs_video,
                            "--sbs_mask_video", infill_mask_video,
                            "--output", output]
    if color_video:
        argv += ["--color_video", color_video]
    res = subprocess.run(argv, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(
            f"external infill engine failed ({res.returncode}):\n"
            f"{res.stderr[-2000:]}")
    return output
