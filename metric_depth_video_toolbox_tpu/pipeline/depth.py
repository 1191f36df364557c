"""Depth estimation stage: color video -> RGB-encoded metric depth video.

The engine registry mirrors the reference's depth-engine zoo (SURVEY.md
§2.2). Every engine takes a color video path and writes
``<video>_depth.mkv`` through the shared codec, plus optional sidecars
(xfovs, transformations). Batch ``.txt`` list mode loads the model once
per movie (reference video_metric_convert.py:182-206).

Engines here run Flax models from ``models``; checkpoints come from
``models.convert`` (torch -> Flax). With random weights the plumbing and
throughput are identical, which is what the tests exercise.
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import sidecar
from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.models import depth_anything as da
from metric_depth_video_toolbox_tpu.models import video_depth as vd
from metric_depth_video_toolbox_tpu.ops import solvers
from metric_depth_video_toolbox_tpu.utils import host as host_mod
from metric_depth_video_toolbox_tpu.utils.host import robust_call, to_host


def _upsample_bilinear(frames, out_hw):
    """(T, h, w) float32 -> (T, out_h, out_w) via cv2 INTER_LINEAR —
    verified to match jax.image.resize 'bilinear' (both use half-pixel
    centers; upsampling applies no antialias) to float32 rounding, so
    moving the upsample host-side after a low-res fetch is behavior-
    preserving (tests/test_engine_variants.py)."""
    import cv2

    out = np.empty((frames.shape[0],) + tuple(out_hw), np.float32)
    for i in range(frames.shape[0]):
        cv2.resize(frames[i], (out_hw[1], out_hw[0]),
                   dst=out[i], interpolation=cv2.INTER_LINEAR)
    return out


def _downsample_bilinear(frames, out_hw):
    """(T, H, W) float32 -> (T, out_h, out_w), cv2 INTER_AREA-free
    plain bilinear to mirror jax.image.resize on the fit path."""
    import cv2

    out = np.empty((frames.shape[0],) + tuple(out_hw), np.float32)
    for i in range(frames.shape[0]):
        cv2.resize(frames[i], (out_hw[1], out_hw[0]),
                   dst=out[i], interpolation=cv2.INTER_LINEAR)
    return out


ENGINES: Dict[str, Callable] = {}


def register_engine(name):
    def deco(fn):
        ENGINES[name] = fn
        return fn
    return deco


def read_list_file(path):
    """.txt batch protocol: one video path per line, '#' comments
    (reference video_da3.py:27-34)."""
    items = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                items.append(line)
    return items


def expand_batch(path_or_txt):
    if isinstance(path_or_txt, str) and path_or_txt.lower().endswith(".txt"):
        return read_list_file(path_or_txt)
    return [path_or_txt]


class VDAEngine:
    """Video-Depth-Anything-class engine: temporally consistent relative
    video depth, re-metricized against a per-frame metric anchor model or a
    reference depth video (reference video_metric_convert.py:77-150).
    """

    def __init__(self, size="vits", input_size=518, window=None,
                 overlap=None, params=None, anchor_params=None, rng_seed=0,
                 metric_anchor_frames=32, max_depth=100.0, fp32=False,
                 data_parallel=True, quantize=None, rolling_average=0,
                 anchor_stride=4):
        import dataclasses

        import metric_depth_video_toolbox_tpu.models.dpt as dpt_mod
        window = window or vd.VideoDepthConfig.window
        if overlap is None:
            overlap = min(vd.VideoDepthConfig.overlap, max(window // 4, 1))
        vit_cfg = vd.vit_mod.PRESETS[size]
        dpt_cfg = dpt_mod.DPT_TINY if size == "vitt" else dpt_mod.DPTConfig()
        if fp32:  # reference --fp32: full-precision inference
            vit_cfg = dataclasses.replace(vit_cfg, dtype="float32")
            dpt_cfg = dataclasses.replace(dpt_cfg, dtype="float32")
        if quantize:  # --quantize int8: double-rate MXU path (ops/quant.py)
            vit_cfg = dataclasses.replace(vit_cfg, quant=quantize)
        self.cfg = vd.VideoDepthConfig(
            vit=vit_cfg, dpt=dpt_cfg,
            # upstream VDA ships 1 transformer block per motion module
            temporal_layers=1,
            temporal_heads=2 if size == "vitt" else 8,
            norm_groups=4 if size == "vitt" else 32,
            window=window, overlap=min(overlap, window - 1))
        self.model = vd.VideoDepthAnything(self.cfg)
        self.anchor_cfg = da.preset(size, metric=True, max_depth=20.0)
        self.anchor = da.DepthAnything(self.anchor_cfg)
        self.input_size = input_size
        self.metric_anchor_frames = metric_anchor_frames
        self.max_depth = max_depth
        # rolling-average affine->metric alignment (reference
        # docs/USAGE.md: the default the --no_rolling_average flag
        # turns off): 0 = first-N-frames fit (current reference code),
        # >0 = rolling window length in frames
        self.rolling_average = int(rolling_average or 0)
        self.anchor_stride = max(1, int(anchor_stride))
        self._params = params
        self._anchor_params = anchor_params
        self._rng = jax.random.PRNGKey(rng_seed)
        # stable fn identities so jitted wrappers don't retrace per call
        self._apply = self.model.apply
        self._anchor_apply = self.anchor.apply
        self._mesh = None
        if data_parallel and jax.device_count() > 1:
            from metric_depth_video_toolbox_tpu.parallel import mesh as mm
            # shard the window's time axis; window must divide evenly
            n = jax.device_count()
            while self.cfg.window % n:
                n -= 1
            if n > 1:
                self._mesh = mm.frame_mesh(n)

    def _ensure_params(self, work_hw):
        if self._params is None:
            x = jnp.zeros((self.cfg.window,) + tuple(work_hw) + (3,))
            self._params = jax.jit(self.model.init)(self._rng, x)
        if self._anchor_params is None:
            x = jnp.zeros((1,) + tuple(work_hw) + (3,))
            self._anchor_params = jax.jit(self.anchor.init)(self._rng, x)

    def infer_video(self, frames_u8, reference_depth=None):
        """(T, H, W, 3) uint8 -> (T, H, W) float32 metric depth."""
        t, h, w = frames_u8.shape[:3]
        work_hw = da.working_resolution(h, w, self.input_size,
                                        self.cfg.vit.patch_size)
        self._ensure_params(work_hw)
        # on the tunneled runtime fetch disparity at the model's native
        # working resolution (4.3x fewer bytes over a single-digit-MB/s
        # D2H link) and upsample on host: bilinear is linear, so doing
        # the resize before the affine re-metricization is exact; only
        # the reciprocal below must stay after the upsample
        tunneled = host_mod.tunneled_runtime()
        disp = vd.infer_video_depth(
            self._apply, self._params, frames_u8,
            work_hw, (h, w), window=self.cfg.window,
            overlap=self.cfg.overlap, mesh=self._mesh,
            transfer_hw=work_hw if tunneled else None,
            # 16-bit quantized tile-bitpack of the disparity fetch:
            # the dense f32 fetch (61 MB/window at ViT-L work res)
            # measured as THE vda-engine bottleneck on the tunnel
            pack_transfer=tunneled)
        # scale/shift fitting happens at the fetched resolution (the
        # fit is a per-pixel least squares; bilinear downsampling both
        # sides is statistically equivalent and avoids fetching the
        # anchor at full res over the tunnel), so keep the work-res
        # disparity and the matching anchor resolution around
        disp_fit = disp
        anchor_hw = disp.shape[1:3]
        if disp.shape[1:3] != (h, w):
            disp = _upsample_bilinear(disp, (h, w))

        if self.rolling_average > 0:
            # rolling-average alignment: metric anchors sampled along
            # the WHOLE video, per-anchor closed-form (s, t), linearly
            # interpolated + box-smoothed per frame (reference
            # docs/USAGE.md --no_rolling_average semantics)
            idx = np.arange(0, t, self.anchor_stride)
            if reference_depth is not None:
                anchor_depth = np.asarray(reference_depth)[idx]
                anchor_fit = (_downsample_bilinear(anchor_depth,
                                                   anchor_hw)
                              if anchor_depth.shape[1:3] != anchor_hw
                              else anchor_depth)
            else:
                chunks = []
                for i in range(0, len(idx), 16):
                    chunks.append(robust_call(
                        da.infer_depth, self._anchor_apply,
                        self._anchor_params,
                        jnp.asarray(frames_u8[idx[i:i + 16]]),
                        anchor_hw, work_hw))
                anchor_fit = np.concatenate(chunks, axis=0)
            s_t, t_t = solvers.rolling_scale_shift(
                disp_fit[idx], 1.0 / np.maximum(anchor_fit, 1e-3), idx,
                t, window=self.rolling_average)
            inv = disp * s_t[:, None, None] + t_t[:, None, None]
            depth = 1.0 / np.maximum(inv, 1e-6)
            depth[inv <= 0] = self.max_depth
            return np.clip(depth, 0.0, self.max_depth).astype(np.float32)

        # metric anchor on the first N frames (reference :105-125)
        n_anchor = min(self.metric_anchor_frames, t)
        if reference_depth is not None:
            anchor_depth = np.asarray(reference_depth[:n_anchor])
            anchor_fit = (_downsample_bilinear(anchor_depth, anchor_hw)
                          if anchor_depth.shape[1:3] != anchor_hw
                          else anchor_depth)
        else:
            anchor_fit = robust_call(
                da.infer_depth, self._anchor_apply,
                self._anchor_params, jnp.asarray(frames_u8[:n_anchor]),
                anchor_hw, work_hw)
        s, sh = to_host(jax.jit(solvers.scale_and_shift)(
            jnp.asarray(disp_fit[:n_anchor]),
            1.0 / jnp.maximum(jnp.asarray(anchor_fit), 1e-3)))
        inv = disp * float(s) + float(sh)
        depth = 1.0 / np.maximum(inv, 1e-6)
        # negative/invalid inverse depth -> clamp to max (reference :139-142)
        depth[inv <= 0] = self.max_depth
        return np.clip(depth, 0.0, self.max_depth).astype(np.float32)


@register_engine("vda")
def run_vda(color_video, max_depth=100.0, max_frames=-1, engine=None,
            reference_depth_video=None, target_fps=-1, **kw):
    """video_metric_convert.py equivalent."""
    eng = engine or VDAEngine(max_depth=max_depth, **kw)
    frames, fps = vio.read_video_frames(color_video, max_frames=max_frames,
                                        target_fps=target_fps)
    ref = None
    if reference_depth_video:
        r = vio.DepthVideoReader(reference_depth_video, max_depth)
        ref = r.read_depth_batch(frames.shape[0])
        r.close()
    depth = eng.infer_video(frames, reference_depth=ref)
    out = color_video + "_depth.mkv"
    vio.save_depth_video(depth, out, fps, max_depth)
    return out


class SingleFrameEngine:
    """Per-frame metric depth engines (UniDepth/UniK3D/MoGe/DepthPro-class
    wrappers, reference unidepth_video.py etc.): batched frame inference
    with the per-engine distinguishing behaviors:

      variant='unidepth'  K-conditioned inference (ray embeddings from
                          the user FOV; reference unidepth_video.py:70-74
                          requires --xfov and passes K into the model)
      variant='unik3d'    per-frame focal re-estimated from the
                          unprojected 3D points (unik3d_video.py:22-101)
      variant='moge'      the MoGe mechanism: affine-invariant point-map
                          head (xyz + mask) with per-frame focal/z-shift
                          recovery (ops.geometry.recover_focal_shift ==
                          the upstream infer()'s solve behind
                          output['intrinsics']/['depth']); masked sky ->
                          NaN -> max_depth (moge_video.py:164-173);
                          --xfov fixes the focal (fov_x argument) and
                          adds camera-ray conditioning
      variant='depthpro'  focal head: the model itself estimates
                          per-frame xfov (depthpro_video.py:154-159)
      variant='da'        plain DA-class metric inference (default)

    With ``data_parallel=True`` (default) and more than one device the
    frame batch shards over a 1D 'data' mesh (params replicated) — the
    scene's time axis is the natural DP axis (SURVEY.md §2.5); on one
    chip the same program runs unchanged."""

    def __init__(self, size="vits", input_size=518, params=None,
                 max_depth=100.0, estimates_fov=False, rng_seed=0,
                 data_parallel=True, variant="da", xfov=None, yfov=None,
                 depthpro_cfg=None, quantize=None, moge_cfg=None,
                 unidepth_cfg=None):
        self.variant = variant
        self.xfov = xfov
        self.yfov = yfov
        if variant == "unidepth" and xfov is None:
            raise ValueError("unidepth engine requires --xfov (reference "
                             "unidepth_video.py makes FOV mandatory)")
        import dataclasses as _dc
        # a converted apple/DepthPro-hf checkpoint switches the depthpro
        # variant onto the real multi-scale DepthPro graph
        # (models.depthpro, weight-exact); without one the DA-class
        # stand-in with a focal head below keeps the contract
        self._depthpro_cfg = None
        self._moge_cfg = None
        self._unidepth_cfg = None
        if (variant == "depthpro" and params is not None
                and "patch_encoder" in params.get("params", {})):
            from metric_depth_video_toolbox_tpu.models import depthpro \
                as dp_mod
            self._depthpro_cfg = depthpro_cfg or (
                dp_mod.DEPTHPRO_TINY if size in ("vitt", "tiny")
                else dp_mod.DEPTHPRO_L)
            if quantize:  # int8 backbone matmuls (ops/quant.py)
                self._depthpro_cfg = _dc.replace(
                    self._depthpro_cfg,
                    vit=_dc.replace(self._depthpro_cfg.vit,
                                    quant=quantize))
            self.cfg = da.preset(size, metric=True, max_depth=max_depth)
            self.model = dp_mod.DepthProNet(self._depthpro_cfg)
            estimates_fov = True
        elif (variant == "moge" and params is not None
                and "upsample0" in params.get("params", {}).get("head",
                                                                {})):
            # a converted Ruicheng/moge checkpoint (convert_moge)
            # switches onto the real MoGe graph (models.moge,
            # weight-exact); the focal/z-shift solve and NaN-sky
            # contract below are shared with the stand-in. Upstream
            # MoGe does not K-condition the net — fov_x only fixes the
            # focal in the solve (moge_video.py:162), so k_condition
            # stays off and --xfov flows through fixed_f.
            from metric_depth_video_toolbox_tpu.models import moge \
                as moge_mod
            self._moge_cfg = moge_cfg or (
                moge_mod.MOGE_TINY if size in ("vitt", "tiny")
                else moge_mod.MOGE_L)
            if quantize:
                self._moge_cfg = _dc.replace(
                    self._moge_cfg,
                    vit=_dc.replace(self._moge_cfg.vit, quant=quantize))
            self.cfg = da.preset(size, metric=True, max_depth=max_depth)
            self.cfg = _dc.replace(
                self.cfg, point_head=True,
                dpt=_dc.replace(self.cfg.dpt, n_out=4, head_act="none"))
            self.model = moge_mod.MoGeNet(self._moge_cfg)
        elif (variant == "unidepth" and params is not None
                and "camera" in params.get("params", {})):
            # a converted lpiccinelli/unidepth-v2 checkpoint switches
            # onto the real UniDepth-V2-class graph (models.unidepth,
            # weight-exact): camera head + SH ray conditioning in the
            # depth module. The mandatory --xfov provides the given-K
            # rays, the upstream infer(rgb, K) path
            # (unidepth_video.py:70-74).
            from metric_depth_video_toolbox_tpu.models import unidepth \
                as ud_mod
            self._unidepth_cfg = unidepth_cfg or (
                ud_mod.UNIDEPTH_TINY if size in ("vitt", "tiny")
                else ud_mod.UNIDEPTH_L)
            if quantize:
                self._unidepth_cfg = _dc.replace(
                    self._unidepth_cfg,
                    vit=_dc.replace(self._unidepth_cfg.vit,
                                    quant=quantize))
            self.cfg = da.preset(size, metric=True, max_depth=max_depth)
            self.model = ud_mod.UniDepthNet(self._unidepth_cfg)
        elif (variant == "unik3d" and params is not None
                and "angular" in params.get("params", {})):
            # a converted lpiccinelli/unik3d checkpoint switches onto
            # the real UniK3D-class graph (models.unidepth.UniK3DNet,
            # weight-exact): dense angular field x radial distance ->
            # metric points. Output honors the engine's point-head
            # contract, so the per-frame focal refit below
            # (unik3d_video.py:22-101) applies unchanged.
            from metric_depth_video_toolbox_tpu.models import unidepth \
                as ud_mod
            ucfg = unidepth_cfg or (
                ud_mod.UNIDEPTH_TINY if size in ("vitt", "tiny")
                else ud_mod.UNIDEPTH_L)
            if quantize:
                ucfg = _dc.replace(
                    ucfg, vit=_dc.replace(ucfg.vit, quant=quantize))
            self.cfg = da.preset(size, metric=True, max_depth=max_depth)
            self.cfg = _dc.replace(self.cfg, point_head=True)
            self.model = ud_mod.UniK3DNet(ucfg)
        else:
            self.cfg = da.preset(size, metric=True, max_depth=max_depth)
            if variant == "unidepth" or (variant == "moge" and xfov):
                self.cfg = _dc.replace(self.cfg, k_condition=True)
            if variant in ("moge", "unik3d"):
                # point-map heads. moge = the MoGe mechanism: affine-
                # invariant points + mask; focal/z-shift recovered by
                # ops.geometry.recover_focal_shift (the reference's
                # output['intrinsics']/['depth']/['mask'] contract,
                # moge_video.py:164-173, incl. NaN sky). unik3d = direct
                # metric points; per-frame focal refit from the MODEL's
                # predicted geometry (unik3d_video.py:22-101) — focal
                # from the model's own depth would be circular.
                self.cfg = _dc.replace(
                    self.cfg, point_head=True,
                    dpt=_dc.replace(self.cfg.dpt, n_out=4,
                                    head_act="none"))
            if variant == "depthpro" and not xfov:
                self.cfg = _dc.replace(self.cfg, fov_head=True)
            if quantize:  # int8 backbone matmuls (ops/quant.py)
                self.cfg = _dc.replace(
                    self.cfg,
                    vit=_dc.replace(self.cfg.vit, quant=quantize))
            self.model = da.DepthAnything(self.cfg)
        self.input_size = input_size
        self.max_depth = max_depth
        self.estimates_fov = estimates_fov or self.cfg.fov_head \
            or self.cfg.point_head or variant == "unik3d"
        self._params = params
        self._rng = jax.random.PRNGKey(rng_seed)
        self._apply = self.model.apply
        self._mesh = None
        if data_parallel and jax.device_count() > 1:
            from metric_depth_video_toolbox_tpu.parallel import mesh as mm
            self._mesh = mm.frame_mesh()

    def _depthpro_step(self, h, w):
        """Real DepthPro device step: square working size, HF-processor
        normalization (mean=std=0.5), canonical inverse depth scaled by
        2*tan(fov/2) then inverted (the HF post_process_depth_estimation
        recipe the reference consumes via focallength_px,
        depthpro_video.py:154-159)."""
        from metric_depth_video_toolbox_tpu.models import depthpro as dp
        cfg = self._depthpro_cfg
        apply_fn = self._apply
        max_depth = self.max_depth
        s = dp.working_size(cfg)

        @jax.jit
        def step(params, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            x = jax.image.resize(x, (x.shape[0], s, s, 3), "bilinear",
                                 antialias=False)
            x = (x - 0.5) / 0.5
            inv, fov = apply_fn(params, x)
            if fov is not None:
                inv = inv * (2.0 * jnp.tan(
                    jnp.radians(fov) * 0.5))[:, None, None]
            d = jax.image.resize(inv, (inv.shape[0], h, w), "bilinear")
            d = 1.0 / jnp.clip(d, 1e-4, 1e4)
            return jnp.minimum(d, max_depth), fov
        return step

    def _unidepth_step(self, h, w, work_hw):
        """Real UniDepth-V2 device step: given-K rays from the mandatory
        user FOV condition the depth module (the upstream infer(rgb, K)
        path, unidepth_video.py:70-74); metric depth out."""
        cfg = self._unidepth_cfg
        apply_fn = self._apply
        max_depth = self.max_depth
        patch = cfg.vit.patch_size
        gh, gw = work_hw[0] // patch, work_hw[1] // patch
        rays = jnp.asarray(da.patch_center_rays(self.xfov, gh, gw,
                                                self.yfov))
        xfov = float(self.xfov)

        @jax.jit
        def step(params, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            x = jax.image.resize(
                x, (x.shape[0], work_hw[0], work_hw[1], 3), "bilinear")
            r = jnp.broadcast_to(rays, (x.shape[0], gh, gw, 3))
            d, _conf, _cam4 = apply_fn(params, x, r)
            d = jnp.clip(d, 0.0, max_depth)
            d = jax.image.resize(d, (d.shape[0], h, w), "bilinear")
            return d, jnp.full((d.shape[0],), xfov, jnp.float32)
        return step

    def _step_fn(self, h, w, work_hw):
        """Variant-specific fused device step (shape-keyed by caller)."""
        if self._depthpro_cfg is not None:
            return self._depthpro_step(h, w)
        if self._unidepth_cfg is not None:
            return self._unidepth_step(h, w, work_hw)
        from metric_depth_video_toolbox_tpu.ops import geometry as geo
        cfg = self.cfg
        apply_fn = self._apply
        variant = self.variant
        max_depth = self.max_depth
        patch = cfg.vit.patch_size
        gh, gw = work_hw[0] // patch, work_hw[1] // patch
        rays = None
        if cfg.k_condition and self.xfov is not None:
            rays = jnp.asarray(da.patch_center_rays(
                self.xfov, gh, gw, self.yfov))
        # fixed normalized focal for shift-only point-map recovery
        # (computed host-side: jnp math inside the traced step would
        # stage to a tracer and can't be a static argument)
        fixed_f = None
        if cfg.point_head and self.xfov:
            import math
            fixed_f = (work_hw[1] / work_hw[0]
                       / math.tan(math.radians(self.xfov) / 2.0))

        @jax.jit
        def step(params, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            x = jax.image.resize(
                x, (x.shape[0], work_hw[0], work_hw[1], 3), "bilinear")
            r = (jnp.broadcast_to(rays, (x.shape[0], gh, gw, 3))
                 if rays is not None else None)
            out = apply_fn(params, x, r) if (cfg.k_condition or
                                             cfg.fov_head) \
                else apply_fn(params, x)
            if cfg.point_head and variant == "moge":
                # MoGe mechanism: recover per-frame focal + z-shift from
                # the affine point map (fixed focal when --xfov given,
                # like the reference's fov_x argument); depth = z+shift,
                # masked (sky) pixels -> NaN like the upstream model
                pts, mlogit = out
                fs, ts, _ = jax.vmap(
                    lambda p, wt: geo.recover_focal_shift(
                        p, wt, focal=fixed_f))(
                    pts, jax.nn.sigmoid(mlogit))
                d = pts[..., 2] + ts[:, None, None]
                d = jnp.where(mlogit > 0, d, jnp.nan)
                xf = (jnp.full(fs.shape, self.xfov, jnp.float32)
                      if self.xfov else
                      geo.xfov_from_normalized_focal(
                          fs, work_hw[0], work_hw[1]))
                # NaN-sky -> max_depth (reference moge_video.py:171)
                d = jnp.where(jnp.isfinite(d), d, max_depth)
                d = jnp.clip(d, 0.0, max_depth)
            elif cfg.point_head:  # unik3d: direct metric point map
                # per-frame focal refit from the MODEL's predicted
                # geometry (unik3d_video.py:22-101) — fitting against
                # the model's own unprojected depth would be circular
                pts, mlogit = out
                wts = jax.nn.sigmoid(mlogit)
                wh, ww = work_hw
                fx, _ = jax.vmap(
                    lambda p, wt: geo.estimate_focal_from_points(
                        p, wh, ww, weights=wt))(pts, wts)
                xf = jnp.degrees(2.0 * jnp.arctan2(
                    ww / 2.0, jnp.abs(fx) + 1e-6))
                d = jnp.clip(pts[..., 2], 0.0, max_depth)
            elif cfg.fov_head:
                d, xf = out
            else:
                d, xf = out, None
            d = jax.image.resize(d, (d.shape[0], h, w), "bilinear")
            return d, xf
        return step

    def infer_video(self, frames_u8, batch=16, return_fov=False):
        t, h, w = frames_u8.shape[:3]
        work_hw = da.working_resolution(h, w, self.input_size,
                                        self.cfg.vit.patch_size)
        if self._mesh is not None:
            n_dev = self._mesh.devices.size
            batch = max(batch, n_dev) // n_dev * n_dev
        if self._params is None:
            x = jnp.zeros((batch,) + tuple(work_hw) + (3,))
            gh = work_hw[0] // self.cfg.vit.patch_size
            gw = work_hw[1] // self.cfg.vit.patch_size
            if self.cfg.k_condition or self.cfg.fov_head:
                self._params = jax.jit(self.model.init)(
                    self._rng, x, jnp.zeros((batch, gh, gw, 3)))
            else:
                self._params = jax.jit(self.model.init)(self._rng, x)
        put = lambda c: jnp.asarray(c)
        if self._mesh is not None:
            from metric_depth_video_toolbox_tpu.parallel import sharding
            self._params = jax.device_put(self._params,
                                          sharding.replicated(self._mesh))
            put = lambda c: jax.device_put(
                jnp.asarray(c), sharding.batch_sharding(self._mesh))

        cache = getattr(self, "_step_cache", None)
        if cache is None:
            cache = self._step_cache = {}
        key = (h, w, work_hw)
        if key not in cache:
            cache[key] = self._step_fn(h, w, work_hw)
        step = cache[key]

        outs, fovs = [], []
        for i in range(0, t, batch):
            chunk = frames_u8[i:i + batch]
            n = chunk.shape[0]
            if n < batch:
                chunk = np.pad(chunk, ((0, batch - n), (0, 0), (0, 0),
                                       (0, 0)), mode="edge")
            d, xf = robust_call(step, self._params, put(chunk))
            outs.append(d[:n])
            if xf is not None:
                fovs.append(np.asarray(xf)[:n])
        depth = np.concatenate(outs, axis=0)
        if return_fov:
            return depth, (np.concatenate(fovs) if fovs else None)
        return depth


@register_engine("single_frame")
def run_single_frame(color_video, max_depth=100.0, max_frames=-1,
                     engine=None, xfov=None, save_xfovs=False,
                     target_fps=-1, **kw):
    eng = engine or SingleFrameEngine(max_depth=max_depth, xfov=xfov, **kw)
    frames, fps = vio.read_video_frames(color_video, max_frames=max_frames,
                                        target_fps=target_fps)
    depth, est_fovs = eng.infer_video(frames, return_fov=True)
    out = color_video + "_depth.mkv"
    vio.save_depth_video(depth, out, fps, max_depth)
    if save_xfovs:
        if est_fovs is not None:  # model/point-estimated per-frame FOV
            sidecar.save_xfovs(out + "_xfovs.json",
                               np.asarray(est_fovs, np.float32))
        else:
            xf = xfov if xfov is not None else 50.0
            sidecar.save_xfovs(out + "_xfovs.json",
                               np.full(frames.shape[0], xf, np.float32))
    return out


# kwargs consumed by the runner functions; everything else goes to the
# engine constructor.
_RUN_KEYS = ("max_depth", "max_frames", "reference_depth_video", "xfov",
             "yfov", "save_xfovs", "transformation_file", "target_fps")

_ENGINE_CLASSES = {"vda": VDAEngine, "single_frame": SingleFrameEngine}


def run_batch(engine_name, videos_or_txt, **kw):
    """Batch mode: model loads once, runs over every listed video
    (reference movie_2_3D.py:311-384 batching)."""
    fn = ENGINES[engine_name]
    run_kw = {k: v for k, v in kw.items() if k in _RUN_KEYS}
    eng_kw = {k: v for k, v in kw.items() if k not in _RUN_KEYS}
    if "max_depth" in kw:
        eng_kw["max_depth"] = kw["max_depth"]
    if engine_name in ("single_frame", "da3"):
        # the engine itself needs the FOV for K-conditioning / focal
        # re-estimation (variant behaviors; DA3 ray conditioning,
        # reference video_da3.py:87-112)
        for k in ("xfov", "yfov"):
            if kw.get(k) is not None:
                eng_kw[k] = kw[k]
    if engine_name == "geometrycrafter" and kw.get("xfov") is not None:
        eng_kw["xfov"] = kw["xfov"]  # point-map unprojection FOV
    outs = []
    eng = None
    for v in expand_batch(videos_or_txt):
        out_path = v + "_depth.mkv"
        if vio.is_valid_video(out_path):  # resume-by-existence
            outs.append(out_path)
            continue
        if eng is None:
            eng = _ENGINE_CLASSES[engine_name](**eng_kw)
        outs.append(fn(v, engine=eng, **run_kw))
    return outs


class DA3PipelineEngine:
    """DA3-class engine wrapper: depth + transformations + xfovs sidecars
    (reference video_da3.py:243-263)."""

    def __init__(self, max_depth=100.0, size=None, input_size=None,
                 quantize=None, **kw):
        import dataclasses
        from metric_depth_video_toolbox_tpu.models import da3 as da3_mod
        # generic engine kwargs (movie step2 passes them to every
        # engine): size maps onto the DA3 config preset (production
        # default VIT_L-class, reference video_da3.py:274), input_size
        # onto the working resolution
        if size == "tiny":
            size = "vitt"
        if size is not None:
            kw.setdefault("cfg", da3_mod.preset(size))
        if quantize:  # int8 backbone matmuls (ops/quant.py)
            cfg = kw.get("cfg") or da3_mod.preset("vitl")
            kw["cfg"] = dataclasses.replace(
                cfg, vit=dataclasses.replace(cfg.vit, quant=quantize))
        if input_size is not None:
            kw.setdefault("resolution", input_size)
        self.engine = da3_mod.DA3Engine(**kw)
        self.max_depth = max_depth


@register_engine("da3")
def run_da3(color_video, max_depth=100.0, max_frames=-1, engine=None, **kw):
    eng = engine or DA3PipelineEngine(max_depth=max_depth, **kw)
    frames, fps = vio.read_video_frames(color_video, max_frames=max_frames)
    depth, c2w, xfovs = eng.engine.infer_video(frames)
    out = color_video + "_depth.mkv"
    vio.save_depth_video(np.clip(depth, 0, max_depth), out, fps, max_depth)
    sidecar.save_xfovs(out + "_xfovs.json", xfovs)
    sidecar.save_transformations(out + "_transformations.json", c2w)
    return out


def _build_denoiser(cfg, vae_cfg=None):
    """Denoiser dispatch shared by the diffusion depth engines: an
    ``SVDConfig`` (has cross_attention_dim) selects the weight-exact
    SVD graph (``models.svd.SVDInpainter``) — DepthCrafter and
    GeometryCrafter are SVD fine-tunes, so converted checkpoints load
    straight into it — anything else the generic ``VideoInpainter``."""
    from metric_depth_video_toolbox_tpu.models import diffusion as dif
    cfg = cfg or dif.DIFFUSION_TINY
    if hasattr(cfg, "cross_attention_dim"):
        from metric_depth_video_toolbox_tpu.models import svd as svdm
        return cfg, svdm.SVDInpainter(cfg, vae_cfg or svdm.SVDVAEConfig())
    return cfg, dif.VideoInpainter(cfg)


class DepthCrafterEngine:
    """DepthCrafter-class engine: video->relative-depth diffusion in
    windows (110/25, 5 steps, reference depthcrafter_video.py:183-194),
    re-metricized against a required reference depth video (:200-227).

    ``cfg=models.svd.SVDConfig()`` selects the production SVD-class
    graph (DepthCrafter is an SVD fine-tune); converted checkpoints
    load via ``models.convert``."""

    def __init__(self, cfg=None, params=None, window=110, overlap=25,
                 work_hw=None, max_res=768, rng_seed=0, max_depth=100.0,
                 vae_cfg=None, use_depth_prompting=False, **_):
        # **_ tolerates the generic engine kwargs the movie orchestrator
        # passes to every engine type (size/input_size)
        from metric_depth_video_toolbox_tpu.models import diffusion as dif
        self.dif = dif
        self.cfg, self.model = _build_denoiser(cfg, vae_cfg)
        self.window = window
        self.overlap = overlap
        # work_hw=None: derived from the input's aspect ratio at the
        # first window, long side capped at ``max_res`` and rounded to
        # x64 — the reference's working point (depthcrafter_video.py:52
        # --max_res 768, :191-192), NOT a fixed square
        self.work_hw = work_hw
        self.max_res = max_res
        self.max_depth = max_depth
        # experimental latent depth prompting (reference
        # depthcrafter_video.py:131-177): the reference depth rides into
        # the sampler as an SDEdit-style init latent through the VAE
        self.use_depth_prompting = use_depth_prompting
        self._params = params
        self._rng = jax.random.PRNGKey(rng_seed)

    def _resolve_work_hw(self, h, w):
        if self.work_hw is None:
            # aspect-preserving, long side <= max_res, x64-rounded
            # (reference depthcrafter_video.py:52,191-192)
            s = min(1.0, self.max_res / max(h, w))
            self.work_hw = (max(64, int(round(h * s / 64)) * 64),
                            max(64, int(round(w * s / 64)) * 64))
        return self.work_hw

    def _ensure(self, t):
        if self._params is None:
            f = jnp.zeros((t,) + self.work_hw + (3,))
            m = jnp.zeros((t,) + self.work_hw)
            self._params = jax.jit(self.model.init)(self._rng, f, m)

    def infer_window(self, frames_u8, ref_depth=None):
        t, h, w = frames_u8.shape[:3]
        wh, ww = self._resolve_work_hw(h, w)
        self._ensure(t)
        prompt = self.use_depth_prompting and ref_depth is not None

        # shape-keyed jit cache: a fresh `def` per call would retrace
        # (and re-lower) the whole diffusion program every window
        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        key = (t, h, w, prompt)
        if key in cache:
            run = cache[key]
            self._rng, sub = jax.random.split(self._rng)
            return robust_call(run, self._params, sub,
                               jnp.asarray(frames_u8),
                               jnp.asarray(ref_depth) if prompt else None)

        @jax.jit
        def run(params, rng, f_u8, dref):
            f = f_u8.astype(jnp.float32) / 255.0
            fw = jax.image.resize(f, (t, wh, ww, 3), "bilinear")
            cond_lat = self.model.apply(params, fw,
                                        method=self.model.encode)
            mlat = jnp.zeros(cond_lat.shape[:3] + (1,))
            cond = jnp.concatenate([cond_lat, mlat], axis=-1)
            init = None
            if dref is not None:
                # normalized inverse depth -> 3-ch image -> VAE latent
                inv = 1.0 / jnp.maximum(dref.astype(jnp.float32), 1e-3)
                inv = inv / jnp.maximum(jnp.max(inv), 1e-6)
                dimg = jnp.repeat(inv[..., None], 3, axis=-1)
                dimg = jax.image.resize(dimg, (t, wh, ww, 3), "bilinear")
                init = self.model.apply(params, dimg,
                                        method=self.model.encode)
            z = self.dif.sample(
                lambda p, zz, s, c: self.model.apply(
                    p, zz, s, c, method=self.model.denoise),
                params, rng, cond_lat.shape, self.cfg, cond, init=init)
            out = self.model.apply(params, z, method=self.model.decode)
            disp = out.mean(axis=-1)  # 1-ch relative disparity
            return jax.image.resize(disp, (t, h, w), "bilinear")

        cache[key] = run
        self._rng, sub = jax.random.split(self._rng)
        return robust_call(run, self._params, sub, jnp.asarray(frames_u8),
                           jnp.asarray(ref_depth) if prompt else None)

    def infer_video(self, frames_u8, reference_depth):
        t = frames_u8.shape[0]
        disps = []
        start = 0
        step = max(self.window - self.overlap, 1)
        while start < t:
            idx = np.clip(np.arange(start, start + self.window), 0, t - 1)
            d = self.infer_window(frames_u8[idx],
                                  reference_depth[idx]
                                  if self.use_depth_prompting else None)
            n_new = min(self.window, t - start)
            disps.append(d[:n_new])
            if start + self.window >= t:
                break
            start += step
        disp = vd.stitch_windows(disps, self.window, self.overlap, t) \
            if len(disps) > 1 else disps[0][:t]
        # re-metricize against the reference depth video (:200-227)
        s, sh = to_host(jax.jit(solvers.scale_and_shift)(
            jnp.asarray(disp),
            1.0 / jnp.maximum(jnp.asarray(reference_depth[:t]), 1e-3)))
        inv = disp * float(s) + float(sh)
        depth = 1.0 / np.maximum(inv, 1e-6)
        depth[inv <= 0] = self.max_depth
        return np.clip(depth, 0, self.max_depth).astype(np.float32)


class GeometryCrafterEngine:
    """GeometryCrafter-class depth STABILIZER — a distinct conditioning
    path from DepthCrafter (reference geometrycrafter_video.py):

    - the prior (MoGe output or any depth video) is projected to POINT
      MAPS at the working resolution (project_depth_maps, :24-93),
      normalized per window by the median z;
    - the diffusion denoiser is conditioned on BOTH the RGB latent and
      the point-map latent (the reference's point-map VAE conditioning,
      :345-421);
    - the model output is a refined point map; its Z channel becomes
      the depth (:418), de-normalized and median-rescaled to the prior.

    Window 110 / overlap 5 at a 640x384-class working resolution
    (:345-349)."""

    def __init__(self, cfg=None, params=None, window=110, overlap=5,
                 work_hw=(384, 640), rng_seed=0, max_depth=100.0,
                 xfov=60.0, vae_cfg=None, pmap_vae_params=None,
                 pmap_vae_cfg=None, **_):
        from metric_depth_video_toolbox_tpu.models import diffusion as dif
        self.dif = dif
        self.cfg, self.model = _build_denoiser(cfg, vae_cfg)
        self.window = window
        self.overlap = overlap
        self.work_hw = work_hw
        self.max_depth = max_depth
        self.xfov = xfov or 60.0
        self._params = params
        self._rng = jax.random.PRNGKey(rng_seed)
        # dedicated point-map VAE (reference geometrycrafter_video.py:
        # 311-317 PMapAutoencoderKLTemporalDecoder, 'point_map_vae'
        # subfolder): encodes the prior point maps and decodes the
        # refined latent to xyz + a valid-mask logit. Without converted
        # weights the shared denoiser VAE stands in (both paths keep
        # the same conditioning layout).
        self._pmap_enc = self._pmap_dec = None
        self._pmap_params = pmap_vae_params
        if pmap_vae_params is not None:
            from metric_depth_video_toolbox_tpu.models import svd as svdm
            pcfg = pmap_vae_cfg or svdm.vae_config_from_params(
                pmap_vae_params)
            self._pmap_enc = svdm.SVDVAEEncoder(pcfg)
            self._pmap_dec = svdm.SVDVAEDecoder(pcfg)

    def infer_window(self, frames_u8, prior_depth):
        from metric_depth_video_toolbox_tpu.ops import geometry as geo
        t, h, w = frames_u8.shape[:3]
        wh, ww = self.work_hw

        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        key = (t, h, w)
        if key not in cache:
            @jax.jit
            def run(params, pparams, rng, f_u8, prior):
                f = f_u8.astype(jnp.float32) / 255.0
                fw = jax.image.resize(f, (t, wh, ww, 3), "bilinear")
                # prior depth -> point maps at working res
                # (project_depth_maps, geometrycrafter_video.py:24-93)
                pw = jax.image.resize(prior, (t, wh, ww), "bilinear")
                k = geo.camera_matrix_from_fov(ww, wh,
                                               xfov_deg=self.xfov)
                pts = jax.vmap(lambda d: geo.unproject_depth(d, k))(pw)
                scale = jnp.median(pw)
                pmap = pts / jnp.maximum(scale, 1e-3)
                rgb_lat = self.model.apply(params, fw,
                                           method=self.model.encode)
                if self._pmap_enc is not None:
                    # dedicated point-map VAE path: its encoder sees the
                    # normalized point map in [-1,1]-style range
                    pmap_lat = self._pmap_enc.apply(
                        {"params": pparams["encoder"]["params"]}, pmap)
                else:
                    pmap_lat = self.model.apply(params, pmap,
                                                method=self.model.encode)
                # cond channel layout matches the inpainter init path
                # (latent + mask + second latent); the mask slot is 0 —
                # the stabilizer conditions on the full frame
                mlat = jnp.zeros(rgb_lat.shape[:3] + (1,))
                cond = jnp.concatenate([rgb_lat, mlat, pmap_lat],
                                       axis=-1)
                z = self.dif.sample(
                    lambda p, zz, s, c: self.model.apply(
                        p, zz, s, c, method=self.model.denoise),
                    params, rng, rgb_lat.shape, self.cfg, cond)
                if self._pmap_dec is not None:
                    # temporal decode to xyz + valid-mask logit; depth is
                    # the Z channel, the mask rides back to the caller's
                    # contract only as upstream does (the reference
                    # wrapper discards valid_masks,
                    # geometrycrafter_video.py:401-418)
                    out = self._pmap_dec.apply(
                        {"params": pparams["decoder"]["params"]}, z)
                else:
                    out = self.model.apply(params, z,
                                           method=self.model.decode)
                # Z channel of the refined point map -> depth (:418)
                zd = out[..., 2] * jnp.maximum(scale, 1e-3)
                return jax.image.resize(zd, (t, h, w), "bilinear")
            cache[key] = run

        if self._params is None:
            f = jnp.zeros((t,) + self.work_hw + (3,))
            m = jnp.zeros((t,) + self.work_hw)
            # init with the 3-channel 'mono' slot = the point map, so
            # the UNet's cond convs get the right channel count
            self._params = jax.jit(self.model.init)(self._rng, f, m, f)
        self._rng, sub = jax.random.split(self._rng)
        return robust_call(cache[key], self._params,
                           self._pmap_params or {}, sub,
                           jnp.asarray(frames_u8),
                           jnp.asarray(prior_depth))

    def infer_video(self, frames_u8, reference_depth):
        t = frames_u8.shape[0]
        outs = []
        start = 0
        step = max(self.window - self.overlap, 1)
        while start < t:
            idx = np.clip(np.arange(start, start + self.window), 0, t - 1)
            d = self.infer_window(frames_u8[idx], reference_depth[idx])
            n_new = min(self.window, t - start)
            outs.append(d[:n_new])
            if start + self.window >= t:
                break
            start += step
        depth = vd.stitch_windows(outs, self.window, self.overlap, t) \
            if len(outs) > 1 else to_host(outs[0])[:t]
        # median-ratio rescale to the prior (the stabilizer refines
        # geometry; the prior stays the metric anchor)
        ref = np.asarray(reference_depth[:t], np.float32)
        ok = (depth > 1e-3) & (ref > 1e-3)
        ratio = np.median(ref[ok] / depth[ok]) if ok.any() else 1.0
        depth = depth * float(ratio)
        return np.clip(depth, 0, self.max_depth).astype(np.float32)


@register_engine("geometrycrafter")
def run_geometrycrafter(color_video, max_depth=100.0, max_frames=-1,
                        engine=None, reference_depth_video=None,
                        xfov=None, **kw):
    """Distinct engine: stabilize a prior (reference depth video, or a
    MoGe-class single-frame pass when absent — the reference's default
    prior, geometrycrafter_video.py:101-153)."""
    frames, fps = vio.read_video_frames(color_video, max_frames=max_frames)
    if reference_depth_video and vio.is_valid_video(reference_depth_video):
        r = vio.DepthVideoReader(reference_depth_video, max_depth)
        prior = r.read_depth_batch(frames.shape[0])
        r.close()
    else:
        moge = SingleFrameEngine(max_depth=max_depth, variant="moge",
                                 xfov=xfov,
                                 **{k: v for k, v in kw.items()
                                    if k in ("size", "input_size")})
        prior = moge.infer_video(frames)
    eng = engine or GeometryCrafterEngine(max_depth=max_depth, xfov=xfov,
                                          **kw)
    depth = eng.infer_video(frames, prior)
    out = color_video + "_depth.mkv"
    vio.save_depth_video(depth, out, fps, max_depth)
    return out


@register_engine("depthcrafter")
def run_depthcrafter(color_video, max_depth=100.0, max_frames=-1,
                     engine=None, reference_depth_video=None, **kw):
    if reference_depth_video is None:
        raise ValueError("depthcrafter engine requires a reference depth "
                         "video for metric alignment "
                         "(reference depthcrafter_video.py:200)")
    eng = engine or DepthCrafterEngine(max_depth=max_depth, **kw)
    frames, fps = vio.read_video_frames(color_video, max_frames=max_frames)
    r = vio.DepthVideoReader(reference_depth_video, max_depth)
    ref = r.read_depth_batch(frames.shape[0])
    r.close()
    depth = eng.infer_video(frames, ref)
    out = color_video + "_depth.mkv"
    vio.save_depth_video(depth, out, fps, max_depth)
    return out


class MVSEngine:
    """MVSAnywhere-class pose-conditioned plane-sweep MVS (reference
    video_mvsa.py): per-frame window of +-half_w source views built from
    the *_transformations.json camera track, cost-volume + refined depth,
    median-ratio consistency between them.

    TPU design: the view window is padded to a static V with a validity
    mask so one jitted program covers every frame; frames are processed
    in batches (the 'data' mesh axis for multi-chip)."""

    def __init__(self, size="base", max_depth=100.0, window=7,
                 resize_w=1024, params=None, batch=4, rng_seed=0,
                 rescale_to_cost_volume=False, data_parallel=True,
                 fast_cost_volume=False, **_):
        from metric_depth_video_toolbox_tpu.models import mvs as mvs_mod
        self.mvs_mod = mvs_mod
        self.cfg = mvs_mod.preset(size, max_depth=max_depth)
        if fast_cost_volume:
            # speed knob (reference video_mvsa.py:77,239 batches the
            # matching encoder): here the cost volume is already fully
            # batched, so 'fast' halves the plane-sweep hypotheses
            import dataclasses
            self.cfg = dataclasses.replace(
                self.cfg, num_depths=max(8, self.cfg.num_depths // 2))
        self.model = mvs_mod.MVSNet(self.cfg)
        self.max_depth = max_depth
        self.half_w = max(1, int(window) // 2)
        self.resize_w = resize_w
        self.batch = batch
        self.rescale = rescale_to_cost_volume
        self._params = params
        self._rng = jax.random.PRNGKey(rng_seed)
        self._jit = None
        self._mesh = None
        if data_parallel and jax.device_count() > 1:
            from metric_depth_video_toolbox_tpu.parallel import mesh as mm
            n = jax.device_count()
            self.batch = max(self.batch, n) // n * n
            self._mesh = mm.frame_mesh(n)

    def _window_indices(self, i, n):
        """Source indices around frame i, padded to 2*half_w with i
        (self) and marked invalid (reference video_mvsa.py:151-162)."""
        idx = [j for j in range(i - self.half_w, i + self.half_w + 1)
               if 0 <= j < n and j != i]
        if not idx:
            idx = [min(n - 1, max(0, i + 1))]
        valid = [1.0] * len(idx)
        v = 2 * self.half_w
        while len(idx) < v:
            idx.append(i)
            valid.append(0.0)
        return idx[:v], valid[:v]

    def infer_video(self, frames_u8, transforms, xfov, yfov=None):
        from metric_depth_video_toolbox_tpu.ops import geometry as geo
        n, h, w = frames_u8.shape[:3]
        scale = min(1.0, self.resize_w / w)
        wh, ww = int(round(h * scale)) // 4 * 4, int(round(w * scale)) \
            // 4 * 4
        k_work = np.asarray(geo.camera_matrix_from_fov(ww, wh, xfov, yfov))
        k_feat = jnp.asarray(np.diag([0.25, 0.25, 1.0]) @ k_work,
                             jnp.float32)
        small = np.stack([
            np.asarray(jax.image.resize(
                jnp.asarray(f, jnp.float32), (wh, ww, 3), "bilinear"))
            for f in frames_u8]).astype(np.float32)
        c2w = np.asarray(transforms, np.float32)
        w2c = np.stack([np.linalg.inv(t) for t in c2w])

        if self._jit is not None and self._jit_key != (wh, ww):
            self._jit = None  # resolution changed between videos
        if self._jit is None:
            self._jit_key = (wh, ww)
            if self._params is None:
                z = jnp.zeros((wh, ww, 3))
                zs = jnp.zeros((2 * self.half_w, wh, ww, 3))
                zp = jnp.tile(jnp.eye(4), (2 * self.half_w, 1, 1))
                zv = jnp.ones((2 * self.half_w,))
                self._params = jax.jit(self.model.init)(
                    self._rng, z, zs, k_feat, zp, zv)
            self._jit = jax.jit(
                lambda p, r, s, rp, vv: jax.vmap(
                    lambda r1, s1, p1, v1: self.model.apply(
                        p, r1, s1, k_feat, p1, v1))(r, s, rp, vv))

        outs = []
        b = self.batch
        for start in range(0, n, b):
            ids = list(range(start, min(start + b, n)))
            while len(ids) < b:
                ids.append(ids[-1])
            refs, srcs, poses, valids = [], [], [], []
            for i in ids:
                idx, val = self._window_indices(i, n)
                refs.append(small[i])
                srcs.append(small[idx])
                poses.append(np.stack([w2c[j] @ c2w[i] for j in idx]))
                valids.append(val)
            put = jnp.asarray
            if self._mesh is not None:
                from metric_depth_video_toolbox_tpu.parallel import \
                    sharding
                put = lambda a: jax.device_put(
                    jnp.asarray(a), sharding.batch_sharding(
                        self._mesh, np.asarray(a).ndim))
            out = robust_call(
                self._jit, self._params,
                put(np.stack(refs).astype(np.float32) / 255.0),
                put(np.stack(srcs).astype(np.float32) / 255.0),
                put(np.stack(poses)),
                put(np.stack(valids)))
            d = out["depth"]
            if self.rescale:
                s = jax.vmap(lambda cv, dd, m: solvers.median_ratio_scale(
                    cv, dd, m.astype(jnp.float32)))(
                        jnp.asarray(out["depth_cv"]), jnp.asarray(d),
                        jnp.asarray(out["mask"]))
                d = np.asarray(d) * np.asarray(s).reshape(-1, 1, 1)
            d = np.asarray(jax.image.resize(
                jnp.asarray(d), (b, h, w), "nearest"))
            outs.append(np.clip(d, 0, self.max_depth)[:min(b, n - start)])
        return np.concatenate(outs, axis=0)[:n]


@register_engine("mvsa")
def run_mvsa(color_video, max_depth=100.0, max_frames=-1, engine=None,
             transformation_file=None, xfov=None, yfov=None, **kw):
    """video_mvsa.py equivalent (poses + FOV required)."""
    if transformation_file is None:
        raise ValueError("mvsa engine requires --transformation_file "
                         "(reference video_mvsa.py:73)")
    if xfov is None and yfov is None:
        raise ValueError("mvsa engine requires --xfov or --yfov")
    eng = engine or MVSEngine(max_depth=max_depth, **kw)
    frames, fps = vio.read_video_frames(color_video, max_frames=max_frames)
    transforms = sidecar.load_transformations(transformation_file)
    if len(transforms) < frames.shape[0]:
        raise ValueError(
            f"transformation file has {len(transforms)} entries for "
            f"{frames.shape[0]} frames")
    depth = eng.infer_video(frames, transforms[:frames.shape[0]], xfov,
                            yfov)
    out = color_video + "_depth.mkv"
    vio.save_depth_video(depth, out, fps, max_depth)
    return out


_ENGINE_CLASSES["da3"] = DA3PipelineEngine
_ENGINE_CLASSES["depthcrafter"] = DepthCrafterEngine
_ENGINE_CLASSES["geometrycrafter"] = GeometryCrafterEngine
_ENGINE_CLASSES["mvsa"] = MVSEngine
