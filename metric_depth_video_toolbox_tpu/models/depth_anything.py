"""Depth-Anything-class monocular depth estimator (ViT + DPT, Flax).

Fills the role of the reference's metric anchor model
(Depth-Anything-V2-metric-hypersim, reference other/metric_dpt_func.py:7-17,
loaded by video_metric_convert.py:116) and the per-frame relative model
inside VDA. Two output modes:

- metric:   depth = sigmoid-free scaled output, clipped to max_depth
            (DA-V2-metric convention: head output * max_depth)
- relative: raw non-negative disparity (inverse depth up to scale/shift)

Inference helper handles aspect-preserving resize to a patch-multiple
working resolution (reference video_metric_convert.py:84-88) and resize
back, all on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    vit: vit_mod.ViTConfig = vit_mod.VIT_L
    dpt: dpt_mod.DPTConfig = dpt_mod.DPTConfig()
    metric: bool = True
    max_depth: float = 20.0  # hypersim-metric convention
    # UniDepth-class K-conditioned inference: per-patch camera-ray
    # directions embedded and added to the patch tokens (reference
    # unidepth_video.py:70-74 passes K into model.infer)
    k_condition: bool = False
    # DepthPro-class focal estimation: a small head on the cls token
    # predicts per-image horizontal FOV (reference depthpro_video.py:
    # 154-159 reads focallength_px from the model output)
    fov_head: bool = False
    # MoGe-class point-map head: the DPT head emits a raw 4-channel map
    # (affine-invariant xyz point map + mask logit) instead of depth;
    # focal + z-shift are recovered downstream from the point map
    # (ops.geometry.recover_focal_shift — the mechanism behind
    # reference moge_video.py's output['intrinsics']/['depth']/['mask'],
    # NaN sky included). Requires dpt n_out=4, head_act='none'.
    point_head: bool = False


TINY = DepthAnythingConfig(vit=vit_mod.VIT_TINY, dpt=dpt_mod.DPT_TINY,
                           max_depth=20.0)


def preset(name, metric=True, max_depth=20.0):
    dpt_cfg = dpt_mod.DPT_TINY if name == "vitt" else dpt_mod.DPTConfig()
    return DepthAnythingConfig(vit=vit_mod.PRESETS[name],
                               dpt=dpt_cfg, metric=metric,
                               max_depth=max_depth)


class DepthAnything(nn.Module):
    cfg: DepthAnythingConfig

    @nn.compact
    def __call__(self, images, rays=None):
        """images: (B, H, W, 3) in [0,1], H/W multiples of patch size.
        ``rays``: (B, gh, gw, 3) unit camera-ray directions at patch
        centers (required when cfg.k_condition). Returns (B, H, W)
        float32 depth — or (depth, xfov_deg (B,)) when cfg.fov_head."""
        c = self.cfg
        cond = None
        if c.k_condition and rays is not None:
            cond = nn.Dense(c.vit.embed_dim, dtype=c.vit.compute_dtype,
                            name="ray_embed")(
                rays.astype(c.vit.compute_dtype))
        feats, cls = vit_mod.ViT(c.vit, name="backbone")(images, cond)
        out = dpt_mod.DPTHead(c.dpt, patch_size=c.vit.patch_size,
                              name="head")(feats)
        if c.point_head:
            # raw affine point map (z signed; the z-shift that makes it
            # a camera-space depth is recovered downstream) + mask logit
            out = out.astype(jnp.float32)
            return out[..., :3], out[..., 3]
        out = out[..., 0].astype(jnp.float32)
        if c.metric:
            if c.dpt.head_act == "sigmoid":
                # DA-V2 metric convention: sigmoid head * max_depth
                out = out * c.max_depth
            else:
                out = jnp.clip(out, 0.0, c.max_depth)
        if c.fov_head:
            h = nn.Dense(64, dtype=c.vit.compute_dtype,
                         name="fov_fc")(cls.astype(c.vit.compute_dtype))
            h = nn.gelu(h)
            f = nn.Dense(1, dtype=jnp.float32, name="fov_out")(h)
            xfov = 25.0 + 90.0 * nn.sigmoid(f[..., 0])  # 25..115 deg
            return out, xfov
        return out


def patch_center_rays(xfov_deg, gh, gw, yfov_deg=None):
    """Unit camera-ray directions at patch centers for K-conditioned
    inference (UniDepth-class): (gh, gw, 3) float32."""
    import numpy as np
    xf = np.tan(np.radians(xfov_deg) / 2.0)
    yf = np.tan(np.radians(yfov_deg) / 2.0) if yfov_deg else xf * gh / gw
    u = (np.arange(gw) + 0.5) / gw * 2.0 - 1.0
    v = (np.arange(gh) + 0.5) / gh * 2.0 - 1.0
    xx, yy = np.meshgrid(u * xf, v * yf)
    rays = np.stack([xx, yy, np.ones_like(xx)], axis=-1)
    return (rays / np.linalg.norm(rays, axis=-1, keepdims=True)
            ).astype(np.float32)


def working_resolution(h, w, input_size, patch):
    """Aspect-preserving working resolution, snapped to patch multiples
    (reference video_metric_convert.py:84-88 sizes by aspect ratio)."""
    scale = input_size / min(h, w)
    nh = max(patch, int(round(h * scale / patch)) * patch)
    nw = max(patch, int(round(w * scale / patch)) * patch)
    return nh, nw


@partial(jax.jit, static_argnames=("apply_fn", "out_hw", "work_hw"))
def infer_depth(apply_fn, params, images_u8, out_hw, work_hw):
    """uint8 (B, H, W, 3) -> float32 depth (B, out_h, out_w), fused
    resize -> model -> resize-back on device."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], work_hw[0], work_hw[1], 3), "bilinear")
    d = apply_fn(params, x)
    return jax.image.resize(d, (d.shape[0],) + tuple(out_hw), "bilinear")


def scale_shift_align_to_metric(relative_disparity, metric_depth,
                                weights=None, min_depth=1e-3):
    """Fit (s, t) on inverse depths so s*rel + t ~ 1/metric, then return the
    aligned *depth* (reference video_metric_convert.py:119-144: negatives
    and infinities clamp to max valid depth downstream)."""
    from metric_depth_video_toolbox_tpu.ops import solvers
    inv_metric = 1.0 / jnp.maximum(metric_depth, min_depth)
    s, t = solvers.scale_and_shift(relative_disparity, inv_metric, weights)
    inv = relative_disparity * s + t
    return 1.0 / jnp.maximum(inv, 1e-6), (s, t)
