"""DA3-class multi-view depth + pose estimation (Flax).

Fills the role of Depth-Anything-3 (the reference's default engine,
video_da3.py, default model nested-giant-large — video_da3.py:274),
implementing the published DA3 mechanism:

- **Input-adaptive cross-view self-attention**: a plain DINOv2 ViT where
  alternating blocks attend over the CONCATENATED tokens of all views in
  the window instead of per-view. No new parameters — the same qkv/proj
  weights serve both modes, so the backbone of a real DA3 checkpoint
  maps through the ordinary DINOv2 converter (models.vit
  cross_view_indices + view_group).
- **Dual-DPT depth-ray head**: one DPT decode per branch over the shared
  backbone features — metric DEPTH (1ch, relu) and a per-pixel RAY map
  (6ch: world-frame ray origin + direction, the DA3 depth+ray target).
- **Cameras recovered from the ray map** (not a learned pose head): per
  view, the camera center is the mean predicted origin, the focal comes
  from a closed-form least squares of pixel radius against ray angle,
  and the rotation from a rotation-only Procrustes between canonical
  camera rays and predicted world rays (``cameras_from_raymap``).

Checkpoint conversion: ``models.convert.convert_da3`` (backbone =
DINOv2 layout; head.depth / head.ray = DA-V2 DPT scratch layout);
forward equivalence vs a torch mirror of this graph is proven in
tests/test_weight_exact_da3.py.

Production default is a VIT_L-class backbone with cross-view attention
in every odd block (``DA3_L``; ``preset('vitl')``); the tiny config
exists only for tests and ``--model_size vitt``. The windowed video
driver reproduces the reference's batching exactly
(video_da3.py:127-241):

  - batches of N frames + a few global reference frames spanning the clip
  - inter-batch depth-scale alignment (least-squares scalar on the shared
    reference depths)
  - inter-batch pose alignment: Umeyama sim3 over shared camera centers,
    then a last-frame weld for perceptual smoothness
    (use_last_frame_in_batch_to_align, :229-241)

Outputs per clip: metric depth (T, H, W), cam-to-world transforms
(T, 4, 4), xfovs (T,).

TPU mapping: per-view ViT work is pure DP over views; the cross-view
attention is one concatenated-sequence attention (flash kernel on TPU)
— the only cross-view (and on a mesh, cross-device) op.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod
from metric_depth_video_toolbox_tpu.ops import solvers
from metric_depth_video_toolbox_tpu.utils.host import robust_call, to_host


def _cv_vit(base):
    """DA3 backbone = the plain ViT with cross-view attention in every
    odd block (input-adaptive: single-view forward is a vanilla DINOv2,
    so DINOv2-family checkpoints convert unchanged)."""
    return dataclasses.replace(
        base, cross_view_indices=tuple(range(1, base.depth, 2)))


@dataclasses.dataclass(frozen=True)
class DA3Config:
    vit: vit_mod.ViTConfig = _cv_vit(vit_mod.VIT_L)
    dpt: dpt_mod.DPTConfig = dpt_mod.DPTConfig()
    ray_head: bool = True
    max_depth: float = 100.0


DA3_TINY = DA3Config(vit=_cv_vit(vit_mod.VIT_TINY), dpt=dpt_mod.DPT_TINY)
DA3_S = DA3Config(vit=_cv_vit(vit_mod.VIT_S), dpt=dpt_mod.DPTConfig())
DA3_L = DA3Config()  # production default: VIT_L, odd blocks cross-view
DA3_G = DA3Config(vit=_cv_vit(vit_mod.VIT_G))

PRESETS = {"vitt": DA3_TINY, "vits": DA3_S, "vitb": DA3_S,
           "vitl": DA3_L, "vitg": DA3_G}


def preset(name):
    return PRESETS.get(name, DA3_L)


class DualDPT(nn.Module):
    """The DA3 dual-DPT head: two DPT decodes over the shared backbone
    features — depth (1ch, relu) and ray map (6ch raw: world-frame ray
    origin xyz + direction xyz)."""
    cfg: DA3Config

    @nn.compact
    def __call__(self, feats):
        c = self.cfg
        depth = dpt_mod.DPTHead(c.dpt, patch_size=c.vit.patch_size,
                                name="depth")(feats)
        out = {"depth": depth[..., 0]}
        if c.ray_head:
            ray_cfg = dataclasses.replace(c.dpt, head_act="none", n_out=6)
            out["rays"] = dpt_mod.DPTHead(
                ray_cfg, patch_size=c.vit.patch_size, name="ray")(feats)
        return out


def cameras_from_raymap(rays, img_w, min_focal_frac=0.1):
    """Closed-form camera recovery from a predicted ray map — the DA3
    depth-ray parameterization: cameras are not a learned head but are
    solved from the per-pixel rays.

    ``rays``: (V, h, w, 6) world-frame ray origins + directions on any
    regular pixel grid (the caller may pool the full-res map; the solve
    is grid-resolution independent). ``img_w``: full image width in px,
    so the recovered focal converts to x-FOV of the actual image.

    Per view (all batched, jit-friendly):
      center   = mean origin
      focal    = argmin_f sum w * (r_px - f tan(theta))^2  (closed form),
                 theta = angle(ray, principal axis), r_px = pixel radius
      rotation = rotation-only Procrustes canonical-rays -> world rays

    Returns (w2c (V,4,4), xfov_deg (V,)).
    """
    v, h, w, _ = rays.shape
    o = rays[..., :3].reshape(v, h * w, 3).astype(jnp.float32)
    d = rays[..., 3:6].reshape(v, h * w, 3).astype(jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
    center = jnp.mean(o, axis=1)  # (V, 3)

    # principal axis estimate (exact when predictions are consistent)
    z = jnp.mean(d, axis=1)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-6)

    # pixel offsets about the image center, in FULL-IMAGE pixel units
    sx = img_w / w
    uu = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2) * sx
    vv = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2) * sx
    du = jnp.broadcast_to(uu[None], (h, w)).reshape(-1)
    dv = jnp.broadcast_to(vv[:, None], (h, w)).reshape(-1)
    r = jnp.sqrt(du * du + dv * dv)  # (h*w,)

    cos = jnp.clip(jnp.einsum("vnc,vc->vn", d, z), -1.0, 1.0)
    tan = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 0.0)) / jnp.maximum(
        cos, 1e-3)
    wgt = r  # outer pixels constrain the focal best
    f = (jnp.sum(wgt * r[None] * tan, axis=1)
         / jnp.maximum(jnp.sum(wgt * tan * tan, axis=1), 1e-6))
    f = jnp.maximum(f, min_focal_frac * img_w)  # guard degenerate maps

    # canonical camera rays at that focal (+z forward, y down, x right)
    g = jnp.stack([jnp.broadcast_to(du[None], (v, h * w)) / f[:, None],
                   jnp.broadcast_to(dv[None], (v, h * w)) / f[:, None],
                   jnp.ones((v, h * w), jnp.float32)], axis=-1)
    g = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    m = solvers.rigid_transform(g, d, zero_centroid=True)  # (V, 4, 4)
    r_c2w = m[:, :3, :3]

    w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32), (v, 1, 1))
    r_w2c = jnp.swapaxes(r_c2w, 1, 2)
    w2c = w2c.at[:, :3, :3].set(r_w2c)
    w2c = w2c.at[:, :3, 3].set(
        -jnp.einsum("vij,vj->vi", r_w2c, center))
    xfov = 2.0 * jnp.degrees(jnp.arctan2(img_w / 2.0, f))
    return w2c, xfov


class DA3(nn.Module):
    cfg: DA3Config

    @nn.compact
    def __call__(self, frames, cam_rays=None):
        """frames: (V, H, W, 3) [0,1] -> dict with depth (V, H, W),
        w2c (V, 4, 4), xfov_deg (V,), rays (V, H, W, 6) when
        cfg.ray_head.

        ``cam_rays``: optional (V, gh, gw, 3) unit camera-ray directions
        at patch centers — known-intrinsics conditioning (the reference
        passes per-frame K into DA3 inference when --xfov/--xfov_file is
        given, video_da3.py:100-112). Embedded additively into the patch
        tokens BEFORE the backbone so the cross-view attention sees it.
        """
        c = self.cfg
        v = frames.shape[0]
        cond = None
        if cam_rays is not None:
            cond = nn.Dense(c.vit.embed_dim, dtype=c.vit.compute_dtype,
                            name="ray_embed")(
                cam_rays.astype(c.vit.compute_dtype))
        feats, _cls = vit_mod.ViT(c.vit, name="backbone")(
            frames, cond=cond, view_group=v)

        heads = DualDPT(c, name="head")(feats)
        depth = jnp.clip(heads["depth"].astype(jnp.float32), 0.0,
                         c.max_depth)
        out = {"depth": depth}
        if c.ray_head:
            rays = heads["rays"].astype(jnp.float32)
            out["rays"] = rays
            # solve cameras on the patch-grid pooled map (the solve is
            # grid-independent; pooling keeps it a few-k-row LS problem)
            p = c.vit.patch_size
            gh, gw = rays.shape[1] // p, rays.shape[2] // p
            pooled = rays.reshape(v, gh, p, gw, p, 6).mean(axis=(2, 4))
            w2c, fov = cameras_from_raymap(pooled, float(rays.shape[2]))
        else:
            w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32), (v, 1, 1))
            fov = jnp.full((v,), 50.0, jnp.float32)
        out["w2c"] = w2c
        out["xfov_deg"] = fov
        return out


class DA3Engine:
    """Windowed video driver with the reference's overlap stitching.
    Defaults to the production VIT_L-class config (reference
    video_da3.py:274 defaults to da3 nested-giant-large)."""

    def __init__(self, cfg=None, params=None, images_per_batch=40,
                 overlap=6, num_ref_frames=6, resolution=504,
                 rng_seed=0, backbone=None, xfov=None, yfov=None,
                 xfovs=None):
        self.cfg = cfg or DA3_L
        self.model = DA3(self.cfg)
        self.images_per_batch = images_per_batch
        self.overlap = overlap
        self.num_ref_frames = num_ref_frames
        self.resolution = resolution
        self._params = params
        self._pending_backbone = None
        self._rng = jax.random.PRNGKey(rng_seed)
        self._apply = self.model.apply
        # known-intrinsics conditioning (reference video_da3.py:87-112):
        # scalar --xfov/--yfov or per-frame --xfov_file list
        self.xfov, self.yfov = xfov, yfov
        self.xfovs = None if xfovs is None else np.asarray(xfovs,
                                                           np.float32)
        if backbone is not None:
            self.load_backbone(backbone)

    def load_backbone(self, source):
        """Graft converted DINOv2 ViT weights into the DA3 backbone —
        the dominant parameter mass of a DA3-class checkpoint (the
        reference model is DINOv2-based, video_da3.py:274). ``source``
        is a converted checkpoint path (models.convert) or a param tree
        (either the ViT subtree or a full tree holding 'backbone').
        Position embeddings are resampled to this engine's grid."""
        from metric_depth_video_toolbox_tpu.models import convert

        bb = (convert.load_checkpoint(source) if isinstance(source, str)
              else source)
        if "params" in bb:
            bb = bb["params"]
        if "backbone" in bb:
            bb = bb["backbone"]
        if self._params is None:
            self._pending_backbone = bb
            return
        self._graft_backbone(bb)

    def _graft_backbone(self, bb):
        import flax

        params = flax.core.unfreeze(self._params)
        tgt = params["params"]["backbone"]
        pe_t = np.asarray(tgt["pos_embed"])
        pe_s = np.asarray(bb["pos_embed"])
        if pe_s.shape != pe_t.shape:
            from metric_depth_video_toolbox_tpu.models import convert
            ns = pe_s.shape[1] - 1
            nt = pe_t.shape[1] - 1
            gs = int(round(ns ** 0.5))
            gt = int(round(nt ** 0.5))
            bb = dict(bb)
            bb["pos_embed"] = convert.interpolate_pos_embed(
                pe_s, (gs, ns // gs), (gt, nt // gt))
        mism = [k for k in tgt
                if np.asarray(jax.tree.leaves(tgt[k])[0]).shape
                != np.asarray(jax.tree.leaves(bb[k])[0]).shape]
        if mism:
            raise ValueError(
                f"backbone shape mismatch at {mism}: checkpoint was "
                f"converted for a different ViT config than "
                f"{self.cfg.vit}")
        params["params"]["backbone"] = jax.tree.map(jnp.asarray, bb)
        self._params = params

    def _work_hw(self, h, w):
        from metric_depth_video_toolbox_tpu.models import depth_anything
        return depth_anything.working_resolution(
            h, w, self.resolution, self.cfg.vit.patch_size)

    def infer_video(self, frames_u8):
        """(T, H, W, 3) uint8 -> (depth (T,H,W), c2w (T,4,4), xfov (T,))."""
        t, h, w = frames_u8.shape[:3]
        wh, ww = self._work_hw(h, w)
        n_batch = min(self.images_per_batch, t)
        n_ref = min(self.num_ref_frames, t) if t > n_batch else 0
        v_total = n_batch + n_ref + (self.overlap if t > n_batch else 0)

        # known-intrinsics conditioning: per-frame patch-center rays
        from metric_depth_video_toolbox_tpu.models import depth_anything \
            as da_mod
        patch = self.cfg.vit.patch_size
        gh, gw = wh // patch, ww // patch
        known_fovs = None
        if self.xfovs is not None:
            known_fovs = np.resize(self.xfovs, t).astype(np.float32)
        elif self.xfov is not None or self.yfov is not None:
            xf = self.xfov if self.xfov is not None else \
                float(np.degrees(2 * np.arctan(
                    np.tan(np.radians(self.yfov) / 2) * w / h)))
            known_fovs = np.full(t, xf, np.float32)
        all_rays = None
        if known_fovs is not None:
            all_rays = np.stack([
                np.asarray(da_mod.patch_center_rays(float(f), gh, gw))
                for f in known_fovs])  # (T, gh, gw, 3)

        if self._params is None:
            x = jnp.zeros((v_total, wh, ww, 3))
            r0 = (jnp.zeros((v_total, gh, gw, 3))
                  if all_rays is not None else None)
            self._params = jax.jit(
                lambda rng, xx: self.model.init(rng, xx, r0))(self._rng, x)
            if self._pending_backbone is not None:
                self._graft_backbone(self._pending_backbone)
                self._pending_backbone = None

        @jax.jit
        def run(params, batch_u8, rays=None):
            x = batch_u8.astype(jnp.float32) / 255.0
            x = jax.image.resize(x, (batch_u8.shape[0], wh, ww, 3),
                                 "bilinear")
            out = self._apply(params, x, rays)
            d = jax.image.resize(out["depth"],
                                 (batch_u8.shape[0], h, w), "bilinear")
            return d, out["w2c"], out["xfov_deg"]

        # global reference frames spanning the video (video_da3.py:127-147)
        ref_ids = (np.linspace(0, t - 1, n_ref).astype(int).tolist()
                   if n_ref else [])

        depth_out = np.zeros((t, h, w), np.float32)
        c2w_out = np.zeros((t, 4, 4), np.float32)
        fov_out = np.zeros(t, np.float32)

        align_depths = None
        last_tail_ids = []
        last_tail_c2w = None
        last_tail_depth = None

        start = 0
        step = n_batch - (self.overlap if t > n_batch else 0)
        step = max(step, 1)
        while start < t:
            batch_ids = list(range(start, min(start + n_batch, t)))
            to_run = ref_ids + last_tail_ids + batch_ids
            n_pre = len(ref_ids) + len(last_tail_ids)
            idx = np.asarray(to_run)
            pad = v_total - idx.size
            if pad > 0:
                idx = np.concatenate([idx, np.full(pad, idx[-1])])
            d, w2c, fov = robust_call(
                run, self._params, jnp.asarray(frames_u8[idx]),
                jnp.asarray(all_rays[idx]) if all_rays is not None
                else None)
            c2w = np.linalg.inv(w2c)  # DA3 extrinsics are w2c (:257-260)

            ref_d = d[:n_pre] if n_pre else None
            if align_depths is None and ref_d is not None:
                align_depths = ref_d[:len(ref_ids)]

            # depth-scale stitch on shared reference depths (:183-192)
            if last_tail_depth is not None and n_pre:
                anchor = np.concatenate(
                    [align_depths, last_tail_depth], axis=0) \
                    if align_depths is not None else last_tail_depth
                s = float(to_host(jax.jit(solvers.least_squares_scale)(
                    jnp.asarray(anchor), jnp.asarray(d[:n_pre]))))
                d = d * s
                c2w[:, :3, 3] *= s

            # pose stitch: Umeyama over shared camera centers (:203-229)
            if last_tail_c2w is not None and len(last_tail_ids):
                prev_centers = last_tail_c2w[:, :3, 3]
                cur_centers = c2w[len(ref_ids):n_pre, :3, 3]
                if cur_centers.shape[0] >= 3:
                    s3, r3, t3 = [np.asarray(v) for v in solvers.umeyama_sim3(
                        jnp.asarray(cur_centers), jnp.asarray(prev_centers))]
                    sim = np.eye(4, dtype=np.float32)
                    sim[:3, :3] = s3 * r3
                    sim[:3, 3] = t3
                    c2w = sim @ c2w
                # last-frame weld (:229-241)
                diff = last_tail_c2w[-1] @ np.linalg.inv(c2w[n_pre - 1])
                c2w = diff @ c2w

            new_ids = batch_ids
            depth_out[new_ids] = d[n_pre:n_pre + len(new_ids)]
            c2w_out[new_ids] = c2w[n_pre:n_pre + len(new_ids)]
            fov_out[new_ids] = fov[n_pre:n_pre + len(new_ids)]

            tail = batch_ids[-self.overlap:] if t > n_batch else []
            last_tail_ids = tail
            last_tail_c2w = c2w_out[tail] if tail else None
            last_tail_depth = depth_out[tail] if tail else None
            if start + n_batch >= t:
                break
            start += step
        if known_fovs is not None:
            # with known intrinsics the sidecar carries them verbatim
            fov_out = known_fovs
        return depth_out, c2w_out, fov_out
