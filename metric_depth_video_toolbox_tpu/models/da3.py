"""DA3-class multi-view depth + pose estimation (Flax).

Fills the role of Depth-Anything-3 (the reference's default engine,
video_da3.py, default model nested-giant-large — video_da3.py:274): a
batch of views goes through a shared ViT backbone, a cross-view
transformer mixes tokens across views (with one learnable POSE TOKEN
per view), and two heads decode:

- DualDPT: a DPT decode with shared per-level reassembly and two fusion
  branches — metric DEPTH (1ch) and per-pixel RAY directions (3ch, the
  DA3 depth+ray output parameterization);
- camera head: each view's pose token -> MLP -> unit quaternion,
  translation, and focal scale (w2c extrinsics + per-view FOV).

Production default is a VIT_L-class backbone with 4 cross-view layers
(``DA3_L``; ``preset('vitl')``); the tiny config exists only for tests
and ``--model_size vitt``. The windowed video driver reproduces the
reference's batching exactly (video_da3.py:127-241):

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


@dataclasses.dataclass(frozen=True)
class DA3Config:
    vit: vit_mod.ViTConfig = vit_mod.VIT_L
    dpt: dpt_mod.DPTConfig = dpt_mod.DPTConfig()
    cross_view_layers: int = 4
    ray_head: bool = True
    max_depth: float = 100.0


DA3_TINY = DA3Config(vit=vit_mod.VIT_TINY, dpt=dpt_mod.DPT_TINY,
                     cross_view_layers=2, ray_head=True)
DA3_S = DA3Config(vit=vit_mod.VIT_S, dpt=dpt_mod.DPTConfig(),
                  cross_view_layers=2)
DA3_L = DA3Config()  # production default: VIT_L + 4 cross-view layers
DA3_G = DA3Config(vit=vit_mod.VIT_G, cross_view_layers=6)

PRESETS = {"vitt": DA3_TINY, "vits": DA3_S, "vitb": DA3_S,
           "vitl": DA3_L, "vitg": DA3_G}


def preset(name):
    return PRESETS.get(name, DA3_L)


class CrossViewBlock(nn.Module):
    """Full attention over all tokens of all views (+pose tokens) — the
    multi-view mixer. Pre-norm transformer block, 4x GELU MLP."""
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        """x: (S, D) flattened multi-view token sequence."""
        s, d = x.shape
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        y = y[None]
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")(y, y)
        x = x + y[0]
        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        z = nn.Dense(d * 4, dtype=self.dtype, name="fc1")(z)
        z = nn.Dense(d, dtype=self.dtype, name="fc2")(
            nn.gelu(z, approximate=False))
        return x + z


class DualDPT(nn.Module):
    """DPT decode with shared reassembly and two fusion branches:
    depth (1ch, relu) and ray directions (3ch, normalized)."""
    cfg: DA3Config

    @nn.compact
    def __call__(self, feats):
        c = self.cfg.dpt
        depth = dpt_mod.DPTHead(c, patch_size=self.cfg.vit.patch_size,
                                name="depth_branch")(feats)
        out = {"depth": depth[..., 0]}
        if self.cfg.ray_head:
            ray_cfg = dataclasses.replace(c, head_act="relu")
            # ray branch shares the DPT structure; 3-channel output via
            # its own head conv stack (run on the same features)
            rays = RayBranch(ray_cfg, self.cfg.vit.patch_size,
                             name="ray_branch")(feats)
            out["rays"] = rays
        return out


class RayBranch(nn.Module):
    """DPT-style decode to per-pixel unit ray directions (3ch)."""
    cfg: dpt_mod.DPTConfig
    patch_size: int

    @nn.compact
    def __call__(self, feats):
        c = self.cfg
        b, gh, gw, _ = feats[0].shape
        scales = (4, 2, 1, 0.5)
        pyr = []
        for i, (f, ch) in enumerate(zip(feats, c.out_channels)):
            y = nn.Conv(ch, (1, 1), dtype=c.compute_dtype,
                        name=f"project{i}")(f)
            hw = (int(gh * scales[i]), int(gw * scales[i]))
            y = jax.image.resize(
                y, (b,) + hw + (y.shape[-1],), "bilinear").astype(y.dtype)
            y = nn.Conv(c.features, (3, 3), dtype=c.compute_dtype,
                        use_bias=False, name=f"scratch{i}")(y)
            pyr.append(y)
        x = dpt_mod.FeatureFusion(c, name="fusion3")(
            pyr[3], out_hw=pyr[2].shape[1:3])
        x = dpt_mod.FeatureFusion(c, name="fusion2")(
            x, skip=pyr[2], out_hw=pyr[1].shape[1:3])
        x = dpt_mod.FeatureFusion(c, name="fusion1")(
            x, skip=pyr[1], out_hw=pyr[0].shape[1:3])
        x = dpt_mod.FeatureFusion(c, name="fusion0")(x, skip=pyr[0])
        x = nn.Conv(c.features // 2, (3, 3), dtype=c.compute_dtype,
                    name="head_conv1")(x)
        x = nn.relu(x)
        x = jax.image.resize(
            x, (b, gh * self.patch_size, gw * self.patch_size,
                x.shape[-1]), "bilinear").astype(x.dtype)
        x = nn.Conv(3, (3, 3), dtype=jnp.float32, name="head_conv2")(x)
        # unit directions, +z hemisphere
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x / jnp.maximum(n, 1e-6)
        return x * jnp.sign(x[..., 2:3] + 1e-9)


def _quat_to_rot(q):
    """(4,) unit quaternion (w, x, y, z) -> (3, 3) rotation."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class CameraHead(nn.Module):
    """Per-view pose token -> w2c extrinsics + FOV (8-dof: unit
    quaternion, translation, focal)."""
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, pose_tokens):
        """pose_tokens: (V, D) -> w2c (V, 4, 4), xfov_deg (V,)."""
        v, d = pose_tokens.shape
        h = nn.Dense(max(256, d), dtype=self.dtype, name="fc1")(
            pose_tokens)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(max(256, d), dtype=self.dtype, name="fc2")(h)
        h = nn.gelu(h, approximate=False)
        out = nn.Dense(8, dtype=jnp.float32, name="out")(h)
        quat = out[:, :4] + jnp.array([1.0, 0, 0, 0])  # identity bias
        quat = quat / jnp.maximum(
            jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-6)
        tvec = out[:, 4:7]
        fov = 40.0 + 50.0 * nn.sigmoid(out[:, 7])  # degrees, 40..90
        rots = jax.vmap(_quat_to_rot)(quat)
        w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32), (v, 1, 1))
        w2c = w2c.at[:, :3, :3].set(rots).at[:, :3, 3].set(tvec)
        return w2c, fov


class DA3(nn.Module):
    cfg: DA3Config

    @nn.compact
    def __call__(self, frames, cam_rays=None):
        """frames: (V, H, W, 3) [0,1] -> dict with depth (V, H, W),
        w2c (V, 4, 4), xfov_deg (V,), rays (V, H, W, 3) when
        cfg.ray_head.

        ``cam_rays``: optional (V, gh, gw, 3) unit camera-ray directions
        at patch centers — known-intrinsics conditioning (the reference
        passes per-frame K into DA3 inference when --xfov/--xfov_file is
        given, video_da3.py:100-112)."""
        c = self.cfg
        feats, cls = vit_mod.ViT(c.vit, name="backbone")(frames)
        v, gh, gw, d = feats[-1].shape
        dt = c.vit.compute_dtype

        if cam_rays is not None:
            ray_tok = nn.Dense(d, dtype=dt, name="ray_embed")(
                cam_rays.astype(dt)).reshape(v, gh * gw, d)
            feats[-1] = (feats[-1].reshape(v, gh * gw, d).astype(dt)
                         + ray_tok).reshape(v, gh, gw, d)

        # cross-view transformer over the finest-level tokens + one
        # learnable pose token per view
        pose_tok = self.param("pose_token", nn.initializers.normal(0.02),
                              (1, d))
        view_emb = self.param("view_embed", nn.initializers.normal(0.02),
                              (64, d))  # supports up to 64 views/window
        f = feats[-1].reshape(v, gh * gw, d).astype(dt)
        f = f + view_emb[:v, None].astype(dt)
        pt = jnp.broadcast_to(pose_tok.astype(dt), (v, d))
        pt = pt + view_emb[:v].astype(dt)
        seq = jnp.concatenate([pt[:, None], f], axis=1)  # (V, 1+N, D)
        seq = seq.reshape(v * (gh * gw + 1), d)
        for i in range(c.cross_view_layers):
            seq = CrossViewBlock(d, c.vit.num_heads, dt,
                                 name=f"crossview{i}")(seq)
        seq = seq.reshape(v, gh * gw + 1, d)
        pose_tokens = seq[:, 0]
        feats[-1] = seq[:, 1:].reshape(v, gh, gw, d)

        heads = DualDPT(c, name="head")(feats)
        depth = jnp.clip(heads["depth"].astype(jnp.float32), 0.0,
                         c.max_depth)
        w2c, fov = CameraHead(dt, name="camera")(pose_tokens)
        out = {"depth": depth, "w2c": w2c, "xfov_deg": fov}
        if c.ray_head:
            out["rays"] = heads["rays"]
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
