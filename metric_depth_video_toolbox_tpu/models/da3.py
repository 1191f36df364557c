"""DA3-class multi-view depth + pose estimation (Flax).

Fills the role of Depth-Anything-3 (the reference's default engine,
video_da3.py): a batch of frames goes through a shared ViT with
cross-view attention; heads predict per-frame depth, per-frame camera
extrinsics (w2c) and FOV. The windowed video driver reproduces the
reference's batching exactly (video_da3.py:127-241):

  - batches of N frames + a few global reference frames spanning the clip
  - inter-batch depth-scale alignment (least-squares scalar on the shared
    reference depths)
  - inter-batch pose alignment: Umeyama sim3 over shared camera centers,
    then a last-frame weld for perceptual smoothness
    (use_last_frame_in_batch_to_align, :229-241)

Outputs per clip: metric depth (T, H, W), cam-to-world transforms
(T, 4, 4), xfovs (T,).
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
    cross_view_layers: int = 2
    max_depth: float = 100.0


DA3_TINY = DA3Config(vit=vit_mod.VIT_TINY, dpt=dpt_mod.DPT_TINY)


class CrossViewBlock(nn.Module):
    """Attention over all tokens of all views (the multi-view mixer)."""
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        """x: (V, N, D) -> attend over the flattened (V*N) token set."""
        v, n, d = x.shape
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        y = y.reshape(1, v * n, d)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")(y, y)
        x = x + y.reshape(v, n, d)
        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        z = nn.Dense(d * 2, dtype=self.dtype, name="fc1")(z)
        z = nn.Dense(d, dtype=self.dtype, name="fc2")(nn.gelu(z))
        return x + z


class DA3(nn.Module):
    cfg: DA3Config

    @nn.compact
    def __call__(self, frames):
        """frames: (V, H, W, 3) [0,1] -> dict with depth (V, H, W),
        w2c (V, 4, 4), xfov_deg (V,)."""
        c = self.cfg
        feats, cls = vit_mod.ViT(c.vit, name="backbone")(frames)
        v, gh, gw, d = feats[-1].shape
        dt = c.vit.compute_dtype

        # cross-view mixing on the last level
        f = feats[-1].reshape(v, gh * gw, d).astype(dt)
        for i in range(c.cross_view_layers):
            f = CrossViewBlock(d, c.vit.num_heads, dt,
                               name=f"crossview{i}")(f)
        feats[-1] = f.reshape(v, gh, gw, d)

        depth = dpt_mod.DPTHead(c.dpt, patch_size=c.vit.patch_size,
                                name="head")(feats)[..., 0]
        depth = jnp.clip(depth.astype(jnp.float32), 0.0, c.max_depth)

        # camera head from pooled multi-view features
        pooled = jnp.concatenate(
            [f.mean(axis=1), cls.astype(dt)], axis=-1)  # (V, 2D)
        h = nn.Dense(256, dtype=dt, name="cam_fc1")(pooled)
        h = nn.gelu(h)
        cam = nn.Dense(7, dtype=jnp.float32, name="cam_out")(h)
        rvec = cam[:, :3] * 0.1
        tvec = cam[:, 3:6]
        fov = 40.0 + 50.0 * nn.sigmoid(cam[:, 6])  # degrees, 40..90

        rots = jax.vmap(solvers._so3_exp)(rvec)
        w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32), (v, 1, 1))
        w2c = w2c.at[:, :3, :3].set(rots).at[:, :3, 3].set(tvec)
        return {"depth": depth, "w2c": w2c, "xfov_deg": fov}


class DA3Engine:
    """Windowed video driver with the reference's overlap stitching."""

    def __init__(self, cfg=None, params=None, images_per_batch=40,
                 overlap=6, num_ref_frames=6, resolution=504,
                 rng_seed=0):
        self.cfg = cfg or DA3_TINY
        self.model = DA3(self.cfg)
        self.images_per_batch = images_per_batch
        self.overlap = overlap
        self.num_ref_frames = num_ref_frames
        self.resolution = resolution
        self._params = params
        self._rng = jax.random.PRNGKey(rng_seed)
        self._apply = self.model.apply

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

        if self._params is None:
            x = jnp.zeros((v_total, wh, ww, 3))
            self._params = jax.jit(self.model.init)(self._rng, x)

        @jax.jit
        def run(params, batch_u8):
            x = batch_u8.astype(jnp.float32) / 255.0
            x = jax.image.resize(x, (batch_u8.shape[0], wh, ww, 3),
                                 "bilinear")
            out = self._apply(params, x)
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
            d, w2c, fov = robust_call(run, self._params,
                                      jnp.asarray(frames_u8[idx]))
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
        return depth_out, c2w_out, fov_out
