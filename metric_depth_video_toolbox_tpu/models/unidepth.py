"""UniDepth-V2 / UniK3D class models (Flax).

The real-graph path for the reference's UniDepth and UniK3D engines
(unidepth_video.py:14 ``from unidepth.models import UniDepthV2``,
lpiccinelli/unidepth-v2-vitl14, ``model.infer(rgb, K)``;
unik3d_video.py:13 ``from unik3d.models import UniK3D``,
lpiccinelli/unik3d-vitl, ``model.infer(rgb, camera)``). Both share the
architecture family's three ideas, re-expressed TPU-first:

  1. a DINOv2 ViT backbone (models.vit — bf16 flash attention, static
     shapes, 4 tapped levels);
  2. camera self-prompting: intrinsics are PREDICTED by an attention-
     pooled camera head (or taken as given when the user passes a FOV,
     the ``infer(rgb, K)`` path the reference wrapper always uses for
     UniDepth), converted to per-patch unit rays, and embedded with a
     real spherical-harmonics basis (upstream's ``rsh_cart_8``);
  3. a ray-conditioned transformer decoder predicting log-range, so the
     geometry conditioning enters the DEPTH module, not the encoder.

UniDepthV2 predicts a pinhole camera + log-depth; UniK3D generalizes to
a dense angular field (per-pixel unit rays from its own head) + radial
log-distance, multiplying into a metric point map — which is exactly the
(points, confidence) contract pipeline/depth.py's unik3d variant
post-processes (per-frame focal refit, unik3d_video.py:22-101).

Checkpoint layout consumed by ``models.convert.convert_unidepth`` /
``convert_unik3d`` (torch mirror + forward-equivalence proof:
tests/test_weight_exact_unidepth.py):

  backbone.*                DINOv2 keys (blocks.N.attn.qkv, ...)
  camera.in_proj            Linear D -> dim on the last-level tokens
  camera.queries            (nq, dim) learned camera query tokens
  camera.{q,k,v,out}_proj   single-head cross-attention: queries attend
                            to the projected image tokens
  camera.mlp1 / mlp2        (nq*dim -> hidden -> 4) pinhole head:
                            [log fx, log fy, atanh cx', atanh cy']
                            in normalized units (span = max(h, w))
  depth.projects.{0..3}     Linear D -> dim per tapped level (summed)
  depth.ray_mlp1 / ray_mlp2 SH(deg)^2 -> dim -> dim ray embedding MLP
  depth.blocks.{i}          DINOv2-style transformer blocks over the
                            ray-conditioned patch tokens (norm1,
                            attn.qkv/proj, ls1/ls2.gamma, norm2,
                            mlp.fc1/fc2)
  depth.upsample{i}/upconv{i}  x2 ConvTranspose + Conv3x3 stages
  depth.out_conv1/out_conv2    Conv3x3(dim_last -> C) -> ReLU ->
                               Conv1x1(C -> 2): log-depth + confidence

UniK3D swaps the pinhole camera head for a dense one and splits decoding:

  angular.projects.{0..3} / blocks.{i} / out   per-patch unnormalized
      ray directions, bilinearly lifted to full res then normalized
  radius.projects / ray_mlp1/2 / blocks / upsample / out_conv{1,2}
      log-radius + confidence conditioned on the PREDICTED rays' SH
      embedding; points = rays * exp(log_radius)

TPU mapping: decoder tokens are gh*gw (~1.4k at 518px/14) — XLA
attention (no 512-padding needed); all convs NHWC; SH basis is a chain
of fused multiply-adds evaluated by recurrence (no trig, no gathers).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import vit as vit_mod


@dataclasses.dataclass(frozen=True)
class UniDepthConfig:
    vit: vit_mod.ViTConfig = vit_mod.VIT_L
    dim: int = 512
    num_heads: int = 8
    num_blocks: int = 4
    num_angular_blocks: int = 2
    num_cam_queries: int = 4
    camera_hidden: int = 256
    sh_degree: int = 8          # upstream rsh_cart_8 -> 81 features
    dim_upsample: Sequence[int] = (256, 128)
    last_conv_channels: int = 32

    @property
    def block_cfg(self):
        # decoder blocks reuse the DINOv2 block graph (and therefore the
        # converter's block mapping); token count is far below the flash
        # kernel's padding sweet spot, so force XLA attention
        return dataclasses.replace(
            self.vit, embed_dim=self.dim, num_heads=self.num_heads,
            attention_impl="xla")


UNIDEPTH_L = UniDepthConfig()
UNIDEPTH_TINY = UniDepthConfig(
    vit=vit_mod.VIT_TINY, dim=32, num_heads=4, num_blocks=2,
    num_angular_blocks=1, num_cam_queries=2, camera_hidden=16,
    sh_degree=2, dim_upsample=(12, 8), last_conv_channels=8)


def rsh_cart(xyz, degree):
    """Real spherical harmonics of unit vectors, cartesian inputs:
    (..., 3) -> (..., (degree+1)^2), ordered (l, m) with m = -l..l
    (upstream unidepth.utils.sht.rsh_cart_8 convention: Y_0 = 0.2821,
    l=1 -> [-0.4886 y, 0.4886 z, -0.4886 x], Condon-Shortley phase).

    Evaluated by recurrence instead of an unrolled polynomial table:
    P~_l^m(z) = P_l^m / sin^m(theta) stays polynomial in z, and
    s^m (cos m*phi, sin m*phi) = Re/Im[(x + i y)^m] — so the whole basis
    is a static chain of multiply-adds XLA fuses into the consuming
    matmul. No trig, float32.
    """
    xyz = xyz.astype(jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    one = jnp.ones_like(z)
    inv4pi = 1.0 / (4.0 * math.pi)

    # legendre[(l, m)] = P~_l^m(z), with the (-1)^m CS phase folded in
    legendre = {(0, 0): one}
    for m in range(0, degree + 1):
        if m > 0:
            legendre[(m, m)] = (legendre[(m - 1, m - 1)]
                                * (-(2.0 * m - 1.0)))
        if m + 1 <= degree:
            legendre[(m + 1, m)] = z * (2.0 * m + 1.0) * legendre[(m, m)]
        for l in range(m + 2, degree + 1):
            legendre[(l, m)] = ((2.0 * l - 1.0) * z * legendre[(l - 1, m)]
                                - (l - 1.0 + m) * legendre[(l - 2, m)]
                                ) / (l - m)

    # azimuthal factors: C_m = s^m cos(m phi), S_m = s^m sin(m phi)
    cos_m = {0: one}
    sin_m = {0: jnp.zeros_like(z)}
    for m in range(1, degree + 1):
        cos_m[m] = cos_m[m - 1] * x - sin_m[m - 1] * y
        sin_m[m] = sin_m[m - 1] * x + cos_m[m - 1] * y

    feats = []
    for l in range(degree + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            n = math.sqrt((2.0 * l + 1.0) * inv4pi
                          * math.factorial(l - am)
                          / math.factorial(l + am))
            if m != 0:
                n *= math.sqrt(2.0)
            base = legendre[(l, am)] * n
            feats.append(base * (sin_m[am] if m < 0 else cos_m[am]))
    return jnp.stack(feats, axis=-1)


def patch_uv(gh, gw, dtype=jnp.float32):
    """(gh, gw, 2) patch-center coordinates in the normalized_uv
    convention (span = max axis; ops/geometry.py:389)."""
    span = float(max(gh, gw))
    u = (2.0 * (jnp.arange(gw, dtype=jnp.float32) + 0.5) - gw) / span
    v = (2.0 * (jnp.arange(gh, dtype=jnp.float32) + 0.5) - gh) / span
    uu = jnp.broadcast_to(u[None, :], (gh, gw))
    vv = jnp.broadcast_to(v[:, None], (gh, gw))
    return jnp.stack([uu, vv], axis=-1).astype(dtype)


def rays_from_pinhole(cam4, gh, gw):
    """(B, 4) normalized pinhole [fx, fy, cx, cy] -> (B, gh, gw, 3)
    unit rays at patch centers (normalized-uv units, span = max axis)."""
    uv = patch_uv(gh, gw)[None]
    fx = cam4[:, 0][:, None, None]
    fy = cam4[:, 1][:, None, None]
    cx = cam4[:, 2][:, None, None]
    cy = cam4[:, 3][:, None, None]
    dx = (uv[..., 0] - cx) / fx
    dy = (uv[..., 1] - cy) / fy
    d = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


class CameraHead(nn.Module):
    """Attention-pooled pinhole head: nq learned queries cross-attend to
    the projected last-level tokens; an MLP maps the pooled state to
    [log fx, log fy, atanh cx', atanh cy'] (normalized units)."""
    cfg: UniDepthConfig

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        dt = c.vit.compute_dtype
        b = tokens.shape[0]
        x = nn.Dense(c.dim, dtype=dt, name="in_proj")(tokens.astype(dt))
        q0 = self.param("queries", nn.initializers.normal(0.02),
                        (c.num_cam_queries, c.dim))
        q = nn.Dense(c.dim, dtype=dt, name="q_proj")(
            jnp.broadcast_to(q0.astype(dt), (b,) + q0.shape))
        k = nn.Dense(c.dim, dtype=dt, name="k_proj")(x)
        v = nn.Dense(c.dim, dtype=dt, name="v_proj")(x)
        a = jax.nn.softmax(
            (q @ k.transpose(0, 2, 1)).astype(jnp.float32)
            / math.sqrt(c.dim), axis=-1)
        h = nn.Dense(c.dim, dtype=dt, name="out_proj")(
            a.astype(dt) @ v)
        h = h.reshape(b, c.num_cam_queries * c.dim)
        h = nn.Dense(c.camera_hidden, dtype=dt, name="mlp1")(h)
        p = nn.Dense(4, dtype=jnp.float32, name="mlp2")(
            nn.gelu(h, approximate=False))
        # fx, fy positive around a ~53deg-xfov prior; principal point
        # bounded to the central half of the image
        f = jnp.exp(jnp.clip(p[:, :2], -3.0, 3.0))
        cxy = jnp.tanh(p[:, 2:]) * 0.5
        return jnp.concatenate([f, cxy], axis=-1)


class TokenDecoder(nn.Module):
    """Summed level projections (+ optional SH ray conditioning) ->
    transformer blocks over the patch tokens -> (B, gh, gw, dim)."""
    cfg: UniDepthConfig
    num_blocks: int
    with_rays: bool

    @nn.compact
    def __call__(self, feats, rays=None):
        c = self.cfg
        dt = c.vit.compute_dtype
        b, gh, gw, _ = feats[0].shape
        x = sum(nn.Dense(c.dim, dtype=dt, name=f"project{i}")(
            f.astype(dt)) for i, f in enumerate(feats))
        if self.with_rays:
            sh = rsh_cart(rays, c.sh_degree)
            r = nn.Dense(c.dim, dtype=dt, name="ray_mlp1")(sh.astype(dt))
            r = nn.Dense(c.dim, dtype=dt,
                         name="ray_mlp2")(nn.gelu(r, approximate=False))
            x = x + r
        x = x.reshape(b, gh * gw, c.dim)
        bc = c.block_cfg
        for i in range(self.num_blocks):
            x = vit_mod.Block(bc, name=f"block{i}")(x)
        return x.reshape(b, gh, gw, c.dim).astype(jnp.float32)


class PixelHead(nn.Module):
    """x2-upsampling conv stack -> (B, gh*2^n, gw*2^n, n_out) f32."""
    cfg: UniDepthConfig
    n_out: int = 2

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = c.vit.compute_dtype
        x = x.astype(dt)
        for i, ch in enumerate(c.dim_upsample):
            x = nn.ConvTranspose(ch, (2, 2), strides=(2, 2), dtype=dt,
                                 name=f"upsample{i}")(x)
            x = nn.gelu(nn.Conv(ch, (3, 3), dtype=dt,
                                name=f"upconv{i}")(x), approximate=False)
        x = nn.Conv(c.last_conv_channels, (3, 3), dtype=dt,
                    name="out_conv1")(x)
        return nn.Conv(self.n_out, (1, 1), dtype=jnp.float32,
                       name="out_conv2")(nn.relu(x))


class DepthModule(nn.Module):
    cfg: UniDepthConfig

    @nn.compact
    def __call__(self, feats, rays):
        x = TokenDecoder(self.cfg, self.cfg.num_blocks, True,
                         name="tokens")(feats, rays)
        return PixelHead(self.cfg, 2, name="pixel")(x)


class UniDepthNet(nn.Module):
    """(B, H, W, 3) [0,1] -> (depth (B, H, W) metric, confidence
    (B, H, W), cam4 (B, 4) normalized pinhole). ``rays``: optional
    (B, gh, gw, 3) given-camera patch rays (the reference wrapper's
    mandatory-K path, unidepth_video.py:70-74); the camera head still
    runs (its prediction is returned) but the given rays condition the
    depth module, exactly upstream ``infer(rgb, K)``."""
    cfg: UniDepthConfig

    @nn.compact
    def __call__(self, images, rays=None):
        c = self.cfg
        b, h, w, _ = images.shape
        p = c.vit.patch_size
        gh, gw = h // p, w // p
        feats, _cls = vit_mod.ViT(c.vit, name="backbone")(images)
        cam4 = CameraHead(c, name="camera")(
            feats[-1].reshape(b, gh * gw, c.vit.embed_dim))
        use_rays = rays if rays is not None \
            else rays_from_pinhole(cam4, gh, gw)
        out = DepthModule(c, name="depth")(feats, use_rays)
        out = jax.image.resize(out, (b, h, w, 2), "bilinear")
        depth = jnp.exp(jnp.clip(out[..., 0], -8.0, 8.0))
        return depth, out[..., 1], cam4


class UniK3DNet(nn.Module):
    """(B, H, W, 3) [0,1] -> (points (B, H, W, 3) metric, conf_logit
    (B, H, W)) — the pipeline's point-head contract (pipeline/depth.py
    variant='unik3d'). Dense angular field (own head, any-camera) times
    a radial log-distance field, the UniK3D factorization."""
    cfg: UniDepthConfig

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        b, h, w, _ = images.shape
        p = c.vit.patch_size
        gh, gw = h // p, w // p
        feats, _cls = vit_mod.ViT(c.vit, name="backbone")(images)
        ang = TokenDecoder(c, c.num_angular_blocks, False,
                           name="angular")(feats)
        # bias INIT toward forward-facing rays so the normalization is
        # sane at random init; the op graph itself matches upstream
        # UniK3D (no constant offset), so converted lpiccinelli/unik3d
        # checkpoints — whose bias replaces this init — reproduce the
        # upstream ray field exactly (ADVICE r3 #2).
        dirs = nn.Dense(
            3, dtype=jnp.float32, name="angular_out",
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                [0.0, 0.0, 1.0], dtype))(ang)
        patch_rays = dirs / jnp.linalg.norm(dirs, axis=-1,
                                            keepdims=True)
        x = TokenDecoder(c, c.num_blocks, True,
                         name="radius_tokens")(feats, patch_rays)
        out = PixelHead(c, 2, name="radius_pixel")(x)
        out = jax.image.resize(out, (b, h, w, 2), "bilinear")
        radius = jnp.exp(jnp.clip(out[..., 0], -8.0, 8.0))
        rays_full = jax.image.resize(patch_rays, (b, h, w, 3),
                                     "bilinear")
        rays_full = rays_full / jnp.linalg.norm(rays_full, axis=-1,
                                                keepdims=True)
        points = rays_full * radius[..., None]
        return points, out[..., 1]
