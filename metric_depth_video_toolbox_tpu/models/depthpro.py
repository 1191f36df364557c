"""DepthPro: multi-scale patch-encoder metric depth with a FOV head.

The reference wraps Apple DepthPro (reference depthpro_video.py:154-159
reads ``predicted_depth`` and ``focallength_px`` per frame). This is a
TPU-first Flax re-implementation of the same graph (the HF
``DepthProForDepthEstimation`` op order), weight-exact under
``models.convert.convert_depthpro_hf`` — verified numerically in
tests/test_weight_exact_depthpro.py.

Architecture (apple/DepthPro-hf):
- the input image is scaled to 3 ratios (0.25/0.5/1) and split into
  overlapping ``patch_size`` patches (1 + 9 + 25 = 35 patches at 1536px);
  ALL patches run through ONE DINOv2 tower as a single batch — ideal MXU
  work: one big (35*B, 577, 1024) transformer batch instead of the
  per-scale loop a naive port would write;
- patch features are merged back into per-scale maps (overlap trimming),
  two intermediate transformer depths are hooked for the fine levels;
- a second DINOv2 tower encodes the whole image at low res; a DPT-style
  fusion pyramid with deconvolutions decodes metric (canonical inverse)
  depth at input resolution;
- an optional third tower + conv head regresses the field of view
  (the reference converts it to focallength_px).

TPU notes: the three towers reuse ``vit.Block`` (bf16 matmuls, Pallas
flash attention with pad-once 512 alignment on TPU); the split/merge are
static-shape slices XLA folds into the surrounding convs. Weight
exactness is proven in float32 with attention_impl='xla'.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from metric_depth_video_toolbox_tpu.models import vit as vit_mod
from metric_depth_video_toolbox_tpu.models.vit import ViTConfig


@dataclasses.dataclass(frozen=True)
class DepthProConfig:
    # DINOv2 tower shared by the patch/image/fov encoders (HF uses one
    # Dinov2Config for all three in apple/DepthPro-hf)
    vit: ViTConfig = dataclasses.field(
        default_factory=lambda: dataclasses.replace(
            vit_mod.VIT_L, patch_size=16))
    vit_image_size: int = 384      # Dinov2 image_size == split patch size
    scaled_images_ratios: Sequence[float] = (0.25, 0.5, 1.0)
    scaled_images_overlap_ratios: Sequence[float] = (0.0, 0.5, 0.25)
    scaled_images_feature_dims: Sequence[int] = (1024, 1024, 512)
    intermediate_hook_ids: Sequence[int] = (11, 5)
    intermediate_feature_dims: Sequence[int] = (256, 256)
    fusion_hidden_size: int = 256
    merge_padding_value: int = 3
    num_fov_head_layers: int = 2
    use_fov: bool = True

    @property
    def out_size(self):
        return self.vit_image_size // self.vit.patch_size


DEPTHPRO_L = DepthProConfig()  # apple/DepthPro-hf working point (1536px)

DEPTHPRO_TINY = DepthProConfig(
    vit=ViTConfig(patch_size=8, embed_dim=32, depth=4, num_heads=2,
                  dtype="float32", attention_impl="xla"),
    vit_image_size=32,
    scaled_images_feature_dims=(16, 16, 16),
    intermediate_hook_ids=(3, 1),
    intermediate_feature_dims=(16, 16),
    fusion_hidden_size=16,
)


def _resize(x, hw):
    """torch F.interpolate(mode='bilinear', align_corners=False,
    antialias=False) over NHWC — jax half-pixel bilinear, antialias OFF
    (jax antialiases downscales by default; torch does not)."""
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[3]), "bilinear",
        antialias=False)


def _split_patches(x, ps, overlap):
    """HF split_to_patches: all (ps, ps) windows at
    stride = int(ps*(1-overlap)), PATCH-MAJOR over the batch (torch
    unfold -> permute(2,0,1) ordering: patch index varies slowest)."""
    b, h, w, _ = x.shape
    if h == ps and w == ps:
        return x
    stride = int(ps * (1 - overlap))
    boxes = []
    for top in range(0, h - ps + 1, stride):
        for left in range(0, w - ps + 1, stride):
            boxes.append(x[:, top:top + ps, left:left + ps, :])
    return jnp.concatenate(boxes, axis=0)


def _merge_patches(x, batch, padding):
    """HF merge_patches: tile patch-major patches back into one map,
    trimming ``padding`` from interior edges (the overlap regions)."""
    n, s, _, _ = x.shape
    if n == batch:
        return x
    nppb = n // batch
    side = int(nppb ** 0.5)
    if nppb < 4:
        padding = 0
    padding = min(s // 4, padding)
    rows = []
    i = 0
    for hh in range(side):
        cols = []
        for ww in range(side):
            box = x[batch * i: batch * (i + 1)]
            top = padding if hh != 0 else 0
            bot = padding if hh != side - 1 else 0
            left = padding if ww != 0 else 0
            right = padding if ww != side - 1 else 0
            box = box[:, top: s - bot, left: s - right, :]
            cols.append(box)
            i += 1
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def _reconstruct(tokens, batch, padding, out_hw):
    """HF reconstruct_feature_maps: drop cls, grid-ify, merge patches,
    bilinear to ``out_hw`` (identity at the production working point —
    the trim arithmetic lands exactly on the target size)."""
    n, seq, d = tokens.shape
    side = int(seq ** 0.5)
    x = tokens[:, -(side * side):, :].reshape(n, side, side, d)
    x = _merge_patches(x, batch, padding)
    return _resize(x, out_hw)


class DinoTokens(nn.Module):
    """DINOv2 tower returning the final-norm token sequence (cls first)
    plus RAW (un-normed) intermediate tokens at ``hooks`` — HF DepthPro
    hooks encoder hidden_states, which skip the final layernorm (unlike
    the get_intermediate_layers convention models.vit uses). Reuses
    vit.Block so convert_dinov2_hf maps weights unchanged; inputs are
    pre-normalized pixel values (the HF processor contract)."""
    cfg: ViTConfig
    hooks: Sequence[int] = ()

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        p = c.patch_size
        b, h, w, _ = x.shape
        gh, gw = h // p, w // p
        x = nn.Conv(c.embed_dim, (p, p), strides=(p, p),
                    dtype=c.compute_dtype, name="patch_embed")(
                        x.astype(c.compute_dtype))
        x = x.reshape(b, gh * gw, c.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, c.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.embed_dim)),
             x], axis=1)
        x = x + pos.astype(x.dtype)
        # pad-once 512 alignment for the Pallas flash kernel (see
        # models.vit) — masked out of attention, sliced off at extraction
        n_real = gh * gw + 1
        n_pad = ((-n_real) % 512
                 if (c.attention_impl == "flash"
                     and jax.default_backend() == "tpu") else 0)
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        wanted = set(self.hooks)
        raw = {}
        valid = (jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[1],), 0) < n_real) if n_pad else None
        for i in range(c.depth):
            x = vit_mod.Block(c, name=f"block{i}")(x, valid=valid)
            if i in wanted:
                raw[i] = x[:, :n_real]
        xn = nn.LayerNorm(dtype=jnp.float32, name="norm")(x[:, :n_real])
        return xn, [raw[i] for i in self.hooks]


class DepthProNet(nn.Module):
    """Returns (canonical_inverse_depth (B, H, W), fov_deg (B,) | None).

    Input: (B, S, S, 3) pre-normalized pixels (HF processor convention,
    mean=std=0.5), S a power-of-two multiple of out_size with
    min(ratios)*S >= vit_image_size (1536 in production)."""
    cfg: DepthProConfig

    @nn.compact
    def __call__(self, pixel):
        c = self.cfg
        b, h, w, _ = pixel.shape
        exp = int(math.log2(w / c.out_size))
        base_hw = (h // 2 ** exp, w // 2 ** exp)
        n_sc = len(c.scaled_images_ratios)
        fh = c.fusion_hidden_size

        # ---- patch encoder: one DINOv2 batch over every patch of every
        # scale (high-res patches first, the HF concatenation order)
        patches, counts = [], []
        for r, ov in zip(c.scaled_images_ratios,
                         c.scaled_images_overlap_ratios):
            s = (pixel if r == 1.0
                 else _resize(pixel, (int(h * r), int(w * r))))
            pt = _split_patches(s, c.vit_image_size, ov)
            patches.append(pt)
            counts.append(pt.shape[0])
        allp = jnp.concatenate(patches[::-1], axis=0)
        tokens, raws = DinoTokens(c.vit, hooks=c.intermediate_hook_ids,
                                  name="patch_encoder")(allp)
        splits = list(np.cumsum(counts[::-1])[:-1])
        per_scale = jnp.split(tokens, splits, axis=0)[::-1]

        feats = []
        for i, tk in enumerate(per_scale):
            pad = int(c.merge_padding_value
                      * (1 / c.scaled_images_ratios[i]))
            feats.append(_reconstruct(
                tk, b, pad, (base_hw[0] * 2 ** i, base_hw[1] * 2 ** i)))
        inter = []
        ipad = int(c.merge_padding_value / c.scaled_images_ratios[-1])
        ihw = (base_hw[0] * 2 ** (n_sc - 1), base_hw[1] * 2 ** (n_sc - 1))
        for tk in raws:  # merge takes the leading (high-res) patches
            inter.append(_reconstruct(tk, b, ipad, ihw))

        # ---- image encoder (whole image at tower resolution)
        img = _resize(pixel, (c.vit_image_size, c.vit_image_size))
        itokens, _ = DinoTokens(c.vit, name="image_encoder")(img)
        image_feat = _reconstruct(itokens, b, 0, base_hw)

        # ---- neck: upsample blocks, image+low-res fuse, projections
        ups = [nn.ConvTranspose(
            c.scaled_images_feature_dims[0], (2, 2), strides=(2, 2),
            use_bias=True, name="upsample_image")(image_feat)]
        for i in range(n_sc):
            d = c.scaled_images_feature_dims[i]
            x = nn.Conv(d, (1, 1), use_bias=False,
                        name=f"upsample_scaled{i}_proj")(feats[i])
            x = nn.ConvTranspose(d, (2, 2), strides=(2, 2),
                                 use_bias=False,
                                 name=f"upsample_scaled{i}_up0")(x)
            ups.append(x)
        for i, d in enumerate(c.intermediate_feature_dims):
            x = nn.Conv(fh if i == 0 else d, (1, 1), use_bias=False,
                        name=f"upsample_inter{i}_proj")(inter[i])
            for j in range(2 + i):
                x = nn.ConvTranspose(d, (2, 2), strides=(2, 2),
                                     use_bias=False,
                                     name=f"upsample_inter{i}_up{j}")(x)
            ups.append(x)

        glob = jnp.concatenate([ups[1], ups[0]], axis=-1)
        glob = nn.Conv(c.scaled_images_feature_dims[0], (1, 1),
                       use_bias=True, name="fuse_low")(glob)
        levels = [glob] + ups[2:]
        dims = (list(c.scaled_images_feature_dims)
                + list(c.intermediate_feature_dims))
        proj = []
        for i, f in enumerate(levels):
            if i == len(levels) - 1 and dims[i] == fh:
                proj.append(f)  # HF uses Identity when dims match
            else:
                proj.append(nn.Conv(fh, (3, 3), padding=1,
                                    use_bias=False,
                                    name=f"project{i}")(f))

        # ---- DPT-style fusion pyramid (deconv upsampling, global first)
        def rcu(x, name):
            y = nn.relu(x)
            y = nn.Conv(fh, (3, 3), padding=1, name=name + "_conv1")(y)
            y = nn.relu(y)
            y = nn.Conv(fh, (3, 3), padding=1, name=name + "_conv2")(y)
            return x + y

        fused = None
        for i in range(len(proj)):
            nm = f"fusion{i}"
            if fused is None:
                fused = proj[0]
            else:
                fused = fused + rcu(proj[i], nm + "_rcu1")
            fused = rcu(fused, nm + "_rcu2")
            if i < len(proj) - 1:
                fused = nn.ConvTranspose(fh, (2, 2), strides=(2, 2),
                                         use_bias=False,
                                         name=nm + "_deconv")(fused)
            fused = nn.Conv(fh, (1, 1), use_bias=True,
                            name=nm + "_project")(fused)

        # ---- depth head
        x = nn.Conv(fh // 2, (3, 3), padding=1, name="head_conv1")(fused)
        x = nn.ConvTranspose(fh // 2, (2, 2), strides=(2, 2),
                             use_bias=True, name="head_deconv")(x)
        x = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="head_conv3")(x)
        depth = nn.relu(x)[..., 0]

        if not c.use_fov:
            return depth, None

        # ---- FOV model: third tower + strided global features
        ftok, _ = DinoTokens(c.vit, name="fov_encoder")(img)
        ftok = nn.Dense(fh // 2, name="fov_neck")(ftok)
        ffeat = _reconstruct(ftok, b, 0, base_hw)
        g = nn.Conv(fh // 2, (3, 3), strides=(2, 2), padding=1,
                    name="fov_conv")(jax.lax.stop_gradient(proj[0]))
        g = nn.relu(g)
        x = ffeat + g
        x = _resize(x, (c.out_size, c.out_size))
        for i in range(c.num_fov_head_layers):
            x = nn.Conv(math.ceil(fh / 2 ** (i + 2)), (3, 3),
                        strides=(2, 2), padding=1,
                        name=f"fov_head{i}")(x)
            x = nn.relu(x)
        fk = int((c.out_size - 1) / 2 ** c.num_fov_head_layers + 1)
        x = nn.Conv(1, (fk, fk), padding=0, name="fov_head_final")(x)
        fov = x.reshape(b)
        return depth, fov


def working_size(cfg, target=None):
    """The square inference size: power-of-two multiple of out_size with
    min(ratio) * size >= vit_image_size (1536 for apple/DepthPro-hf)."""
    min_r = min(cfg.scaled_images_ratios)
    size = cfg.out_size
    while size * min_r < cfg.vit_image_size or (target and size < target):
        size *= 2
    return size
