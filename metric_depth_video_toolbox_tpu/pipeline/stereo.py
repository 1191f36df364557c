"""Stereo rerenderer: depth+color video -> side-by-side 3D video.

Capability parity with the reference's ``stereo_rerender.py`` (the CPU hot
path, reference :471-944), re-designed as one fused device step per frame
*batch*:

    decode depth -> master-FOV scale -> unproject -> camera-motion cancel
    -> per-eye (toe-in convergence + IPD offset) -> forward-warp z-buffer
    -> edge-anchor splat -> infill-mask normals (border defaults + inpaint
    + masked blur) -> optional normal-march infill -> SBS/Touchly/VR180
    layout

The reference renders each eye through Open3D on one frame at a time; here
both eyes of B frames are one jit-compiled XLA program, vmapped over the
(eye-interleaved) batch and shardable over a device mesh ('data' axis =
frames). Host <-> device traffic is uint8 in, uint8 out.

Output naming matches the reference:
  <depth_video>_stereo.mkv            plain SBS
  <depth_video>_Touchly0.mkv          3-panel stereo + depth
  <depth_video>_Touchly1.mkv          mono over reversed 8-bit depth
  <depth_video>_stereo.mkv_infillmask.mkv   normal-encoded infill masks
  <depth_video>_stereo.mkv_depth.mkv        SBS depth video
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from metric_depth_video_toolbox_tpu.ops import codec
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import image as im
from metric_depth_video_toolbox_tpu.ops import infill as infill_ops
from metric_depth_video_toolbox_tpu.ops import rasterize
from metric_depth_video_toolbox_tpu.ops import tilepack as tile_mod
from metric_depth_video_toolbox_tpu.utils.host import (robust_call_select,
                                                       to_host)

GREEN = jnp.array([0.0, 1.0, 0.0], jnp.float32)


@dataclasses.dataclass(frozen=True)
class StereoConfig:
    """Static (compile-time) configuration of the stereo renderer."""
    width: int
    height: int
    out_width: int
    out_height: int
    max_depth: float = 100.0
    pupillary_distance_m: float = 0.063
    remove_edges: bool = True
    place_edge_points: bool = True
    make_infill_mask: bool = False
    green_and_black_infill_mask: bool = False
    do_basic_infill: bool = False
    touchly0: bool = False
    touchly1: bool = False
    touchly_max_depth: float = 5.0
    touchly_min_depth: float = 0.0
    vr180: bool = False
    subsample: int = 2
    infill_march_steps: int = 400
    inpaint_iters: int = 48
    # 'sweep'  = Pallas VMEM disparity sweep (fastest; valid when the only
    #            transform is the stereo eye shift [+ toe-in rotation],
    #            i.e. no per-frame camera transformations and not VR180)
    # 'forward' = scatter z-buffer (general transforms)
    # 'plane_sweep' = XLA gather sweep (reference implementation)
    warp_method: str = "sweep"
    num_planes: int = 128
    has_convergence: bool = True
    # 'shift' = HIT (horizontal image translation, free in the sweep);
    # 'rotate' = the reference's exact toe-in (rotation resample pre-pass)
    convergence_mode: str = "shift"
    # Render main surface + edge-anchor layer in ONE fused Pallas pass
    # (stereo_sweep_warp_dual) instead of a second anchor-only sweep at
    # num_planes//4. Measured (v5e, 1080p movie cfg, round 3): fused
    # 50.9 fps vs two-call 49.1 on piecewise-smooth scenes, but 31.1 vs
    # 43.3 on per-pixel-random depth (the edge stream rides the full
    # plane set). Default off = the two-call path: ~equal on real
    # content, 1.4x faster worst-case.
    fused_anchor_sweep: bool = False


# ---------------------------------------------------------------------------
# Device step (single frame; vmapped over the batch)
# ---------------------------------------------------------------------------

def _touchly_depth8(depth, mask, cfg: StereoConfig):
    """Reverse 8-bit depth panel (reference stereo_rerender.py:548-552,
    677-702): clip to [min,max], scale to 0..255, unrendered pixels -> far,
    then invert."""
    rng = cfg.touchly_max_depth - cfg.touchly_min_depth
    d8 = jnp.rint(jnp.maximum(
        0.0, jnp.minimum(depth, cfg.touchly_max_depth)
        - cfg.touchly_min_depth) * (255.0 / rng))
    d8 = jnp.where(mask, d8, 0.0)
    d8 = jnp.where(d8 == 0, 255.0, d8)
    d8 = 255.0 - d8
    return jnp.repeat(d8[..., None].astype(jnp.uint8), 3, axis=-1)


def _border_default_normals(mask_img, hole):
    """Screen-edge holes get inward-pointing default normals so infill pulls
    from inside the frame (reference stereo_rerender.py:796-799)."""
    h, w = hole.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    # value layout: encoded normal (n+1)/2 in RGB
    right_n = jnp.array([1.0, 0.5, 0.5], jnp.float32)   # points +x
    left_n = jnp.array([0.0, 0.5, 0.5], jnp.float32)    # points -x
    down_n = jnp.array([0.5, 0.5, 0.0], jnp.float32)
    up_n = jnp.array([0.5, 0.5, 1.0], jnp.float32)
    out = mask_img
    out = jnp.where(((col == 0) & hole)[..., None], right_n, out)
    out = jnp.where(((col == w - 1) & hole)[..., None], left_n, out)
    out = jnp.where(((row == 0) & hole)[..., None], down_n, out)
    out = jnp.where(((row == h - 1) & hole)[..., None], up_n, out)
    return out


def render_eye(depth, color, k, render_k, transform, eye_shift_m,
               conv_angle, cfg: StereoConfig, shared=None):
    """Render one eye of one frame. Returns (image f32 [0,1], depth f32,
    infill-mask normals image f32, hole mask bool).

    ``shared``: optional (edge_mask, normals) precomputed once per frame
    — both are eye-invariant and cost an unprojection each, so the
    two-eye caller computes them once."""
    edge_pre, normals_pre = shared if shared is not None else (None, None)
    sign = jnp.where(eye_shift_m < 0, -1.0, 1.0)  # left eye: shift -x
    # mesh-space equivalent of the reference's rotate(-conv);translate(+ipd/2)
    m_eye = geo.translation_matrix(-eye_shift_m, 0.0, 0.0) @ \
        geo.rotation_y(sign * conv_angle) @ transform

    rotate_conv = cfg.has_convergence and cfg.convergence_mode == "rotate"
    # HIT convergence: inverse depth of the convergence plane, from the
    # toe-in angle: tan(angle) = (ipd/2) / z_conv
    half_ipd = cfg.pupillary_distance_m / 2.0
    conv_inv_z = jnp.tan(conv_angle) / half_ipd

    fused_anchors = (cfg.fused_anchor_sweep and cfg.warp_method == "sweep"
                     and cfg.remove_edges and cfg.place_edge_points)
    a_color = a_extra = a_found = None
    if cfg.warp_method == "sweep":
        # Pallas fast path: same-camera re-render, x-only translation.
        # Convergence handling: 'shift' (default) = HIT folded into the
        # plane disparities (free); 'rotate' = the reference's exact
        # toe-in via a rotation-neutralizing resample (slower).
        m_sweep = m_eye if rotate_conv else \
            geo.translation_matrix(-eye_shift_m, 0.0, 0.0)
        if fused_anchors:
            # one kernel pass renders the main surface AND the
            # edge-anchor layer (color + encoded-normal seeds for the
            # infill, reference stereo_rerender.py:589-607, 745-814)
            normals = normals_pre if normals_pre is not None \
                else geo.normals_from_depth(depth, k)
            normals_t = jnp.einsum("ij,hwj->hwi", m_eye[:3, :3], normals)
            res, a_color, a_extra, a_found = \
                rasterize.stereo_sweep_warp_dual(
                    depth, color, (normals_t + 1.0) / 2.0, k, m_sweep,
                    num_planes=cfg.num_planes,
                    neutralize_rotation=rotate_conv,
                    conv_inv_z=0.0 if rotate_conv else conv_inv_z,
                    edge=edge_pre)
        else:
            res = rasterize.stereo_sweep_warp(
                depth, color, k, m_sweep,
                num_planes=cfg.num_planes,
                remove_edges=cfg.remove_edges,
                neutralize_rotation=rotate_conv,
                conv_inv_z=0.0 if rotate_conv else conv_inv_z,
                edge=edge_pre)
    elif cfg.warp_method == "plane_sweep":
        res = rasterize.plane_sweep_warp(
            depth, color, k, render_k, m_eye,
            (cfg.out_height, cfg.out_width),
            num_planes=cfg.num_planes,
            remove_edges=cfg.remove_edges,
            of_by_one=True)
    else:
        res = rasterize.forward_warp(
            depth, color, k, render_k, m_eye,
            (cfg.out_height, cfg.out_width),
            subsample=cfg.subsample,
            remove_edges=cfg.remove_edges,
            of_by_one=True)
    hole = ~res.mask
    image = jnp.where(hole[..., None], 0.0, res.color)

    mask_img = jnp.zeros((cfg.out_height, cfg.out_width, 3), jnp.float32)
    mask_img = jnp.where(hole[..., None], GREEN, mask_img)

    if cfg.place_edge_points and cfg.remove_edges:
        # Edge anchors: the culled silhouette pixels, re-rendered into the
        # holes so diffusion infill has color/normal seeds (reference
        # stereo_rerender.py:589-607, 745-814). On the sweep path the
        # anchor layer comes out of the SAME fused kernel pass as the
        # main surface (stereo_sweep_warp_dual); other warp methods use
        # a point splat.
        if fused_anchors:
            # anchor layer already rendered by the fused dual sweep
            write = a_found & hole
            image = jnp.where(write[..., None], a_color, image)
            if not cfg.green_and_black_infill_mask:
                a_n = a_extra * 2.0 - 1.0
                a_n = a_n / (jnp.linalg.norm(a_n, axis=-1,
                                             keepdims=True) + 1e-8)
                mask_img = jnp.where(write[..., None], (a_n + 1.0) / 2.0,
                                     mask_img)
        elif cfg.warp_method == "sweep":
            # second anchor-only sweep at num_planes//4 (coarser planes
            # suffice: anchors only seed infill). This is the fast
            # non-fused default — the scatter splat below costs
            # ~500 ms/frame at 1080p (ops/warp_pallas.py:5-8) and must
            # never run on the sweep path.
            normals = normals_pre if normals_pre is not None \
                else geo.normals_from_depth(depth, k)
            normals_t = jnp.einsum("ij,hwj->hwi", m_eye[:3, :3], normals)
            edge_depth = jnp.where(res.edge_mask, depth, 0.0)
            payload = jnp.concatenate(
                [color, (normals_t + 1.0) / 2.0], axis=-1)
            eres = rasterize.stereo_sweep_warp(
                edge_depth, payload, k,
                m_eye if rotate_conv else
                geo.translation_matrix(-eye_shift_m, 0.0, 0.0),
                num_planes=max(cfg.num_planes // 4, 8),
                remove_edges=False,
                neutralize_rotation=rotate_conv,
                conv_inv_z=0.0 if rotate_conv else conv_inv_z)
            write = eres.mask & hole
            image = jnp.where(write[..., None], eres.color[..., :3], image)
            if not cfg.green_and_black_infill_mask:
                a_n = eres.color[..., 3:] * 2.0 - 1.0
                a_n = a_n / (jnp.linalg.norm(a_n, axis=-1,
                                             keepdims=True) + 1e-8)
                mask_img = jnp.where(write[..., None], (a_n + 1.0) / 2.0,
                                     mask_img)
        else:
            normals = normals_pre if normals_pre is not None \
                else geo.normals_from_depth(depth, k)
            rot = m_eye[:3, :3]
            normals_t = jnp.einsum("ij,hwj->hwi", rot, normals)
            pts_cam = geo.unproject_depth(depth, k, of_by_one=False)
            pts_t = geo.transform_depth_map(pts_cam, m_eye)
            valid = res.edge_mask & (depth > 1e-4)
            n = cfg.height * cfg.width
            payload = jnp.concatenate([color, normals_t],
                                      axis=-1).reshape(n, 6)
            pts_flat = pts_t.reshape(n, 3)
            # invalidate non-edge points by pushing z behind the camera
            pts_flat = jnp.where(valid.reshape(n, 1), pts_flat,
                                 jnp.array([0.0, 0.0, -1.0]))
            anchor, _, amask = rasterize.splat_points(
                pts_flat, payload, render_k,
                (cfg.out_height, cfg.out_width))
            write = amask & hole
            image = jnp.where(write[..., None], anchor[..., :3], image)
            if not cfg.green_and_black_infill_mask:
                a_n = anchor[..., 3:]
                a_n = a_n / (jnp.linalg.norm(a_n, axis=-1,
                                             keepdims=True) + 1e-8)
                mask_img = jnp.where(write[..., None], (a_n + 1.0) / 2.0,
                                     mask_img)

    if cfg.make_infill_mask or cfg.do_basic_infill:
        if not cfg.green_and_black_infill_mask:
            mask_img = _border_default_normals(mask_img, hole)
            # pixels still green (no anchor/border normal) or black get
            # normals diffused in from the seeded ones
            # (reference stereo_rerender.py:806-808: TELEA + masked blur)
            is_green = jnp.all(mask_img == GREEN, axis=-1)
            is_black = jnp.all(mask_img == 0.0, axis=-1)
            # factor 8 + short refine: the normal field only needs to
            # reach across the widest disocclusion (~disparity px); each
            # coarse iter spans 8 px and the 5x5 masked blur below
            # smooths the seams (measured 14 -> 6 ms/frame both eyes)
            filled = im.inpaint_diffusion_multiscale(
                mask_img, is_green | is_black,
                coarse_iters=cfg.inpaint_iters // 3, fine_iters=2,
                factor=8)
            mask_img = jnp.where(is_green[..., None], filled, mask_img)
            keep = ~jnp.all(mask_img == 0.0, axis=-1)
            mask_img = im.masked_blur(mask_img, ksize=5, valid_mask=keep)
            # non-hole pixels stay black in the emitted mask
            mask_img = jnp.where(hole[..., None], mask_img, 0.0)

    if cfg.do_basic_infill:
        image = infill_ops.normal_march_infill(
            image, hole, mask_img * 2.0 - 1.0,
            max_steps=cfg.infill_march_steps)

    return image, res.depth, mask_img, hole


def stereo_frame(depth_rgb, color, k, render_k, transform, conv_depth,
                 master_scale, cfg: StereoConfig):
    """Full per-frame stereo step (both eyes). All inputs device arrays:

    depth_rgb: (H, W, 3) uint8 RGB-encoded depth frame
    color:     (H, W, 3) uint8
    k/render_k: (3, 3)
    transform: (4, 4) camera-motion cancel (identity if none)
    conv_depth: scalar convergence distance in meters (0 = none)
    master_scale: scalar depth scale for master FOV (1 = none)
    """
    depth = codec.decode_depth_frame(depth_rgb, cfg.max_depth) * master_scale
    colf = color.astype(jnp.float32) / 255.0

    conv_d = conv_depth * master_scale
    conv = jnp.where(conv_d > 0,
                     geo.convergence_angle(conv_d, cfg.pupillary_distance_m),
                     0.0)
    half = cfg.pupillary_distance_m / 2.0

    shared = None
    if cfg.warp_method == "sweep" and cfg.remove_edges:
        pts_cam = geo.unproject_depth(depth, k, of_by_one=False)
        shared = (rasterize.cell_edge_mask(pts_cam),
                  geo.normals_from_depth(depth, k)
                  if cfg.place_edge_points else None)

    if cfg.touchly1:
        # mono render over reversed depth panel (reference :548-552,677-702)
        img, dep, mask_img, hole = render_eye(
            depth, colf, k, render_k, transform, 0.0, 0.0, cfg, shared)
        depth_panel = _touchly_depth8(dep, ~hole, cfg)
        image = jnp.concatenate(
            [(img * 255).astype(jnp.uint8), depth_panel], axis=0)
        mask_out = jnp.concatenate(
            [(mask_img * 255).astype(jnp.uint8),
             jnp.zeros_like(depth_panel)], axis=0)
        return {"image": image, "infill_mask": mask_out,
                "depth_left": dep, "depth_right": dep}

    left_img, left_dep, left_mask, _ = render_eye(
        depth, colf, k, render_k, transform, -half, conv, cfg, shared)
    right_img, right_dep, right_mask, _ = render_eye(
        depth, colf, k, render_k, transform, +half, conv, cfg, shared)

    panels = [(left_img * 255).astype(jnp.uint8),
              (right_img * 255).astype(jnp.uint8)]
    mask_panels = [(left_mask * 255).astype(jnp.uint8),
                   (right_mask * 255).astype(jnp.uint8)]
    if cfg.touchly0:
        dpanel = _touchly_depth8(left_dep, left_dep < rasterize.INF_DEPTH,
                                 cfg)
        panels.append(dpanel)
        mask_panels.append(jnp.zeros_like(dpanel))

    image = jnp.concatenate(panels, axis=1)
    mask_out = jnp.concatenate(mask_panels, axis=1)
    return {"image": image, "infill_mask": mask_out,
            "depth_left": left_dep, "depth_right": right_dep}


def equirect_maps(h, w, input_fov_deg):
    """Precompute the VR180 rectilinear->equirect sampling grid
    (reference convert_to_equirectangular, stereo_rerender.py:25-86)."""
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    theta = (gx - cx) / cx * (np.pi / 2)
    phi = (gy - cy) / cy * (np.pi / 2)
    half = math.radians(input_fov_deg / 2.0)
    fx = cx / math.tan(half)
    fy = cy / math.tan(half)
    valid = (np.abs(theta) <= half) & (np.abs(phi) <= half)
    map_x = np.where(valid, fx * np.tan(theta) + cx, -10.0)
    map_y = np.where(valid, fy * np.tan(phi) + cy, -10.0)
    return np.stack([map_x, map_y], axis=-1).astype(np.float32)


def apply_equirect(img_u8, xy_map):
    out = im.bilinear_sample(img_u8.astype(jnp.float32), xy_map, fill=0.0)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------

def smooth_convergence(values):
    """NaN-fill + tail-extended Savitzky-Golay smoothing of per-frame
    convergence depths (reference stereo_rerender.py:244-268)."""
    from scipy.signal import savgol_filter
    v = np.asarray(values, np.float64).copy()
    nans = np.isnan(v)
    if nans.all():
        return np.zeros_like(v)
    if nans.any():
        idx = np.arange(v.size)
        good = idx[~nans]
        v[nans] = v[good[np.abs(good[None, :] - idx[nans, None]).argmin(1)]]
    n_tail = min(50, v.size)
    ext = np.concatenate([v, v[-n_tail:]])
    wl = min(100, ext.size)
    if wl % 2 == 0:
        wl -= 1
    if wl >= 3:
        sm = savgol_filter(ext, window_length=wl, polyorder=min(2, wl - 1))
        v = sm[:-n_tail] if n_tail else sm
    return v


def render_stereo_video(depth_video, color_video=None, output=None,
                        xfov=None, yfov=None, xfovs=None,
                        transformations=None, convergence_depths=None,
                        master_xfov=45.0, max_depth=100.0,
                        pupillary_distance_mm=63.0, max_frames=-1,
                        batch_size=8, infill_mask=False, vr180=False,
                        touchly0=False, touchly1=False, remove_edges=True,
                        do_basic_infill=False, place_edge_points=True,
                        green_and_black_infill_mask=False,
                        create_sbs_depth=False, touchly_max_depth=5.0,
                        touchly_min_depth=0.0,
                        transformation_lock_frame=0,
                        mask_video=None, save_background=False,
                        load_background=None,
                        render_as_pointcloud=False,
                        vr180_eye_size=1920, num_planes=128,
                        compressed=False, fused_anchor_sweep=False):
    """Stream a depth(+color) video through the device stereo step.

    Mirrors the reference CLI semantics (stereo_rerender.py argparse,
    :271-345) including output naming. Returns the output path.
    """
    from metric_depth_video_toolbox_tpu.io import video as vio

    dv = vio.VideoReader(depth_video, max_frames=max_frames)
    cv = vio.VideoReader(color_video) if color_video else None
    if cv is not None and (cv.width != dv.width or cv.height != dv.height):
        raise ValueError("depth video and color video must have the same size")

    if mask_video is not None or load_background is not None:
        dv.close()
        if cv is not None:
            cv.close()
        return _render_background_mode(
            depth_video, color_video, mask_video, output=output,
            xfov=xfov, yfov=yfov, transformations=transformations,
            convergence_depths=convergence_depths, max_depth=max_depth,
            pupillary_distance_mm=pupillary_distance_mm,
            max_frames=max_frames, save_background=save_background,
            load_background=load_background,
            infill_mask=infill_mask)

    h, w = dv.height, dv.width
    out_w, out_h = w, h
    render_fov = None
    if touchly0:
        vr180 = True
    if vr180:
        # per-eye equirect square (reference stereo_rerender.py:527-535)
        out_w = out_h = vr180_eye_size

    # the Pallas sweep path requires same-camera x-only warps: no
    # per-frame camera transformations and not VR180's separate render cam
    warp_method = ("sweep" if (transformations is None and not vr180)
                   else "forward")
    if render_as_pointcloud:
        # pure point splatting, no intra-cell interpolation (reference
        # stereo_rerender.py --render_as_pointcloud, :576-609)
        warp_method = "forward"
    cfg = StereoConfig(
        width=w, height=h, out_width=out_w, out_height=out_h,
        max_depth=max_depth,
        pupillary_distance_m=pupillary_distance_mm / 1000.0,
        remove_edges=remove_edges, place_edge_points=place_edge_points,
        make_infill_mask=infill_mask,
        green_and_black_infill_mask=green_and_black_infill_mask,
        do_basic_infill=do_basic_infill, touchly0=touchly0,
        touchly1=touchly1, touchly_max_depth=touchly_max_depth,
        touchly_min_depth=touchly_min_depth, vr180=vr180,
        warp_method=warp_method, num_planes=num_planes,
        subsample=1 if render_as_pointcloud else StereoConfig.subsample,
        has_convergence=convergence_depths is not None,
        fused_anchor_sweep=fused_anchor_sweep)

    if touchly1:
        suffix, out_size = "_Touchly1.mkv", (w, h * 2)
    elif touchly0:
        suffix, out_size = "_Touchly0.mkv", (out_w * 3, out_h)
    else:
        suffix, out_size = "_stereo.mkv", (out_w * 2, out_h)
    output = output or (depth_video + suffix)

    if transformations is not None:
        transformations = np.asarray(transformations, np.float32)
        if transformation_lock_frame != 0:
            ref_inv = np.linalg.inv(
                transformations[transformation_lock_frame])
            transformations = transformations @ ref_inv

    if convergence_depths is not None:
        convergence_depths = smooth_convergence(convergence_depths)

    # sparse mask transfer only helps when D2H is the bottleneck
    # (tunneled runtimes); equirect resampling needs the dense mask on
    # device anyway, so vr180 keeps the dense path
    pack_mask = infill_mask and not vr180 and _tunneled_runtime()
    # image tile-bitpack: same trade for the SBS image itself (vr180
    # re-warps on device, so it keeps the dense path)
    pack_img = _tunneled_runtime() and not vr180
    step = _cached_step(cfg, want_mask=infill_mask,
                        want_depth=create_sbs_depth,
                        pack_mask=pack_mask, pack_image=pack_img)
    fetch_keys = (["img_bids", "img_counts"] if pack_img else ["image"])
    if infill_mask:
        # mask_vals is NOT in the eager fetch: its static cap (H*W//5)
        # would transfer ~2.5 MB/frame even when holes are ~5%; the
        # driver slices vals[:, :bucket(max_count)] after reading the
        # counts (power-of-two buckets keep the XLA slice-program set
        # bounded)
        fetch_keys += (["mask_bits", "mask_count"]
                       if pack_mask else ["infill_mask"])
    if create_sbs_depth:
        fetch_keys.append("sbs_depth")

    eq_map = None

    # async host I/O: decode of batch N+1 and FFV1 encode of batch N-1
    # overlap the device compute on batch N (SURVEY.md §7 hard part (e);
    # the synchronous path measured decode-bound at 1080p)
    fps = dv.fps
    total = dv.frame_count if max_frames < 0 else min(max_frames,
                                                      dv.frame_count)
    dv.close()
    if cv is not None:
        cv.close()
    dv = vio.PrefetchingBatchReader(depth_video, batch_size,
                                    max_frames=max_frames)
    cv = (vio.PrefetchingBatchReader(color_video, batch_size)
          if color_video else None)

    writer = vio.AsyncVideoWriter(
        output, fps, *out_size,
        codec_fourcc="mp4v" if compressed else None)
    mask_writer = (vio.AsyncVideoWriter(output + "_infillmask.mkv", fps,
                                        *out_size) if infill_mask else None)
    depth_writer = (vio.AsyncVideoWriter(output + "_depth.mkv", fps,
                                         out_w * 2, out_h)
                    if create_sbs_depth else None)

    frame_n = 0
    try:
        while True:
            depth_rgb = dv.read_batch(batch_size)
            if depth_rgb is None:
                break
            color = (cv.read_batch(batch_size) if cv is not None
                     else depth_rgb)
            if color is None:
                break
            b = min(depth_rgb.shape[0], color.shape[0])
            depth_rgb = depth_rgb[:b]
            color = color[:b]

            ks, rks, tfs, convs, scales = [], [], [], [], []
            for i in range(b):
                fi = frame_n + i
                xf = xfovs[fi] if xfovs is not None else xfov
                k = np.asarray(geo.camera_matrix_from_fov(
                    w, h, xfov_deg=xf, yfov_deg=yf_or_none(xf, yfov)))
                rk = k
                frame_master = master_xfov
                if vr180:
                    fx, fy = geo.fov_from_camera_matrix(jnp.asarray(k))
                    render_fov = max(75.0, float(fx), float(fy))
                    frame_master = render_fov
                    rk = np.asarray(geo.camera_matrix_from_fov(
                        out_w, out_h, xfov_deg=render_fov,
                        yfov_deg=render_fov))
                scale_disp = (math.tan(math.radians(frame_master / 2))
                              / math.tan(math.radians(
                                  xf if xf else master_xfov) / 2))
                scales.append(1.0 / scale_disp)
                ks.append(k)
                rks.append(rk)
                tfs.append(transformations[fi] if transformations is not None
                           else np.eye(4, dtype=np.float32))
                convs.append(float(convergence_depths[fi])
                             if convergence_depths is not None else 0.0)

            out, out_dev = robust_call_select(
                step, jnp.asarray(depth_rgb), jnp.asarray(color),
                jnp.asarray(np.stack(ks), jnp.float32),
                jnp.asarray(np.stack(rks), jnp.float32),
                jnp.asarray(np.stack(tfs), jnp.float32),
                jnp.asarray(np.asarray(convs), jnp.float32),
                jnp.asarray(np.asarray(scales), jnp.float32),
                keys=fetch_keys)
            if pack_img:
                layout = tile_mod.PackLayout(b, out_size[1], out_size[0], 3)
                buckets = tile_mod.fetch_buckets(out, out_dev, to_host,
                                                 prefix="img_")
                images = tile_mod.unpack(out["img_bids"], buckets, layout)
            else:
                images = out["image"]
            masks = out.get("infill_mask")
            if pack_mask:
                mh, mw = images.shape[1], images.shape[2]
                cap = (mh * mw) // MASK_PACK_FRAC
                counts = out["mask_count"]
                mx = int(counts.max()) if b else 0
                if mx > 0:
                    bucket = min(cap, max(1 << 17, 1 << mx.bit_length()))
                    vals = to_host(out_dev["mask_vals"][:, :bucket])
                else:
                    vals = np.zeros((b, 1, 3), np.uint8)
                masks = np.empty((b, mh, mw, 3), np.uint8)
                for i in range(b):
                    if counts[i] > cap:  # rare: fetch dense
                        masks[i] = to_host(out_dev["infill_mask"][i])
                    else:
                        masks[i] = _unpack_mask_frame(
                            out["mask_bits"][i], vals[i],
                            int(counts[i]), mh, mw)

            if vr180 and render_fov is not None:
                if eq_map is None:
                    eq_map = jnp.asarray(equirect_maps(out_h, out_w,
                                                       render_fov))
                images = to_host(_equirect_batch(jnp.asarray(images),
                                                 eq_map, touchly0))
                if infill_mask:
                    masks = to_host(_equirect_batch(jnp.asarray(masks),
                                                    eq_map, touchly0))

            for i in range(images.shape[0]):
                writer.write(images[i])
                if mask_writer is not None:
                    mask_writer.write(masks[i])
            if depth_writer is not None:
                sbs_depth = out["sbs_depth"]
                for i in range(sbs_depth.shape[0]):
                    depth_writer.write(sbs_depth[i])
            frame_n += b
            if 0 <= max_frames <= frame_n:
                break
    finally:
        dv.close()
        if cv is not None:
            cv.close()
    writer.commit(min(frame_n, total) if total else frame_n)
    if mask_writer is not None:
        mask_writer.commit(frame_n)
    if depth_writer is not None:
        depth_writer.commit(frame_n)
    return output


_STEP_CACHE = {}


MASK_PACK_FRAC = 5  # packed-value cap = H*W // 5 (20% hole budget)


def _pack_mask_batch(mask_u8):
    """Sparse transfer encoding of the infill-mask image (device side).

    The mask is nonzero only at disocclusion holes (typically 2–10% of
    pixels), but a dense uint8 transfer costs 3 B/px — on tunneled
    runtimes (~5–25 MB/s D2H) that is seconds per 1080p batch. Pack it
    as (a) a 1 bit/px hole bitmap and (b) the hole pixels' values
    compacted to the front in raster order via a stable argsort (the
    repo-standard compact-worklist trick, ~5x faster than
    jnp.where(size=)), capped at H*W//MASK_PACK_FRAC entries. The host
    reconstructs the dense mask from np.unpackbits + one scatter; a
    frame whose hole count exceeds the cap is reported via ``count`` so
    the caller can fall back to fetching that frame's dense mask."""
    b, h, w, _ = mask_u8.shape
    k = (h * w) // MASK_PACK_FRAC
    hole = jnp.any(mask_u8 > 0, axis=-1)
    wpad = (-w) % 8
    hp = jnp.pad(hole, ((0, 0), (0, 0), (0, wpad)))
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    bits = (hp.reshape(b, h, -1, 8).astype(jnp.uint8)
            * weights).sum(-1).astype(jnp.uint8)
    flat = mask_u8.reshape(b, h * w, 3)
    hole_flat = hole.reshape(b, h * w)
    order = jnp.argsort(~hole_flat, axis=1)  # stable: raster order
    vals = jnp.take_along_axis(flat, order[:, :k, None], axis=1)
    count = hole_flat.sum(axis=1).astype(jnp.int32)
    return {"mask_bits": bits, "mask_vals": vals, "mask_count": count}


def _unpack_mask_frame(bits, vals, count, h, w):
    """Host-side inverse of _pack_mask_batch for one frame."""
    hole = np.unpackbits(bits, axis=-1)[:, :w].astype(bool)
    pos = np.flatnonzero(hole)
    dense = np.zeros((h * w, 3), np.uint8)
    dense[pos] = vals[:pos.size]
    return dense.reshape(h, w, 3)


def _tunneled_runtime():
    """Delegates to utils.host.tunneled_runtime (kept as a module
    symbol: tests monkeypatch it to exercise the packed paths)."""
    from metric_depth_video_toolbox_tpu.utils import host as host_mod
    return host_mod.tunneled_runtime()


def _cached_step(cfg, want_mask=True, want_depth=True, pack_mask=False,
                 pack_image=False):
    """Jitted batched stereo step, cached by config: a fresh jax.jit
    closure per render call would RECOMPILE the whole program every
    scene (measured ~100 s per movie scene on the remote-compile
    runtime).

    ``want_mask``/``want_depth`` prune the returned dict INSIDE the jit:
    outputs nobody writes are dead-code-eliminated by XLA and — the
    bigger win on tunneled runtimes — never transferred. The unpruned
    step fetched two full-res float32 depth maps per frame (~16.6
    MB/frame at 1080p) that the default driver discarded; the tunnel
    moves ~10 MB/s, so this alone dominated e2e wall time. Depth, when
    wanted, leaves the device already RGB-encoded SBS uint8 (6 B/px
    instead of the 8 B/px float pair). ``pack_mask`` additionally
    emits the sparse mask encoding (_pack_mask_batch); the driver then
    fetches the packed form and skips the dense 3 B/px mask unless a
    frame overflows the cap. ``pack_image`` additionally emits the
    lossless tile-bitpack transfer encoding of the SBS image itself
    (ops/tilepack.py) — on the tunneled runtime the 12.4 MB/frame
    dense image D2H is THE e2e bottleneck (BENCH_r03: 0.43 fps e2e vs
    50 fps device)."""
    key = (cfg, want_mask, want_depth, pack_mask, pack_image)
    step = _STEP_CACHE.get(key)
    if step is None:
        vstep = jax.vmap(partial(stereo_frame, cfg=cfg),
                         in_axes=(0, 0, 0, 0, 0, 0, 0))

        def pruned(*args):
            out = vstep(*args)
            res = {"image": out["image"]}
            if pack_image:
                res.update({"img_" + k: v for k, v in
                            tile_mod.pack(out["image"]).items()})
            if want_mask:
                res["infill_mask"] = out["infill_mask"]
                if pack_mask:
                    res.update(_pack_mask_batch(out["infill_mask"]))
            if want_depth:
                dl = codec.encode_depth_frame(out["depth_left"],
                                              cfg.max_depth)
                dr = codec.encode_depth_frame(out["depth_right"],
                                              cfg.max_depth)
                res["sbs_depth"] = jnp.concatenate([dl, dr], axis=2)
            return res

        step = jax.jit(pruned)
        _STEP_CACHE[key] = step
    return step


def yf_or_none(xf, yfov):
    return yfov if xf is None else None


def _equirect_batch(images_u8, eq_map, three_panel):
    """Apply the equirect warp per eye panel of a batch of SBS frames."""
    n_panels = 3 if three_panel else 2
    ph = images_u8.shape[1]
    pw = images_u8.shape[2] // n_panels
    fn = jax.jit(jax.vmap(lambda p: apply_equirect(p, eq_map)))
    panels = [to_host(fn(jnp.asarray(
        images_u8[:, :, i * pw:(i + 1) * pw]))) for i in range(n_panels)]
    del ph
    return np.concatenate(panels, axis=2)


# ---------------------------------------------------------------------------
# Background-accumulation mode (mask video -> compound background cloud)
# ---------------------------------------------------------------------------

def _render_background_mode(depth_video, color_video, mask_video,
                            output=None, xfov=None, yfov=None,
                            transformations=None, convergence_depths=None,
                            max_depth=100.0, pupillary_distance_mm=63.0,
                            max_frames=-1, save_background=False,
                            load_background=None, infill_mask=False,
                            downsample_every=10, voxel=0.003):
    """Accumulate the unmasked (background) pixels of every frame into a
    growing world-space point cloud and render *that* per frame — the
    reference's background mode (stereo_rerender.py:621-661, 946-947):
    foreground subjects are excluded via the mask, giving a clean plate
    whose renders feed infill. ``save_background`` writes
    ``<depth_video>_background.npy`` and skips rendering;
    ``load_background`` starts from a saved cloud.
    """
    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.ops import rasterize
    from metric_depth_video_toolbox_tpu.ops import voxel as voxel_mod

    dv = vio.VideoReader(depth_video, max_frames=max_frames)
    cv = vio.VideoReader(color_video) if color_video else None
    mv = vio.VideoReader(mask_video) if mask_video else None
    h, w = dv.height, dv.width
    k = jnp.asarray(np.asarray(geo.camera_matrix_from_fov(
        w, h, xfov_deg=xfov, yfov_deg=yfov), np.float32))
    half = pupillary_distance_mm / 2000.0

    bg_points = np.zeros((0, 3), np.float32)
    bg_colors = np.zeros((0, 3), np.float32)
    if load_background:
        loaded = np.load(load_background, allow_pickle=True)
        bg_points = np.asarray(loaded[0], np.float32).reshape(-1, 3)
        bg_colors = np.asarray(loaded[1], np.float32).reshape(-1, 3)

    @jax.jit
    def frame_points(depth_rgb, color_u8, transform):
        depth = codec.decode_depth_frame(depth_rgb, max_depth)
        pts_cam = geo.unproject_depth(depth, k)
        edge = rasterize.cell_edge_mask(pts_cam)
        world = geo.transform_depth_map(pts_cam, transform)
        keep = (~edge) & (depth > 1e-3)
        return world.reshape(-1, 3), \
            (color_u8.astype(jnp.float32) / 255.0).reshape(-1, 3), \
            keep.reshape(-1)

    @jax.jit
    def render_cloud(points, colors, transform_eye):
        pts = geo.transform_points(points[None], transform_eye)[0]
        img, dep, mask = rasterize.splat_points(pts, colors, k, (h, w),
                                                radius=1)
        return (jnp.clip(img * 255, 0, 255).astype(jnp.uint8), dep, mask)

    output = output or (depth_video + "_stereo.mkv")
    writer = None if save_background else vio.VideoWriter(
        output, dv.fps, w * 2, h)
    mask_writer = (vio.VideoWriter(output + "_infillmask.mkv", dv.fps,
                                   w * 2, h)
                   if infill_mask and not save_background else None)

    fr = 0
    while True:
        rgb = dv.read_batch(1)
        if rgb is None:
            break
        color = cv.read_batch(1) if cv is not None else rgb
        if color is None:
            break
        m = np.asarray(transformations[fr], np.float32) \
            if transformations is not None else np.eye(4, dtype=np.float32)

        if mv is not None:
            mk = mv.read_batch(1)
            fg = (mk[0].mean(-1) > 128) if mk is not None else \
                np.zeros((h, w), bool)
            world, cols, keep = [to_host(x) for x in frame_points(
                jnp.asarray(rgb[0]), jnp.asarray(color[0]),
                jnp.asarray(m))]
            keep = keep & ~fg.reshape(-1)
            bg_points = np.concatenate([bg_points, world[keep]], axis=0)
            bg_colors = np.concatenate([bg_colors, cols[keep]], axis=0)
            if (fr + 1) % downsample_every == 0:
                bg_points, bg_colors = voxel_mod.perspective_aware_downsample(
                    bg_points, bg_colors, voxel)

        if writer is not None and bg_points.shape[0]:
            # pad the cloud to the next power of two so the jitted render
            # doesn't recompile every frame as the cloud grows
            cap = 1 << int(np.ceil(np.log2(max(bg_points.shape[0], 1024))))
            pad = cap - bg_points.shape[0]
            pts_fixed = np.concatenate(
                [bg_points, np.tile([[0.0, 0.0, -1.0]], (pad, 1))],
                axis=0).astype(np.float32)
            cols_fixed = np.concatenate(
                [bg_colors, np.zeros((pad, 3), np.float32)], axis=0)
            conv = 0.0
            if convergence_depths is not None and fr < len(convergence_depths):
                d = float(convergence_depths[fr])
                if d > 0:
                    conv = float(np.arctan(half / d))
            panels = []
            mask_panels = []
            for sign, shift in ((-1.0, half), (1.0, -half)):
                m_eye = np.asarray(
                    geo.translation_matrix(shift, 0.0, 0.0)
                    @ geo.rotation_y(sign * -conv)
                    @ jnp.linalg.inv(jnp.asarray(m)))
                img, dep, msk = [to_host(x) for x in render_cloud(
                    jnp.asarray(pts_fixed), jnp.asarray(cols_fixed),
                    jnp.asarray(m_eye, dtype=jnp.float32))]
                panels.append(img)
                hole = (~msk * 255).astype(np.uint8)
                mask_panels.append(np.stack([np.zeros_like(hole), hole,
                                             np.zeros_like(hole)], -1))
            writer.write(np.concatenate(panels, axis=1))
            if mask_writer is not None:
                mask_writer.write(np.concatenate(mask_panels, axis=1))
        fr += 1

    dv.close()
    if cv is not None:
        cv.close()
    if mv is not None:
        mv.close()
    if save_background:
        np.save(depth_video + "_background.npy",
                np.array([bg_points, bg_colors], dtype=object))
        return depth_video + "_background.npy"
    writer.commit(fr)
    if mask_writer is not None:
        mask_writer.commit(fr)
    return output
