"""Novel-view rendering of depth videos (reference 3d_view_depthfile.py).

The reference opens an interactive Open3D window or renders the scene
from a free camera to a video (``--render``). On TPU the render path is
the same forward-warp z-buffer as the stereo renderer; the 'interactive'
path is replaced by offline rendering from a parameterized camera
(position + look-at), which covers the reference's scripted-camera use
(--x/y/z/tx/ty/tz, cam_look_at).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import pointcloud as pcio
from metric_depth_video_toolbox_tpu.io import sidecar
from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.ops import codec
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import rasterize
from metric_depth_video_toolbox_tpu.utils.host import robust_call


def render_novel_view_video(depth_video, color_video=None, output=None,
                            xfov=50.0, yfov=None, max_depth=100.0,
                            camera_pos=(0, 0, 0),
                            look_at_target=None, transformations=None,
                            mask_video=None, invert_mask=False,
                            background_ply=None, as_pointcloud=False,
                            max_frames=-1, batch_size=8,
                            remove_edges=False, show_camera=False,
                            draw_frame=-1, compressed=False,
                            transformation_lock_frame=0):
    """Render every frame from a free camera. Returns the output path."""
    dv = vio.VideoReader(depth_video, max_frames=max_frames)
    cv = vio.VideoReader(color_video) if color_video else None
    mv = vio.VideoReader(mask_video) if mask_video else None
    h, w = dv.height, dv.width
    k = jnp.asarray(np.asarray(geo.camera_matrix_from_fov(
        w, h, xfov_deg=xfov, yfov_deg=yfov), np.float32))

    if transformations is not None and transformation_lock_frame != 0:
        tf = np.asarray(transformations, np.float32)
        transformations = tf @ np.linalg.inv(
            tf[transformation_lock_frame])

    eye = np.asarray(camera_pos, np.float32)
    if look_at_target is not None:
        view = np.asarray(geo.look_at(jnp.asarray(eye),
                                      jnp.asarray(look_at_target,
                                                  np.float32)
                                      if not isinstance(look_at_target,
                                                        jnp.ndarray)
                                      else look_at_target,
                                      jnp.asarray([0.0, -1.0, 0.0])))
        # convert GL view (looks down -Z) to CV camera (looks down +Z)
        flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        cam = flip @ view
    else:
        cam = np.eye(4, dtype=np.float32)
        cam[:3, 3] = -eye

    bg_pts = bg_cols = None
    if background_ply:
        bg_pts, bg_cols = pcio.read_ply(background_ply)
        if bg_cols is None:
            bg_cols = np.full_like(bg_pts, 128)

    @partial(jax.jit, static_argnames=())
    def step(depth_rgb, color, transform):
        depth = codec.decode_depth_frame(depth_rgb, max_depth)
        colf = color.astype(jnp.float32) / 255.0
        m = jnp.asarray(cam) @ transform
        if as_pointcloud:
            pts = geo.transform_depth_map(
                geo.unproject_depth(depth, k), m)
            img, dep, mask = rasterize.splat_points(
                pts.reshape(-1, 3), colf.reshape(-1, 3), k, (h, w))
        else:
            res = rasterize.forward_warp(depth, colf, k, k, m, (h, w),
                                         subsample=2, remove_edges=True)
            img, dep, mask = res.color, res.depth, res.mask
        return (jnp.clip(img * 255, 0, 255).astype(jnp.uint8),
                dep, mask)

    vstep = jax.jit(jax.vmap(step))
    output = output or (depth_video + "_render.mkv")
    writer = vio.VideoWriter(output, dv.fps, w, h,
                             codec_fourcc="mp4v" if compressed else "FFV1")
    n = 0
    src_frame_n = 0
    while True:
        rgb = dv.read_batch(batch_size)
        if rgb is None:
            break
        b = rgb.shape[0]
        color = cv.read_batch(b) if cv is not None else rgb
        if color is None:
            break
        if mv is not None:
            m = mv.read_batch(b)
            if m is not None:
                sel = m.mean(-1) > 128
                if invert_mask:
                    sel = ~sel
                color = np.where(sel[..., None], color, 0)
        tfs = (np.asarray(transformations[src_frame_n:src_frame_n + b],
                          np.float32)
               if transformations is not None
               else np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)))
        if draw_frame >= 0 and not (
                src_frame_n <= draw_frame < src_frame_n + b):
            src_frame_n += b
            continue
        imgs, deps, _ = robust_call(vstep, jnp.asarray(rgb),
                                    jnp.asarray(color), jnp.asarray(tfs))
        imgs = np.asarray(imgs)
        for i in range(b):
            if draw_frame >= 0 and src_frame_n + i != draw_frame:
                continue
            frame = imgs[i]
            if show_camera:
                frame = _draw_camera_frustum(
                    frame.copy(), k, cam, tfs[i],
                    far=float(np.asarray(deps[i]).max()))
            writer.write(frame)
            n += 1
        src_frame_n += b
    dv.close()
    if cv is not None:
        cv.close()
    if mv is not None:
        mv.close()
    writer.commit(n)
    return output

def _draw_camera_frustum(frame, k, view_cam, transform, far=10.0):
    """Draw the source camera's frustum as line segments into the render
    (reference 3d_view_depthfile.py:170-176 — frustum scaled by the
    rolling max depth). Host-side (a handful of lines per frame)."""
    kn = np.asarray(k)
    h, w = frame.shape[:2]
    far = float(np.clip(far, 0.5, 1e4))
    corners = np.asarray(geo.frustum_corners(jnp.asarray(kn), w, h,
                                             near=far * 0.02, far=far,
                                             cam_to_world=jnp.asarray(
                                                 transform)))
    cam = np.asarray(view_cam)
    pts = corners @ cam[:3, :3].T + cam[:3, 3]
    z = np.maximum(pts[:, 2], 1e-6)
    uv = (pts[:, :2] * np.asarray([kn[0, 0], kn[1, 1]]) / z[:, None]
          + np.asarray([kn[0, 2], kn[1, 2]]))
    edges = [(0, 1), (1, 2), (2, 3), (3, 0),
             (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for a, b in edges:
        if pts[a, 2] <= 1e-6 or pts[b, 2] <= 1e-6:
            continue
        steps = 64
        for t in np.linspace(0.0, 1.0, steps):
            x = int(round(uv[a, 0] * (1 - t) + uv[b, 0] * t))
            y = int(round(uv[a, 1] * (1 - t) + uv[b, 1] * t))
            if 0 <= x < w and 0 <= y < h:
                frame[y, x] = (255, 60, 60)
    return frame
