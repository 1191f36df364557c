"""Exporter / triangulator: depth video -> grayscale exports, per-frame
point clouds & meshes, multi-ray triangulated clouds, rescaled depth.

Capability parity with reference
``convert_metric_depth_video_to_other_format.py`` (call stack SURVEY.md
§3.5):

  pass 1: per frame, decode depth -> unproject (+transform) -> collect
          per-track camera origins + rays + colors (:688-730); optional
          .ply/.obj per-frame exports
  pass 2: per track with >= min observations, weighted multi-ray
          intersection with angle-diversity weights (:794-828) ->
          *_triangulated.ply + *_avgmonodepth.ply
  pass 3: optional depth rescaling to the triangulated truth: per-frame
          mean-ratio scale (:884-891) or global inverse-depth scale+shift
          (:895-931) -> *_rescaled.mkv

TPU-first: rays for ALL tracks of a frame batch are gathered with one
device program; the per-track intersections run as one vmapped solve over
a dense (tracks, max_obs) tensor instead of the reference's per-track
Python loop. Union-find near-point merging stays on host (tiny).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import pointcloud as pcio
from metric_depth_video_toolbox_tpu.io import sidecar
from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.ops import codec
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import solvers
from metric_depth_video_toolbox_tpu.utils.host import robust_call, to_host


@jax.jit
def _frame_rays(depth, pts_2d, valid, k, transform):
    """For one frame: camera origin + world-space rays through each track
    point, plus the world-space 3D point at the tracked depth."""
    z = depth[jnp.clip(jnp.round(pts_2d[:, 1]).astype(jnp.int32), 0,
                       depth.shape[0] - 1),
              jnp.clip(jnp.round(pts_2d[:, 0]).astype(jnp.int32), 0,
                       depth.shape[1] - 1)]
    p3 = geo.unproject_2d_points(pts_2d, z, k)
    world = geo.transform_points(p3[None], transform)[0]
    origin = transform[:3, 3]
    rays = world - origin
    rays = rays / (jnp.linalg.norm(rays, axis=-1, keepdims=True) + 1e-12)
    ok = valid * (z > 1e-4)
    return origin, rays, world, z, ok


def export_video(depth_video, tracking_file=None, transformation_file=None,
                 color_video=None, xfov=None, yfov=None, max_depth=100.0,
                 max_frames=-1, save_ply_every=0, save_obj_every=0,
                 min_observations=10, triangulate=False,
                 save_rescaled_depth=False, global_align=False,
                 grayscale=False, bit16_grayscale=False,
                 remove_edges=True, output_prefix=None, max_tracks=8192,
                 min_frames=-1, lock_frame=0, mask_video=None,
                 strict_mask=False, merge_close_points=False,
                 ply_dir=None, obj_dir=None, save_normals=False):
    """Multi-purpose exporter. Returns a dict of produced paths."""
    out = {}
    prefix = output_prefix or depth_video
    dv = vio.VideoReader(depth_video, max_frames=max_frames)
    cv = vio.VideoReader(color_video) if color_video else None
    h, w = dv.height, dv.width
    k = jnp.asarray(np.asarray(geo.camera_matrix_from_fov(
        w, h, xfov_deg=xfov, yfov_deg=yfov), np.float32)) \
        if (xfov or yfov) else jnp.asarray(np.asarray(
            geo.camera_matrix_from_fov(w, h, xfov_deg=50.0), np.float32))

    transforms = None
    if transformation_file:
        transforms = sidecar.load_transformations(transformation_file)
        if lock_frame:
            # re-base every pose on the lock frame (reference :599-602)
            inv_lock = np.linalg.inv(transforms[lock_frame])
            transforms = [t @ inv_lock for t in transforms]

    dense = None
    if tracking_file:
        frames_tr = sidecar.load_tracking(tracking_file)
        dense, _ = sidecar.tracking_to_dense(frames_tr,
                                             max_tracks=max_tracks)
        if mask_video:
            dense = _mask_filter_tracks(dense, mask_video, strict_mask)

    dec = jax.jit(lambda rgb: codec.decode_depth_frame(
        rgb, max_depth, average_rg=True))

    # accumulators for triangulation: per track, per observation
    track_origins = []
    track_rays = []
    track_world = []
    track_valid = []
    all_depths = []  # only kept if rescaling needs a second pass
    depth_frame_ids = []  # absolute frame numbers for all_depths
    gray_written = 0

    gray_writer = None
    if grayscale:
        gpath = prefix + ("_grayscale16.mkv" if bit16_grayscale
                          else "_grayscale.mkv")
        gray_writer = vio.VideoWriter(gpath, dv.fps, w, h)
        out["grayscale"] = gpath

    fr_n = 0
    while True:
        rgb = dv.read_batch(1)
        if rgb is None:
            break
        if min_frames != -1 and min_frames >= fr_n:
            # start conversion after min_frames (reference :639)
            if cv is not None:
                cv.read_batch(1)
            fr_n += 1
            continue
        depth = dec(jnp.asarray(rgb[0]))
        col = None
        if cv is not None:
            cb = cv.read_batch(1)
            col = cb[0] if cb is not None else None
        m = jnp.asarray(transforms[fr_n]) if transforms is not None \
            else jnp.eye(4)

        if dense is not None and fr_n < dense.shape[0]:
            tr = dense[fr_n]
            origin, rays, world, z, ok = [
                np.asarray(v) for v in _frame_rays(
                    depth, jnp.asarray(tr[:, :2]), jnp.asarray(tr[:, 2]),
                    k, m)]
            track_origins.append(origin)
            track_rays.append(rays)
            track_world.append(world)
            track_valid.append(ok)

        if ply_dir is not None or (save_ply_every
                                   and fr_n % save_ply_every == 0):
            pts = geo.transform_depth_map(
                geo.unproject_depth(depth, k), m).reshape(-1, 3)
            cols = (col.reshape(-1, 3) if col is not None else None)
            ppath = (os.path.join(ply_dir, f"{fr_n:06d}.ply")
                     if ply_dir is not None
                     else f"{prefix}_frame{fr_n:06d}.ply")
            pcio.write_ply(ppath, to_host(pts), cols)
            out.setdefault("ply_frames", []).append(ppath)
        if obj_dir is not None or (save_obj_every
                                   and fr_n % save_obj_every == 0):
            from metric_depth_video_toolbox_tpu.ops import rasterize
            pts3 = geo.unproject_depth(depth, k, of_by_one=True)
            keep = None
            if remove_edges:
                keep = ~to_host(rasterize.cell_edge_mask(pts3))
            world_pts = to_host(geo.transform_depth_map(pts3, m))
            faces = pcio.grid_mesh_faces(h, w, keep=keep)
            opath = (os.path.join(obj_dir, f"{fr_n:06d}.obj")
                     if obj_dir is not None
                     else f"{prefix}_frame{fr_n:06d}.obj")
            pcio.write_obj(opath, world_pts.reshape(-1, 3), faces,
                           (col.reshape(-1, 3) / 255.0
                            if col is not None else None))
            out.setdefault("obj_frames", []).append(opath)

        if gray_writer is not None:
            d = to_host(depth)
            if bit16_grayscale:
                g16 = np.clip(d / max_depth * 65535.0, 0,
                              65535).astype(np.uint16)
                g8 = (g16 >> 8).astype(np.uint8)
            else:
                g8 = np.clip(d / max_depth * 255.0, 0, 255).astype(np.uint8)
            gray_writer.write(np.stack([g8, g8, g8], axis=-1))
            gray_written += 1

        if save_rescaled_depth:
            all_depths.append(to_host(depth))
            depth_frame_ids.append(fr_n)
        fr_n += 1

    dv.close()
    if cv is not None:
        cv.close()
    if gray_writer is not None:
        gray_writer.commit(gray_written)

    tri_points = None
    tri_valid_mask = None
    if triangulate and dense is not None and track_origins:
        t_frames = len(track_origins)
        n_tracks = dense.shape[1]
        origins = np.broadcast_to(
            np.stack(track_origins)[:, None, :], (t_frames, n_tracks, 3))
        rays = np.stack(track_rays)          # (T, N, 3)
        valid = np.stack(track_valid)        # (T, N)
        world = np.stack(track_world)        # (T, N, 3)

        obs_count = valid.sum(0)
        good = obs_count >= min_observations

        # (N, T, ...) layout for vmapped per-track solves
        o = jnp.asarray(origins.transpose(1, 0, 2))
        r = jnp.asarray(rays.transpose(1, 0, 2))
        v = jnp.asarray(valid.transpose(1, 0))
        tri = to_host(jax.jit(jax.vmap(solvers.intersect_rays,
                                       in_axes=(0, 0, None, 0)))(
            o, r, None, v))
        tri_points = tri[good]
        tri_valid_mask = good
        avg_mono = np.zeros_like(tri)
        vsum = np.maximum(valid.sum(0), 1)[:, None]
        avg_mono = (world * valid[..., None]).sum(0) / vsum

        tri_path = prefix + "_triangulated.ply"
        avg_path = prefix + "_avgmonodepth.ply"
        avg_out = avg_mono[good]
        if merge_close_points:
            tri_points, _ = merge_near_points(tri_points)
            avg_out, _ = merge_near_points(avg_out)

        def _cloud_normals(pts):
            # unstructured-cloud normals (KNN covariance, ops/knn.py);
            # the grid normals of ops/geometry only apply to depth maps.
            # Flip toward the first camera center so meshing tools get a
            # consistent orientation.
            if not save_normals or pts.shape[0] < 8:
                return None
            from metric_depth_video_toolbox_tpu.ops import knn
            c0 = (np.asarray(transforms[0])[:3, 3]
                  if transforms is not None else np.zeros(3, np.float32))
            vd = pts - c0[None]
            vd = vd / np.maximum(
                np.linalg.norm(vd, axis=1, keepdims=True), 1e-9)
            return to_host(knn.knn_normals(
                jnp.asarray(pts, jnp.float32),
                k=min(16, pts.shape[0] - 1),
                view_dirs=jnp.asarray(vd, jnp.float32)))

        pcio.write_ply(tri_path, tri_points,
                       normals=_cloud_normals(tri_points))
        pcio.write_ply(avg_path, avg_out,
                       normals=_cloud_normals(avg_out))
        out["triangulated"] = tri_path
        out["avgmonodepth"] = avg_path

        if save_rescaled_depth and all_depths:
            out["rescaled"] = _rescale_depth_video(
                prefix, all_depths, dense, tri, good, k, transforms,
                max_depth, dv.fps, global_align,
                frame_ids=depth_frame_ids)
    return out


def _rescale_depth_video(prefix, depths, dense, tri_points, good, k,
                         transforms, max_depth, fps, global_align,
                         frame_ids=None):
    """Pass 3: rescale the mono depth video so tracked points agree with
    their triangulated positions (reference :884-931)."""
    t_frames = len(depths)
    path = prefix + "_rescaled.mkv"
    h, w = depths[0].shape

    # per-frame reference depth of each triangulated track: project the
    # triangulated point into the frame's camera and compare z
    scales = np.ones(t_frames, np.float32)
    ratios_all = []
    for fi in range(t_frames):
        abs_fi = frame_ids[fi] if frame_ids is not None else fi
        m = transforms[abs_fi] if transforms is not None else np.eye(4)
        w2c = np.linalg.inv(m)
        pts_cam = tri_points[good] @ w2c[:3, :3].T + w2c[:3, 3]
        tr = dense[abs_fi][good]
        ok = tr[:, 2] > 0
        if ok.sum() < 4:
            ratios_all.append(None)
            continue
        xi = np.clip(np.round(tr[ok, 0]).astype(int), 0, w - 1)
        yi = np.clip(np.round(tr[ok, 1]).astype(int), 0, h - 1)
        mono_z = depths[fi][yi, xi]
        ref_z = pts_cam[ok][:, 2]
        sel = (mono_z > 1e-3) & (ref_z > 1e-3)
        if sel.sum() < 4:
            ratios_all.append(None)
            continue
        ratios_all.append((ref_z[sel], mono_z[sel]))
        scales[fi] = float(np.mean(ref_z[sel] / mono_z[sel]))

    if global_align:
        pairs = [r for r in ratios_all if r is not None]
        refs = np.concatenate([p[0] for p in pairs])
        monos = np.concatenate([p[1] for p in pairs])
        s, t = solvers.scale_and_shift(
            jnp.asarray(1.0 / np.maximum(monos, 1e-3)),
            jnp.asarray(1.0 / np.maximum(refs, 1e-3)))
        s, t = float(s), float(t)
        frames_out = [1.0 / np.maximum(
            (1.0 / np.maximum(d, 1e-3)) * s + t, 1e-6) for d in depths]
    else:
        frames_out = [d * scales[i] for i, d in enumerate(depths)]

    vio.save_depth_video(np.stack(frames_out), path, fps, max_depth)
    return path


def render_point_cloud_video(point_sets, path, fps=24, out_hw=(480, 640),
                             xfov=60.0, n_frames=72, radius=1):
    """Offline turntable render of one or more point clouds — the
    headless stand-in for the reference's blocking Open3D viewer
    (``--show_scene_point_clouds``, reference :845-851). Each set is
    (points, colors-or-None); sets get distinct fallback colors."""
    from metric_depth_video_toolbox_tpu.ops import rasterize
    fallback = np.asarray([[220, 90, 60], [60, 140, 220], [90, 200, 90]],
                          np.float32)
    pts_all, col_all = [], []
    for i, (pts, cols) in enumerate(point_sets):
        pts = np.asarray(pts, np.float32)
        if cols is None:
            cols = np.broadcast_to(fallback[i % len(fallback)],
                                   pts.shape).copy()
        pts_all.append(pts)
        col_all.append(np.asarray(cols, np.float32))
    pts = np.concatenate(pts_all)
    cols = np.concatenate(col_all)
    center = np.median(pts, axis=0)
    rad = float(np.percentile(np.linalg.norm(pts - center, axis=1), 90))
    rad = max(rad, 1e-3) * 2.2
    k = jnp.asarray(np.asarray(geo.camera_matrix_from_fov(
        out_hw[1], out_hw[0], xfov_deg=xfov), np.float32))

    pj = jnp.asarray(pts)
    cj = jnp.asarray(cols)

    @jax.jit
    def render(world_to_cam):
        cam = pj @ world_to_cam[:3, :3].T + world_to_cam[:3, 3]
        img, _, mask = rasterize.splat_points(cam, cj, k, out_hw,
                                              radius=radius)
        return jnp.where(mask[..., None], img, 16.0)

    wr = vio.VideoWriter(path, fps, out_hw[1], out_hw[0])
    for fi in range(n_frames):
        ang = 2 * np.pi * fi / n_frames
        eye = center + rad * np.asarray(
            [np.sin(ang), -0.25, np.cos(ang)], np.float32)
        z = center - eye
        z = z / np.linalg.norm(z)
        x = np.cross(np.asarray([0, 1, 0], np.float32), z)
        x = x / (np.linalg.norm(x) + 1e-9)
        y = np.cross(z, x)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([x, y, z])
        w2c[:3, 3] = -w2c[:3, :3] @ eye
        img = to_host(render(jnp.asarray(w2c)))
        wr.write(np.clip(img, 0, 255).astype(np.uint8))
    wr.commit(n_frames)
    return path


def _mask_filter_tracks(dense, mask_video, strict):
    """Invalidate track observations that land on masked pixels
    (reference :659-681). ``strict`` kills the whole track if any of its
    observations was ever masked."""
    dense = dense.copy()
    mv = vio.VideoReader(mask_video)
    ever_masked = np.zeros(dense.shape[1], bool)
    h, w = mv.height, mv.width
    for fi in range(dense.shape[0]):
        mb = mv.read_batch(1)
        if mb is None:
            print("WARNING: mask video ended before other videos")
            break
        mask = mb[0][..., 0]
        tr = dense[fi]
        ok = tr[:, 2] > 0
        xi = np.clip(np.round(tr[:, 0]).astype(int), 0, w - 1)
        yi = np.clip(np.round(tr[:, 1]).astype(int), 0, h - 1)
        oob = (tr[:, 0] >= w) | (tr[:, 1] >= h)
        hit = ok & (oob | (mask[yi, xi] > 0))
        dense[fi][hit, 2] = 0.0
        ever_masked |= hit
    mv.close()
    if strict:
        dense[:, ever_masked, 2] = 0.0
    return dense


def merge_near_points(points, colors=None, radius=0.003):
    """Union-find merge of near points (reference :148-207) — host-side,
    voxel-hash accelerated."""
    pts = np.asarray(points, np.float32)
    keys = np.floor(pts / radius).astype(np.int64)
    _, inverse = np.unique(keys, axis=0, return_inverse=True)
    n_cells = inverse.max() + 1
    sums = np.zeros((n_cells, 3), np.float64)
    counts = np.zeros(n_cells, np.int64)
    np.add.at(sums, inverse, pts)
    np.add.at(counts, inverse, 1)
    merged = (sums / counts[:, None]).astype(np.float32)
    if colors is None:
        return merged, None
    cols = np.asarray(colors, np.float64)
    csum = np.zeros((n_cells, cols.shape[1]), np.float64)
    np.add.at(csum, inverse, cols)
    return merged, (csum / counts[:, None]).astype(colors.dtype)


def export_camera_track(transformations, xfov, width, height, fps,
                        output_base, points=None, colors=None):
    """Camera-track + point-cloud export for DCC tools.

    The reference exports Blender/Alembic via bpy
    (convert_metric_depth_video_to_other_format.py:291-440, with the
    CV->Blender axis conversion at :400-414). bpy is used when importable;
    otherwise a portable fallback is written: a JSON camera track (same
    axis conversion, per-frame 4x4 + FOV + fps) plus the PLY cloud —
    everything a DCC importer script needs.
    """
    import json

    transformations = np.asarray(transformations, np.float32)
    # CV (x right, y down, z forward) -> Blender (x right, y forward?, z up):
    # rotate -90deg about X, flip camera to look down -Z (reference :400-414)
    cv2blender = np.array([[1, 0, 0, 0],
                           [0, 0, 1, 0],
                           [0, -1, 0, 0],
                           [0, 0, 0, 1]], np.float32)
    camflip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    blender_mats = np.einsum("ij,njk,kl->nil", cv2blender,
                             transformations, camflip)

    try:
        import bpy  # noqa: F401
        has_bpy = True
    except ImportError:
        has_bpy = False

    outputs = {}
    if has_bpy:  # pragma: no cover - bpy not present in this image
        abc_path = output_base + ".abc"
        _bpy_export_alembic(blender_mats, xfov, width, height, fps,
                            abc_path, points, colors)
        outputs["alembic"] = abc_path
    track_path = output_base + "_camera_track.json"
    with open(track_path, "w", encoding="utf-8") as f:
        json.dump({
            "fps": fps, "width": width, "height": height,
            "xfov_deg": float(xfov),
            "convention": "blender (x right, z up, camera looks -Z)",
            "frames": [m.tolist() for m in blender_mats],
        }, f)
    outputs["camera_track"] = track_path
    if points is not None:
        cloud_path = output_base + "_cloud.ply"
        pcio.write_ply(cloud_path, points, colors)
        outputs["cloud"] = cloud_path
    return outputs


def _bpy_export_alembic(mats, xfov, width, height, fps, path, points,
                        colors):  # pragma: no cover
    """Blender-side Alembic export (runs only where bpy exists)."""
    import bpy
    import math as _math
    bpy.ops.wm.read_factory_settings(use_empty=True)
    cam_data = bpy.data.cameras.new("mdvt_cam")
    cam_data.angle = _math.radians(float(xfov))
    cam = bpy.data.objects.new("mdvt_cam", cam_data)
    bpy.context.collection.objects.link(cam)
    scene = bpy.context.scene
    scene.render.fps = int(round(fps))
    scene.frame_start = 1
    scene.frame_end = len(mats)
    for i, m in enumerate(mats, start=1):
        cam.matrix_world = [list(r) for r in m]
        cam.keyframe_insert(data_path="location", frame=i)
        cam.keyframe_insert(data_path="rotation_euler", frame=i)
    if points is not None:
        mesh = bpy.data.meshes.new("mdvt_cloud")
        mesh.from_pydata([tuple(p) for p in np.asarray(points)], [], [])
        obj = bpy.data.objects.new("mdvt_cloud", mesh)
        bpy.context.collection.objects.link(obj)
    bpy.ops.wm.alembic_export(filepath=path, selected=False)
    # also save the .blend scene (reference convert_...py:422)
    bpy.ops.wm.save_as_mainfile(filepath=path + ".blend")
