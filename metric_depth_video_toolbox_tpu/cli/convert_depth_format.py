"""CLI: depth video -> other formats (grayscale / PLY / OBJ /
triangulated clouds / rescaled depth) — reference
convert_metric_depth_video_to_other_format.py."""

from __future__ import annotations

import argparse


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Export a metric depth video to other formats.")
    p.add_argument("--depth_video", type=str, required=True)
    p.add_argument("--color_video", type=str)
    p.add_argument("--track_file", type=str)
    p.add_argument("--transformation_file", type=str)
    p.add_argument("--xfov", type=float)
    p.add_argument("--yfov", type=float)
    p.add_argument("--max_depth", default=100, type=float)
    p.add_argument("--max_frames", default=-1, type=int)
    p.add_argument("--save_ply", default=0, type=int,
                   help="save every Nth frame as .ply (0 = off)")
    p.add_argument("--save_obj", default=0, type=int,
                   help="save every Nth frame as .obj mesh (0 = off)")
    p.add_argument("--triangulate", action="store_true")
    p.add_argument("--min_observations", default=10, type=int)
    p.add_argument("--save_rescaled_depth", action="store_true")
    p.add_argument("--global_align", action="store_true")
    p.add_argument("--save_grayscale", action="store_true")
    p.add_argument("--bit16", action="store_true")
    p.add_argument("--save_alembic", action="store_true",
                   help="export camera track (+ triangulated cloud) for "
                        "DCC tools; .abc when bpy is available, JSON "
                        "camera track otherwise")
    return p


def run(args):
    from metric_depth_video_toolbox_tpu.pipeline import export
    out = export.export_video(
        args.depth_video, tracking_file=args.track_file,
        transformation_file=args.transformation_file,
        color_video=args.color_video, xfov=args.xfov, yfov=args.yfov,
        max_depth=args.max_depth, max_frames=args.max_frames,
        save_ply_every=args.save_ply, save_obj_every=args.save_obj,
        min_observations=args.min_observations,
        triangulate=args.triangulate,
        save_rescaled_depth=args.save_rescaled_depth,
        global_align=args.global_align, grayscale=args.save_grayscale,
        bit16_grayscale=args.bit16)
    if args.save_alembic and args.transformation_file:
        import numpy as np
        from metric_depth_video_toolbox_tpu.io import sidecar, video as vio
        from metric_depth_video_toolbox_tpu.io import pointcloud as pcio
        transforms = sidecar.load_transformations(args.transformation_file)
        n, w, h, fps = vio.video_info(args.depth_video)
        pts = cols = None
        if "triangulated" in out:
            pts, cols = pcio.read_ply(out["triangulated"])
        out.update(export.export_camera_track(
            transforms, args.xfov or 50.0, w, h, fps,
            args.depth_video, points=pts, colors=cols))
    for k, v in out.items():
        print(f"{k}: {v}")
    return out


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
