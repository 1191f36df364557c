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
    for k, v in out.items():
        print(f"{k}: {v}")
    return out


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
