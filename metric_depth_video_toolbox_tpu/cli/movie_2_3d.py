"""CLI: full 2D movie -> 3D SBS (reference movie_2_3D.py)."""

from __future__ import annotations

import argparse


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Convert a full 2D movie into a 3D SBS movie.")
    p.add_argument("--color_video", type=str, required=True)
    p.add_argument("--output_dir", type=str)
    p.add_argument("--depth_engine", type=str, default="vda")
    p.add_argument("--infill_engine", type=str, default="basic",
                   choices=["none", "basic", "diffusion"])
    p.add_argument("--xfov", type=float)
    p.add_argument("--max_depth", default=100, type=float)
    p.add_argument("--max_scene_frames", default=1500, type=int)
    p.add_argument("--scene_file", type=str)
    p.add_argument("--end_scene", default=-1, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--parallel", default=0, type=int,
                   help="host IO worker threads (device work is batched)")
    return p


def run(args):
    from metric_depth_video_toolbox_tpu.pipeline import movie
    out = movie.movie_to_3d(
        args.color_video, output_dir=args.output_dir,
        engine=args.depth_engine, infill_engine=args.infill_engine,
        xfov=args.xfov, max_depth=args.max_depth,
        max_scene_frames=args.max_scene_frames,
        scene_file=args.scene_file, end_scene=args.end_scene,
        batch_size=args.batch_size)
    print(f"3D movie saved: {out}")
    return out


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
