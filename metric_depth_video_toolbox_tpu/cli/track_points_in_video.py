"""CLI: color video -> 2D point tracks (reference track_points_in_video.py)."""

from __future__ import annotations

import argparse


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Track points through a video -> *_tracking.json.")
    p.add_argument("--color_video", type=str, required=True)
    p.add_argument("--max_frames", default=-1, type=int)
    p.add_argument("--grid", default=36, type=int)
    p.add_argument("--clip_len", default=120, type=int)
    p.add_argument("--track_visualization", action="store_true")
    return p


def run(args):
    from metric_depth_video_toolbox_tpu.pipeline import tracking
    out = tracking.track_video(
        args.color_video, clip_len=args.clip_len, grid=args.grid,
        max_frames=args.max_frames, save_viz=args.track_visualization)
    print(f"tracking saved: {out}")
    return out


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
