"""CLI: split an SBS video into left/right videos
(reference split_sbs_video.py — ffmpeg crop there, cv2 here)."""

from __future__ import annotations

import argparse

import numpy as np


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Split a side-by-side video into _left/_right videos.")
    p.add_argument("--sbs_video", "--color_video", dest="sbs_video",
                   type=str, required=True)
    p.add_argument("--max_frames", default=-1, type=int)
    return p


def run(args):
    from metric_depth_video_toolbox_tpu.io import video as vio
    r = vio.VideoReader(args.sbs_video, max_frames=args.max_frames)
    half = r.width // 2
    left = vio.VideoWriter(args.sbs_video + "_left.mkv", r.fps, half,
                           r.height)
    right = vio.VideoWriter(args.sbs_video + "_right.mkv", r.fps, half,
                            r.height)
    n = 0
    for frame in r:
        left.write(frame[:, :half])
        right.write(frame[:, half:])
        n += 1
    r.close()
    left.commit(n)
    right.commit(n)
    print(f"wrote {n} frames to _left/_right videos")


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
