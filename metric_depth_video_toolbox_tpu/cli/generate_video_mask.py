"""CLI: color video -> subject mask video (reference generate_video_mask.py)."""

from __future__ import annotations

import argparse


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Generate a black/white subject mask video.")
    p.add_argument("--color_video", type=str, required=True,
                   help="video file or .txt list")
    p.add_argument("--output", type=str)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--max_frames", default=-1, type=int)
    return p


def run(args):
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    from metric_depth_video_toolbox_tpu.pipeline import masks

    eng = masks.MaskEngine()
    outs = []
    for v in dstage.expand_batch(args.color_video):
        outs.append(masks.generate_video_mask(
            v, output=args.output if len(outs) == 0 and args.output else None,
            batch_size=args.batch_size, engine=eng,
            max_frames=args.max_frames))
        print(f"mask video saved: {outs[-1]}")
    return outs


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
