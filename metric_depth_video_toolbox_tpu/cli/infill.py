"""CLI: disocclusion infill over SBS renders (reference
basic_nomal_infill.py / stereo_crafter_infill.py / m2svid_infill.py /
inspatio_world_infill.py — one CLI, engine-selected)."""

from __future__ import annotations

import argparse


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Fill disocclusion holes in a rendered SBS video.")
    p.add_argument("--sbs_color_video", type=str, required=True,
                   help="SBS video or .txt list")
    p.add_argument("--sbs_mask_video", type=str,
                   help="infill mask video (default: "
                        "<sbs>_infillmask.mkv)")
    p.add_argument("--color_video", type=str,
                   help="original mono video (extra conditioning for "
                        "diffusion engines)")
    p.add_argument("--infill_engine", type=str, default="basic",
                   choices=["basic", "diffusion"])
    p.add_argument("--max_frames", default=-1, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    return p


def run(args):
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    from metric_depth_video_toolbox_tpu.pipeline import infill_video

    outs = []
    for v in dstage.expand_batch(args.sbs_color_video):
        mask = args.sbs_mask_video or (v + "_infillmask.mkv")
        outs.append(infill_video.infill_sbs_video(
            v, mask, engine=args.infill_engine,
            color_video=args.color_video, max_frames=args.max_frames,
            batch_size=args.batch_size))
        print(f"infilled video saved: {outs[-1]}")
    return outs


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
