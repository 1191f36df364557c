"""CLI: depth video (+mask) -> per-frame convergence depths
(reference find_convergence_depth.py)."""

from __future__ import annotations

import argparse


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Find the convergence (focus) depth per frame.")
    p.add_argument("--depth_video", type=str, required=True)
    p.add_argument("--mask_video", type=str)
    p.add_argument("--max_depth", default=100, type=float)
    return p


def run(args):
    from metric_depth_video_toolbox_tpu.pipeline import convergence
    out = convergence.find_convergence_depths(
        args.depth_video, mask_video=args.mask_video,
        max_depth=args.max_depth)
    print(f"convergence depths saved: {out}")
    return out


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
