"""``mdvt`` — one entry point multiplexing every tool.

Subcommand names follow the reference scripts:

  mdvt depth          video_metric_convert / single-frame engines
  mdvt stereo         stereo_rerender
  mdvt mask           generate_video_mask
  mdvt convergence    find_convergence_depth
  mdvt track          track_points_in_video
  mdvt align          align_3d_points
  mdvt export         convert_metric_depth_video_to_other_format
  mdvt infill         infill engines over SBS renders
  mdvt movie          movie_2_3D (full pipeline)
  mdvt view           3d_view_depthfile
  mdvt split-sbs      split_sbs_video
  mdvt analyse-tracking / analyse-depth
  mdvt flow           optical_flow
  mdvt upscale        upscale_depth_promptda
  mdvt bench          the benchmark
"""

from __future__ import annotations

import argparse
import importlib
import sys

SUBCOMMANDS = {
    "depth": "metric_depth_video_toolbox_tpu.cli.video_metric_convert",
    "stereo": "metric_depth_video_toolbox_tpu.cli.stereo_rerender",
    "mask": "metric_depth_video_toolbox_tpu.cli.generate_video_mask",
    "convergence": "metric_depth_video_toolbox_tpu.cli.find_convergence_depth",
    "track": "metric_depth_video_toolbox_tpu.cli.track_points_in_video",
    "align": "metric_depth_video_toolbox_tpu.cli.align_3d_points",
    "export": "metric_depth_video_toolbox_tpu.cli.convert_depth_format",
    "infill": "metric_depth_video_toolbox_tpu.cli.infill",
    "movie": "metric_depth_video_toolbox_tpu.cli.movie_2_3d",
    "view": "metric_depth_video_toolbox_tpu.cli.view_depthfile",
    "split-sbs": "metric_depth_video_toolbox_tpu.cli.split_sbs_video",
    "analyse-tracking": "metric_depth_video_toolbox_tpu.cli.analyse_tracking",
    "analyse-depth": "metric_depth_video_toolbox_tpu.cli.analyse_depth",
    "flow": "metric_depth_video_toolbox_tpu.cli.optical_flow",
    "slam": "metric_depth_video_toolbox_tpu.cli.sam_track_video",
    "upscale": "metric_depth_video_toolbox_tpu.cli.upscale_depth",
    "project": "metric_depth_video_toolbox_tpu.cli.project",
    "inpaint": "metric_depth_video_toolbox_tpu.cli.apply_inpainting",
    "engine": "metric_depth_video_toolbox_tpu.cli.depth_engines",
    "gui": "metric_depth_video_toolbox_tpu.cli.gui",
    "download-weights": "metric_depth_video_toolbox_tpu.cli."
                        "download_weights",
}


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(
        prog="mdvt", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("command", choices=list(SUBCOMMANDS) + ["bench"])
    args, rest = parser.parse_known_args(argv)
    if args.command == "bench":
        import bench
        bench.main()
        return
    mod = importlib.import_module(SUBCOMMANDS[args.command])
    mod.main(rest)


if __name__ == "__main__":
    main()
