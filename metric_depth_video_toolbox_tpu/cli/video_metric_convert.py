"""CLI: color video -> metric depth video via the VDA-class engine.

Flag-compatible with reference video_metric_convert.py (:153-206),
including the ``.txt`` batch-list protocol.
"""

from __future__ import annotations

import argparse


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Temporally consistent metric depth video from a color "
                    "video (Video-Depth-Anything-class engine).")
    p.add_argument("--color_video", type=str, required=True,
                   help="video file or .txt list of video files")
    p.add_argument("--depth_video", type=str,
                   help="reference metric depth video used as the anchor "
                        "instead of the single-frame metric model")
    p.add_argument("--max_depth", default=100, type=float)
    p.add_argument("--max_frames", default=-1, type=int)
    p.add_argument("--target_fps", default=-1, type=int,
                   help="decimate input to this fps (-1 = original)")
    p.add_argument("--input_size", default=518, type=int)
    p.add_argument("--model_size", "--model", dest="model_size",
                   default="vits",
                   choices=["vitt", "vits", "vitb", "vitl", "vitg"])
    p.add_argument("--fp32", action="store_true",
                   help="full float32 inference (default is bfloat16 on "
                        "the MXU)")
    p.add_argument("--quantize", choices=("none", "int8"), default="none",
                   help="int8 = dynamically quantized backbone matmuls "
                        "on the MXU's double-rate int8 path (TPU-native "
                        "speed mode; no separate checkpoint needed)")
    p.add_argument("--window", type=int, default=None)
    p.add_argument("--rolling_average", type=int, default=0, metavar="N",
                   help="rolling-average affine->metric alignment: "
                        "re-fit scale/shift against metric anchors "
                        "sampled along the whole video and smooth over "
                        "an N-frame window (the reference docs' default "
                        "that --no_rolling_average disables; 0 = "
                        "first-frames fit, the reference code behavior)")
    p.add_argument("--no_rolling_average", action="store_true",
                   help="force the first-frames fit (reference "
                        "docs/USAGE.md flag; this is already the "
                        "default here)")
    p.add_argument("--checkpoint", type=str,
                   help="converted Flax checkpoint (models.convert)")
    p.add_argument("--profile", type=str, metavar="DIR",
                   help="capture a jax.profiler trace into DIR")
    return p


def run(args):
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage

    params = None
    if args.checkpoint:
        from metric_depth_video_toolbox_tpu.models import convert
        params = convert.load_checkpoint(args.checkpoint)
    from metric_depth_video_toolbox_tpu.utils.timer import device_trace
    with device_trace(args.profile):
        outs = dstage.run_batch(
            "vda", args.color_video, max_depth=args.max_depth,
            max_frames=args.max_frames, target_fps=args.target_fps,
            input_size=args.input_size,
            size=args.model_size, window=args.window, params=params,
            fp32=args.fp32, reference_depth_video=args.depth_video,
            quantize=None if args.quantize == "none" else args.quantize,
            rolling_average=(0 if args.no_rolling_average
                             else args.rolling_average))
    for o in outs:
        print(f"depth video saved: {o}")
    return outs


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
