"""FOV sweep harness: run a K-conditioned single-frame depth engine at a
range of horizontal FOVs for eyeball comparison (the reference's
test_fovs_with_unidepth.sh renames the clip per FOV and reruns
unidepth_video.py at 40..75 deg, 100 frames). Outputs
``<clip>_fov_<F>.mkv_depth.mkv`` per FOV; one process reuses the model.

Usage: python scripts/fov_sweep.py CLIP.mkv [--engine unidepth]
       [--fovs 40,45,...] [--max_frames 100] [--model_size vitl]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("color_video")
    ap.add_argument("--engine", default="unidepth",
                    choices=["unidepth", "moge", "unik3d"])
    ap.add_argument("--fovs", default="40,45,50,55,60,65,70,75")
    ap.add_argument("--max_frames", type=int, default=100)
    ap.add_argument("--model_size", default="vitl")
    args = ap.parse_args()

    from metric_depth_video_toolbox_tpu.cli import depth_engines

    engine_main = {"unidepth": depth_engines.unidepth_main,
                   "moge": depth_engines.moge_main,
                   "unik3d": depth_engines.unik3d_main}[args.engine]
    for fov in (float(f) for f in args.fovs.split(",")):
        print(f"testing xfov: {fov:g}", flush=True)
        # per-FOV clip name (the reference renames; a hardlink is enough)
        link = f"{args.color_video}_fov_{fov:g}.mkv"
        if not os.path.exists(link):
            os.link(args.color_video, link)
        try:
            engine_main(["--color_video", link, "--xfov", str(fov),
                         "--max_frames", str(args.max_frames),
                         "--model_size", args.model_size])
        finally:
            os.unlink(link)


if __name__ == "__main__":
    main()
