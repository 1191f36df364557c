"""End-to-end stereo-step timing: fused dual sweep vs two-call anchors.

Runs bench.bench_stereo (the MOVIE-config device step, batch 16 at
1080p) for both scene statistics x both anchor strategies. This is the
number that decides StereoConfig.fused_anchor_sweep's default.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    for scene in ("smooth", "random"):
        for fused in (False, True):
            fps = bench.bench_stereo(scene=scene, fused=fused)
            print(f"scene={scene:7s} fused={int(fused)}  "
                  f"{fps:6.2f} fps", flush=True)


if __name__ == "__main__":
    main()
