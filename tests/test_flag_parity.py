"""CLI flag parity net: every --flag a reference tool's argparse accepts
must be accepted by the corresponding tool here (same name or an
explicit alias). Skips when the reference snapshot isn't mounted."""

import os
import re

import pytest

REF = "/root/reference"
CLI = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "metric_depth_video_toolbox_tpu", "cli")

PAIRS = [
    ("stereo_rerender.py", "stereo_rerender.py"),
    ("align_3d_points.py", "align_3d_points.py"),
    ("convert_metric_depth_video_to_other_format.py",
     "convert_depth_format.py"),
    ("track_points_in_video.py", "track_points_in_video.py"),
    ("movie_2_3D.py", "movie_2_3d.py"),
    ("sam_track_video.py", "sam_track_video.py"),
    ("video_metric_convert.py", "video_metric_convert.py"),
    ("stereo_crafter_infill.py", "infill.py"),
    ("m2svid_infill.py", "infill.py"),
    ("basic_nomal_infill.py", "infill.py"),
    ("optical_flow.py", "optical_flow.py"),
    ("generate_video_mask.py", "generate_video_mask.py"),
    ("find_convergence_depth.py", "find_convergence_depth.py"),
    ("3d_view_depthfile.py", "view_depthfile.py"),
    ("analyse_depth.py", "analyse_depth.py"),
    ("analyse_tracking.py", "analyse_tracking.py"),
    ("split_sbs_video.py", "split_sbs_video.py"),
    ("upscale_depth_promptda.py", "upscale_depth.py"),
    ("unidepth_video.py", "depth_engines.py"),
    ("unik3d_video.py", "depth_engines.py"),
    ("moge_video.py", "depth_engines.py"),
    ("depthpro_video.py", "depth_engines.py"),
    ("videoanythingmetric_video.py", "depth_engines.py"),
    ("video_da3.py", "depth_engines.py"),
    ("depthcrafter_video.py", "depth_engines.py"),
    ("geometrycrafter_video.py", "depth_engines.py"),
    ("video_mvsa.py", "depth_engines.py"),
    ("download_weights.py", "download_weights.py"),
]

# reference flags with no meaning on this runtime (documented waivers)
WAIVED = {
    ("inspatio_world_infill.py", "--t5_cpu"),  # torch host-offload knob
}


def _flags(path):
    txt = open(path, encoding="utf-8", errors="ignore").read()
    out = set()
    for m in re.finditer(r"add_argument\(([^)]*)\)", txt, re.S):
        out.update(re.findall(r"['\"](--[\w-]+)['\"]", m.group(1)))
    return out


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference snapshot not mounted")
@pytest.mark.parametrize("ref,ours", PAIRS,
                         ids=[r for r, _ in PAIRS])
def test_reference_flags_accepted(ref, ours):
    missing = {f for f in _flags(os.path.join(REF, ref))
               - _flags(os.path.join(CLI, ours))
               if (ref, f) not in WAIVED}
    assert not missing, (f"{ours} is missing reference flags {sorted(missing)}"
                         f" from {ref}")
