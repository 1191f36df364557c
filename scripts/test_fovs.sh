#!/bin/bash
# FOV sweep for eyeball comparison (the reference's
# test_fovs_with_unidepth.sh): estimate depth once per candidate FOV and
# render the same clip for visual A/B.
set -e
CLIP=${1:?usage: test_fovs.sh <color_video> [fovs...]}
shift
FOVS=${@:-40 45 50 55 60 65 70 75}
M="python -m metric_depth_video_toolbox_tpu.cli.main"

for fov in $FOVS; do
  out="${CLIP%.*}_fov${fov}"
  echo "=== FOV $fov ==="
  $M depth --color_video "$CLIP"
  $M stereo --depth_video "${CLIP}_depth.mkv" --color_video "$CLIP" \
    --xfov "$fov" --batch_size 8
  mv "${CLIP}_depth.mkv_stereo.mkv" "${out}_stereo.mkv"
  echo "wrote ${out}_stereo.mkv"
done
