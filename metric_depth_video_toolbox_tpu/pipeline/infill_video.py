"""Disocclusion infill over rendered SBS videos.

Engine registry mirroring the reference's infill zoo (SURVEY.md §2.3):

  - 'basic': the in-house normal-march infill + lower-edge blur
             (reference basic_nomal_infill.py — pure compute, no model).
  - 'diffusion': StereoCrafter-class video-diffusion inpainting
             (models.diffusion), chunked 25/6 with overlap re-feeding and
             LHM color matching (reference stereo_crafter_infill.py).

Input contract: the SBS video + its ``*_infillmask.mkv`` (normals encoded
as RGB; green = hole without normal data; black = keep). Output:
``<sbs>_infilled.mkv``.

The reference overlaps CPU pre/post of one clip with GPU work of another
via threads + a GPU semaphore (stereo_crafter_infill.py:27,345-354); here
the device step is batched and the reader threads overlap decode with
device compute.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.ops import image as im
from metric_depth_video_toolbox_tpu.ops import infill as infill_ops
from metric_depth_video_toolbox_tpu.utils.host import robust_call


@partial(jax.jit, static_argnames=("march_steps",))
def basic_infill_frame(sbs_u8, mask_rgb_u8, march_steps=400):
    """One SBS frame + infill-mask frame -> infilled frame.

    Holes are pixels whose mask is non-black; green-coded pixels have no
    usable normal and get filled by the march of their neighbors, then a
    soft blur is applied under the lower edge (reference
    basic_nomal_infill.py:45-119).
    """
    mask = mask_rgb_u8.astype(jnp.float32) / 255.0
    hole = jnp.any(mask_rgb_u8 != 0, axis=-1)
    normals = mask * 2.0 - 1.0
    filled = infill_ops.normal_march_infill(sbs_u8, hole, normals,
                                            max_steps=march_steps)
    # mark + blur the background side of each edge so the transition from
    # real to marched pixels is soft (mark_lower_side -> dilate -> blend)
    lower = infill_ops.mark_lower_side(mask_rgb_u8)
    lower_m = (lower[..., 2] == 255).astype(jnp.float32)
    lower_m = im.dilate(lower_m, ksize=5)
    out = infill_ops.blur_under_mask(filled, lower_m, ksize=7)
    return out.astype(jnp.uint8)


def infill_sbs_video(sbs_video, infill_mask_video, output=None,
                     engine="basic", color_video=None, batch_size=4,
                     max_frames=-1, **kw):
    """Infill every frame of an SBS video. Returns the output path."""
    output = output or (sbs_video + "_infilled.mkv")
    sv = vio.VideoReader(sbs_video, max_frames=max_frames)
    mv = vio.VideoReader(infill_mask_video)

    if engine == "diffusion":
        from metric_depth_video_toolbox_tpu.pipeline import infill_diffusion
        sv.close()
        mv.close()
        return infill_diffusion.infill_sbs_video_diffusion(
            sbs_video, infill_mask_video, output=output,
            color_video=color_video, max_frames=max_frames, **kw)

    step = jax.jit(jax.vmap(basic_infill_frame))
    writer = vio.VideoWriter(output, sv.fps, sv.width, sv.height)
    n = 0
    while True:
        frames = sv.read_batch(batch_size)
        if frames is None:
            break
        masks = mv.read_batch(frames.shape[0])
        if masks is None or masks.shape[0] < frames.shape[0]:
            masks = np.zeros_like(frames) if masks is None else np.pad(
                masks, ((0, frames.shape[0] - masks.shape[0]), (0, 0),
                        (0, 0), (0, 0)))
        out = robust_call(step, jnp.asarray(frames), jnp.asarray(masks))
        for f in out:
            writer.write(f)
        n += frames.shape[0]
    sv.close()
    mv.close()
    writer.commit(n)
    return output
