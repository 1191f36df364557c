"""CLI: remove overlays (logos/subtitles) before depth estimation.

Reference ``apply_inpainting.sh``: ffmpeg frame dump -> GNU parallel x
iopaint-lama over ``overlay_mask.png`` -> recombine FFV1. Here the same
contract (color video + overlay mask image -> inpainted FFV1 video) runs
as batched device inpainting: the diffusion-based TELEA-class fill for
the masked region, no frame dumps or subprocesses.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Inpaint a static overlay region in every frame.")
    p.add_argument("--color_video", type=str, required=True)
    p.add_argument("--overlay_mask", type=str, required=True,
                   help="image; non-black pixels are inpainted")
    p.add_argument("--output", type=str)
    p.add_argument("--max_frames", default=-1, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--iterations", default=96, type=int)
    return p


def run(args):
    import cv2
    import jax
    import jax.numpy as jnp

    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.ops import image as im
    from metric_depth_video_toolbox_tpu.utils.host import robust_call

    mask_img = cv2.imread(args.overlay_mask, cv2.IMREAD_GRAYSCALE)
    if mask_img is None:
        raise SystemExit(f"cannot read overlay mask {args.overlay_mask}")

    reader = vio.VideoReader(args.color_video, max_frames=args.max_frames)
    if mask_img.shape != (reader.height, reader.width):
        mask_img = cv2.resize(mask_img, (reader.width, reader.height),
                              interpolation=cv2.INTER_NEAREST)
    hole = jnp.asarray(mask_img > 16)

    @jax.jit
    def step(frames_u8):
        def one(f):
            out = im.inpaint_diffusion(f.astype(jnp.float32), hole,
                                       iterations=args.iterations)
            return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
        return jax.vmap(one)(frames_u8)

    output = args.output or (args.color_video + "_inpainted.mkv")
    writer = vio.VideoWriter(output, reader.fps, reader.width,
                             reader.height)
    n = 0
    while True:
        batch = reader.read_batch(args.batch_size)
        if batch is None:
            break
        out = robust_call(step, jnp.asarray(batch))
        for f in out:
            writer.write(f)
        n += batch.shape[0]
    reader.close()
    writer.commit(n)
    print(f"inpainted video saved: {output}")
    return output


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
