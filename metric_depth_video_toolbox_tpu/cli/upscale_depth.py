"""CLI: upscale a low-res metric depth video with full-res RGB guidance
(reference upscale_depth_promptda.py)."""

from __future__ import annotations

import argparse

import numpy as np


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Prompt-guided metric depth upscaling.")
    p.add_argument("--color_video", type=str, required=True)
    p.add_argument("--depth_video", type=str, required=True,
                   help="low-res metric depth video (the prompt)")
    p.add_argument("--max_depth", default=100, type=float)
    p.add_argument("--max_frames", default=-1, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--checkpoint", type=str)
    return p


def run(args):
    import jax
    import jax.numpy as jnp

    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.models import promptda
    from metric_depth_video_toolbox_tpu.utils.host import robust_call

    cv = vio.VideoReader(args.color_video, max_frames=args.max_frames)
    dv = vio.DepthVideoReader(args.depth_video, args.max_depth)
    h14 = (cv.height // 14) * 14
    w14 = (cv.width // 14) * 14

    # output range follows the prompt's own metric range (PromptDA
    # normalizes/denormalizes per frame), so no max_depth in the config
    cfg = promptda.PromptDAConfig()
    model = promptda.PromptDA(cfg)
    params = None
    if args.checkpoint:
        from metric_depth_video_toolbox_tpu.models import convert
        params = convert.load_checkpoint(args.checkpoint)

    @jax.jit
    def step(p, imgs_u8, prompts):
        x = imgs_u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], h14, w14, 3), "bilinear")
        d = model.apply(p, x, prompts)
        return jax.image.resize(d, (d.shape[0], cv.height, cv.width),
                                "bilinear")

    out_path = args.depth_video + "_upscaled.mkv"
    frames_out = []
    while True:
        imgs = cv.read_batch(args.batch_size)
        if imgs is None:
            break
        prompts = dv.read_depth_batch(imgs.shape[0])
        if prompts is None:
            break
        if params is None:
            params = jax.jit(model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((imgs.shape[0], h14, w14, 3)),
                jnp.asarray(prompts))
        d = robust_call(step, params, jnp.asarray(imgs),
                        jnp.asarray(prompts))
        frames_out.append(d)
    cv.close()
    dv.close()
    vio.save_depth_video(np.concatenate(frames_out), out_path, cv.fps,
                         args.max_depth)
    print(f"upscaled depth saved: {out_path}")
    return out_path


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
