"""CLI: disocclusion infill over SBS renders (reference
basic_nomal_infill.py / stereo_crafter_infill.py / m2svid_infill.py /
inspatio_world_infill.py — one CLI, engine-selected)."""

from __future__ import annotations

import argparse


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Fill disocclusion holes in a rendered SBS video.")
    p.add_argument("--sbs_color_video", type=str, required=True,
                   help="SBS video or .txt list")
    p.add_argument("--sbs_mask_video", type=str,
                   help="infill mask video (default: "
                        "<sbs>_infillmask.mkv)")
    p.add_argument("--color_video", type=str,
                   help="original mono video (extra conditioning for "
                        "diffusion engines)")
    p.add_argument("--infill_engine", type=str, default="basic",
                   choices=["basic", "diffusion", "stereocrafter",
                            "m2svid", "inspatio_world", "external"],
                   help="'diffusion' = stereocrafter preset; named "
                        "presets set the reference engines' chunking/"
                        "working shapes; 'external' runs "
                        "--external_command")
    p.add_argument("--external_command", type=str, nargs="+",
                   help="external infill engine command (the "
                        "stereo_dissoclusion_net hook)")
    p.add_argument("--model_scale",
                   choices=["tiny", "production", "svd"],
                   default="production",
                   help="diffusion UNet scale: 'production' = TPU-native "
                        "SVD-class widths (320/640/1280/1280, 5 steps) at "
                        "the reference working points; 'svd' = the "
                        "weight-exact StereoCrafter/SVD graph (models."
                        "svd, loads converted SVD checkpoints); 'tiny' = "
                        "smoke model")
    p.add_argument("--checkpoint", type=str,
                   help="converted denoiser checkpoint")
    p.add_argument("--clip_checkpoint", type=str,
                   help="converted CLIP vision tower (models.clip) for "
                        "SVD cross-attention conditioning")
    p.add_argument("--max_frames", default=-1, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--num_inference_steps", type=int,
                   help="denoise steps for the diffusion engines (more "
                        "looks better but is slower; reference "
                        "stereo_crafter_infill.py:281 default 5)")
    p.add_argument("--apply_edge_blending", action="store_true",
                   help="blend the downward-facing side of disocclusion "
                        "edges to reduce halos (always on for the "
                        "stereocrafter engine; opt-in for m2svid/"
                        "inspatio_world, reference m2svid_infill.py:470)")
    return p


def run(args):
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    from metric_depth_video_toolbox_tpu.pipeline import infill_video

    params = None
    if args.checkpoint:
        from metric_depth_video_toolbox_tpu.models import convert
        params = convert.load_checkpoint(args.checkpoint)

    clips = dstage.expand_batch(args.sbs_color_video)
    outs = []
    shared_engine = None
    for v in clips:
        mask = args.sbs_mask_video or (v + "_infillmask.mkv")
        try:
            if args.infill_engine == "external":
                if not args.external_command:
                    raise SystemExit("--external_command required with "
                                     "--infill_engine external")
                from metric_depth_video_toolbox_tpu.pipeline import \
                    infill_diffusion
                out = infill_diffusion.infill_sbs_video_external(
                    v, mask, args.external_command,
                    color_video=args.color_video)
            elif args.infill_engine in ("diffusion", "stereocrafter",
                                        "m2svid", "inspatio_world"):
                from metric_depth_video_toolbox_tpu.pipeline import \
                    infill_diffusion
                preset = ("stereocrafter"
                          if args.infill_engine == "diffusion"
                          else args.infill_engine)
                if shared_engine is None and preset == "inspatio_world":
                    # inspatio_world runs its own architecture: the
                    # Wan-class causal DiT (models.wan); --checkpoint
                    # takes a convert_wan-converted tree
                    import dataclasses
                    from metric_depth_video_toolbox_tpu.models import \
                        wan as wan_mod
                    wcfg = (wan_mod.WAN_TINY if args.model_scale == "tiny"
                            else wan_mod.WAN_1_3B)
                    if args.num_inference_steps:
                        n = args.num_inference_steps
                        wcfg = dataclasses.replace(
                            wcfg, denoise_steps=tuple(
                                1.0 - i / n for i in range(n)))
                    shared_engine = infill_diffusion.make_engine(
                        preset, cfg=wcfg, params=params)
                if shared_engine is None:  # model loads once per batch
                    from metric_depth_video_toolbox_tpu.models import \
                        diffusion as dif
                    extra = {}
                    if args.model_scale == "svd":
                        from metric_depth_video_toolbox_tpu.models import \
                            svd as svdm
                        cfg = svdm.SVDConfig()
                        if args.clip_checkpoint:
                            from metric_depth_video_toolbox_tpu.models \
                                import convert
                            extra["clip_params"] = convert.load_checkpoint(
                                args.clip_checkpoint)
                    elif args.model_scale == "production":
                        cfg = dif.DIFFUSION_SVD
                    else:
                        cfg = dif.DIFFUSION_TINY
                    if args.num_inference_steps:
                        import dataclasses
                        cfg = dataclasses.replace(
                            cfg, num_steps=args.num_inference_steps)
                    shared_engine = infill_diffusion.make_engine(
                        preset, cfg=cfg, params=params, **extra)
                eng, drv = shared_engine
                drv_kw = {k: w for k, w in drv.items()
                          if k in ("mirror_left", "drift_correct",
                                   "apply_edge_blending")}
                if args.apply_edge_blending:
                    drv_kw["apply_edge_blending"] = True
                out = infill_diffusion.infill_sbs_video_diffusion(
                    v, mask, engine=eng, color_video=args.color_video,
                    max_frames=args.max_frames, **drv_kw)
            else:
                out = infill_video.infill_sbs_video(
                    v, mask, engine=args.infill_engine,
                    color_video=args.color_video,
                    max_frames=args.max_frames,
                    batch_size=args.batch_size)
            outs.append(out)
            print(f"infilled video saved: {out}")
        except Exception as e:
            # batch mode keeps going after a per-clip failure
            # (reference stereo_crafter_infill.py:349-354)
            if len(clips) == 1:
                raise
            print(f"infill FAILED for {v}: {e}; continuing")
    return outs


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
