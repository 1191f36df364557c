"""Per-engine depth CLI family — one thin wrapper per reference script.

Each reference depth wrapper script maps to a registry engine plus its
distinguishing sidecar behavior (SURVEY.md §2.2):

  unidepth_video.py      single-frame metric, FOV required
  unik3d_video.py        single-frame metric, FOV optional, writes xfovs
  moge_video.py          single-frame, optional fov_x, writes xfovs
  depthpro_video.py      single-frame, estimates focal itself
  videoanythingmetric_video.py  video model, direct metric output
  video_da3.py           DA3 windowed multi-view (depth + poses + xfovs)
  depthcrafter_video.py  diffusion video depth vs a reference depth video
  geometrycrafter_video.py  diffusion point-map stabilizer
  video_mvsa.py          pose-conditioned MVS (uses transformations+fov)
"""

from __future__ import annotations

import argparse


def _base_parser(desc, require_fov=False):
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--color_video", type=str, required=True)
    p.add_argument("--max_depth", default=100, type=float)
    p.add_argument("--max_frames", "--max_len", dest="max_frames",
                   default=-1, type=int)
    p.add_argument("--target_fps", default=-1, type=float,
                   help="resample the input to this fps before "
                        "inference (-1 = original fps)")
    p.add_argument("--output_dir", type=str,
                   help="write outputs here instead of next to the "
                        "input video")
    p.add_argument("--xfov", type=float, required=require_fov)
    p.add_argument("--yfov", type=float)
    p.add_argument("--model_size", default="vits")
    p.add_argument("--input_size", default=518, type=int)
    p.add_argument("--checkpoint", type=str)
    p.add_argument("--quantize", choices=("none", "int8"), default="none",
                   help="int8 = dynamically quantized backbone matmuls "
                        "(memory/bandwidth mode; no separate checkpoint "
                        "needed). NOT a speed win on the current "
                        "toolchain: measured ~0.96x bf16 fps on v5e "
                        "(ops/quant.py)")
    return p


def _quant(args):
    q = getattr(args, "quantize", "none")
    if q == "int8":
        print("note: --quantize int8 measured ~0.96x bf16 fps on this "
              "TPU runtime (the XLA int8 dot does not reach the MXU "
              "double-rate path); it halves matmul operand HBM traffic "
              "but is not faster. See ops/quant.py.")
    return None if q in (None, "none") else q


def _relocate(outs, output_dir):
    """Move outputs (+ sidecars) into --output_dir (reference
    unidepth_video.py:22,77-78 writes into an output dir)."""
    import os
    import shutil
    if not output_dir:
        return outs
    os.makedirs(output_dir, exist_ok=True)
    moved = []
    for o in outs:
        for suffix in ("", "_xfovs.json", "_transformations.json"):
            src = o + suffix
            if os.path.exists(src):
                shutil.move(src, os.path.join(output_dir,
                                              os.path.basename(src)))
        moved.append(os.path.join(output_dir, os.path.basename(o)))
    return moved


def _run_single_frame(args, save_xfovs, variant="da"):
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    params = None
    if args.checkpoint:
        from metric_depth_video_toolbox_tpu.models import convert
        params = convert.load_checkpoint(args.checkpoint)
    outs = dstage.run_batch(
        "single_frame", args.color_video, max_depth=args.max_depth,
        max_frames=args.max_frames, size=args.model_size,
        input_size=args.input_size, params=params, xfov=args.xfov,
        yfov=args.yfov, save_xfovs=save_xfovs, variant=variant,
        target_fps=args.target_fps, quantize=_quant(args))
    outs = _relocate(outs, args.output_dir)
    for o in outs:
        print(f"depth video saved: {o}")
    return outs


def unidepth_main(argv=None):
    """K-conditioned inference: --xfov is mandatory and the camera rays
    condition the backbone (reference unidepth_video.py:70-74)."""
    args = _base_parser("UniDepth-class per-frame metric depth "
                        "(FOV required).", require_fov=True).parse_args(argv)
    return _run_single_frame(args, save_xfovs=False, variant="unidepth")


def unik3d_main(argv=None):
    """Per-frame focal re-estimated from the unprojected 3D points
    (reference unik3d_video.py:22-101) -> *_xfovs.json."""
    args = _base_parser("UniK3D-class per-frame metric depth; estimates "
                        "per-frame FOV -> *_xfovs.json.").parse_args(argv)
    return _run_single_frame(args, save_xfovs=True, variant="unik3d")


def moge_main(argv=None):
    """NaN-sky -> max_depth (reference moge_video.py:171); optional
    --xfov conditions the model, else the FOV head estimates it."""
    args = _base_parser("MoGe-class per-frame depth with optional fov_x; "
                        "writes xfovs.").parse_args(argv)
    return _run_single_frame(args, save_xfovs=True, variant="moge")


def depthpro_main(argv=None):
    """The model estimates its own focal length per frame (reference
    depthpro_video.py:154-159 focallength_px) -> *_xfovs.json."""
    args = _base_parser("DepthPro-class per-frame metric depth (estimates "
                        "focal length).").parse_args(argv)
    return _run_single_frame(args, save_xfovs=True, variant="depthpro")


def videoanythingmetric_main(argv=None):
    p = _base_parser("Metric-Video-Depth-Anything-class direct metric "
                     "video depth.")
    p.add_argument("--fp32", action="store_true",
                   help="full-precision inference (default bf16 on the "
                        "MXU; reference videoanythingmetric_video.py:23)")
    args = p.parse_args(argv)
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    outs = dstage.run_batch("vda", args.color_video,
                            max_depth=args.max_depth,
                            max_frames=args.max_frames,
                            size=args.model_size,
                            input_size=args.input_size,
                            fp32=args.fp32,
                            target_fps=args.target_fps,
                            quantize=_quant(args))
    for o in outs:
        print(f"depth video saved: {o}")
    return outs


def da3_main(argv=None):
    p = _base_parser("DA3-class windowed multi-view depth + poses.")
    # production default is the VIT_L-class model (reference
    # video_da3.py:274 defaults to nested-giant-large)
    p.set_defaults(model_size="vitl")
    p.add_argument("--images_per_batch", default=40, type=int)
    p.add_argument("--batch_overlap", default=6, type=int)
    p.add_argument("--nr_of_ref_frames", default=6, type=int)
    p.add_argument("--da3_resolution", default=504, type=int)
    p.add_argument("--backbone_checkpoint", type=str,
                   help="converted DINOv2 ViT checkpoint to graft into "
                        "the DA3 backbone (the dominant parameter mass; "
                        "DA3 is DINOv2-based, reference video_da3.py:274)")
    p.add_argument("--xfov_file", type=str,
                   help="per-frame xfov json (e.g. *_xfovs.json): "
                        "known-intrinsics conditioning, reference "
                        "video_da3.py:92-112")
    args = p.parse_args(argv)
    xfovs = None
    if args.xfov_file:
        from metric_depth_video_toolbox_tpu.io import sidecar
        xfovs = sidecar.load_xfovs(args.xfov_file)
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    outs = dstage.run_batch(
        "da3", args.color_video, max_depth=args.max_depth,
        max_frames=args.max_frames, size=args.model_size,
        images_per_batch=args.images_per_batch,
        overlap=args.batch_overlap, num_ref_frames=args.nr_of_ref_frames,
        resolution=args.da3_resolution,
        backbone=args.backbone_checkpoint,
        xfov=args.xfov, yfov=args.yfov, xfovs=xfovs,
        quantize=_quant(args))
    for o in outs:
        print(f"depth video saved: {o}")
    return outs


def _diffusion_extra(args):
    """cfg/params for the diffusion engines: --model svd (or any
    --checkpoint — DepthCrafter/GeometryCrafter are SVD fine-tunes)
    selects the production weight-exact SVD graph (models.svd)."""
    extra = {}
    if getattr(args, "model", "tiny") == "svd" or args.checkpoint:
        from metric_depth_video_toolbox_tpu.models import svd as svdm
        extra["cfg"] = svdm.SVDConfig()
    if args.checkpoint:
        from metric_depth_video_toolbox_tpu.models import convert
        extra["params"] = convert.load_checkpoint(args.checkpoint)
    return extra


def _add_diffusion_model_flag(p):
    p.add_argument("--model", choices=("tiny", "svd"), default="tiny",
                   help="'svd' = production SVD-class graph (implied by "
                        "--checkpoint); 'tiny' = fast random-weight "
                        "stand-in for smoke runs")
    p.add_argument("--max_res", type=int,
                   help="cap the diffusion working resolution's long "
                        "side (aspect-preserving, rounded to x64; "
                        "reference depthcrafter_video.py:52 default "
                        "768)")


def _diffusion_work_hw(args, default=None):
    """--max_res -> work_hw from the input video's aspect ratio."""
    if not getattr(args, "max_res", None):
        return {}
    import cv2
    cap = cv2.VideoCapture(args.color_video)
    w = cap.get(cv2.CAP_PROP_FRAME_WIDTH) or 16
    h = cap.get(cv2.CAP_PROP_FRAME_HEIGHT) or 9
    cap.release()
    scale = args.max_res / max(w, h)
    rh = max(64, int(round(h * scale / 64)) * 64)
    rw = max(64, int(round(w * scale / 64)) * 64)
    return {"work_hw": (rh, rw)}


def depthcrafter_main(argv=None):
    p = _base_parser("DepthCrafter-class diffusion video depth "
                     "(requires --depth_video reference).")
    p.add_argument("--depth_video", type=str, required=True)
    p.add_argument("--window", default=110, type=int)
    p.add_argument("--overlap", default=25, type=int)
    p.add_argument("--use_depth_prompting", action="store_true",
                   help="experimental: prompt the sampler with the "
                        "reference depth's VAE latent (SDEdit-style "
                        "init; reference depthcrafter_video.py:131-177)")
    _add_diffusion_model_flag(p)
    args = p.parse_args(argv)
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    outs = dstage.run_batch(
        "depthcrafter", args.color_video, max_depth=args.max_depth,
        max_frames=args.max_frames,
        reference_depth_video=args.depth_video, window=args.window,
        overlap=args.overlap,
        use_depth_prompting=args.use_depth_prompting,
        **_diffusion_work_hw(args), **_diffusion_extra(args))
    for o in outs:
        print(f"depth video saved: {o}")
    return outs


def geometrycrafter_main(argv=None):
    """Distinct stabilizer engine: the prior depth is projected to POINT
    MAPS and the diffusion denoiser is conditioned on the point-map
    latent alongside the RGB latent (reference
    geometrycrafter_video.py:24-93 project_depth_maps + :345-421); with
    no --depth_video prior, a MoGe-class pass supplies it (:101-153)."""
    p = _base_parser("GeometryCrafter-class diffusion depth stabilizer "
                     "(prior = MoGe or a depth video).")
    p.add_argument("--depth_video", type=str,
                   help="prior depth video to stabilize")
    p.add_argument("--window", default=110, type=int)
    p.add_argument("--overlap", default=5, type=int)
    p.add_argument("--xfov_file", type=str,
                   help="per-frame xfov json for the point-map "
                        "unprojection (reference geometrycrafter_video"
                        ".py xfov_file); the median FOV is used — the "
                        "point maps are median-z normalized, so "
                        "per-scene FOV drift is absorbed")
    p.add_argument("--pmap_vae_checkpoint", type=str,
                   help="converted point_map_vae checkpoint (reference "
                        "geometrycrafter_video.py:311-317): dedicated "
                        "point-map KL encoder + temporal decoder (xyz + "
                        "valid mask) replaces the shared denoiser VAE "
                        "for the point-map latents")
    _add_diffusion_model_flag(p)
    args = p.parse_args(argv)
    xfov = args.xfov
    if args.xfov_file:
        import numpy as np
        from metric_depth_video_toolbox_tpu.io import sidecar
        xfov = float(np.median(sidecar.load_xfovs(args.xfov_file)))
    extra = _diffusion_extra(args)
    if args.pmap_vae_checkpoint:
        from metric_depth_video_toolbox_tpu.models import convert
        extra["pmap_vae_params"] = convert.load_checkpoint(
            args.pmap_vae_checkpoint)
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    outs = dstage.run_batch(
        "geometrycrafter", args.color_video, max_depth=args.max_depth,
        max_frames=args.max_frames, xfov=xfov,
        reference_depth_video=args.depth_video,
        window=args.window, overlap=args.overlap, size=args.model_size,
        **_diffusion_work_hw(args), **extra)
    for o in outs:
        print(f"depth video saved: {o}")
    return outs


def mvsa_main(argv=None):
    """Plane-sweep cost-volume MVS (reference video_mvsa.py:70-78 flags:
    window = ref count around target, resize_w = model input width)."""
    p = _base_parser("MVSAnywhere-class pose-conditioned multi-view "
                     "stereo depth.", require_fov=True)
    p.add_argument("--transformation_file", type=str, required=True)
    p.add_argument("--window", default=7, type=int,
                   help="ref count around target (odd recommended)")
    p.add_argument("--resize_w", default=1024, type=int,
                   help="model input width; keeps aspect")
    p.add_argument("--rescale_to_cost_volume", action="store_true",
                   help="apply the median cost-volume/refined depth "
                   "ratio per frame")
    p.add_argument("--fast_cost_volume", action="store_true",
                   help="speed over quality: half the plane-sweep "
                        "hypotheses (reference video_mvsa.py:77)")
    args = p.parse_args(argv)
    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage
    params = None
    if args.checkpoint:
        from metric_depth_video_toolbox_tpu.models import convert
        params = convert.load_checkpoint(args.checkpoint)
    outs = dstage.run_batch(
        "mvsa", args.color_video, max_depth=args.max_depth,
        max_frames=args.max_frames, xfov=args.xfov, yfov=args.yfov,
        transformation_file=args.transformation_file,
        size=args.model_size, window=args.window, resize_w=args.resize_w,
        rescale_to_cost_volume=args.rescale_to_cost_volume,
        fast_cost_volume=args.fast_cost_volume, params=params)
    for o in outs:
        print(f"depth video saved: {o}")
    return outs


MAINS = {
    "unidepth": unidepth_main,
    "unik3d": unik3d_main,
    "moge": moge_main,
    "depthpro": depthpro_main,
    "videoanythingmetric": videoanythingmetric_main,
    "da3": da3_main,
    "depthcrafter": depthcrafter_main,
    "geometrycrafter": geometrycrafter_main,
    "mvsa": mvsa_main,
}


def main(argv=None):
    """``mdvt engine <name> ...`` — dispatch to one engine CLI."""
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: mdvt engine <name> [engine flags]\n"
              f"engines: {', '.join(MAINS)}")
        return 0 if argv else 2
    name = argv[0]
    if name not in MAINS:
        print(f"unknown engine '{name}'; one of: {', '.join(MAINS)}")
        return 2
    return MAINS[name](argv[1:])


if __name__ == "__main__":
    main()
