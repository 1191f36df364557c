"""Movie orchestrator: full 2D movie -> SBS 3D (reference movie_2_3D.py).

Seven steps with the reference's file contract and resume-by-existence
semantics (plan_scene_files 'finished' flags, movie_2_3D.py:244-280):

  1. split source into per-scene FFV1 clips (atomic commit)
  2. estimate depth per scene (batched: one engine instance for the movie)
  3. generate subject masks
  4. find convergence depths
  5. render SBS stereo per scene
  6. disocclusion infill
  7. concatenate into <movie>_SBS.mkv

Re-design notes (TPU-first): the reference fans scenes out over
subprocesses (movie_2_3D.py:41-59) because its unit of compute is a
Python process. Here a single process drives the device with batched
steps, host video I/O overlaps device compute via reader threads, and
multi-chip/multi-host fan-out shards *scenes* over hosts through
``parallel.scheduler``. Per-scene Engine/Infill/Convergence overrides via
extra CSV columns are honored (movie_2_3D.py:264-267, 326-328).

No ffmpeg binary is assumed: concat is cv2-based (lossless FFV1 or mp4),
so audio passthrough — which the reference does with ffmpeg — is gated on
an ffmpeg binary being present.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

from metric_depth_video_toolbox_tpu.io import sidecar
from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.pipeline import convergence as conv_stage
from metric_depth_video_toolbox_tpu.pipeline import depth as depth_stage
from metric_depth_video_toolbox_tpu.pipeline import masks as mask_stage
from metric_depth_video_toolbox_tpu.pipeline import scenes as scene_mod
from metric_depth_video_toolbox_tpu.pipeline import stereo as stereo_stage


def plan_scene_files(scenes, output_dir, end_scene=-1):
    """Attach per-scene paths + finished flags (movie_2_3D.py:244-280)."""
    out = []
    for scene in scenes:
        num = str(scene["Scene Number"])
        base = os.path.join(output_dir, f"scene_{num}.mkv")
        scene["scene_video_file"] = base
        scene["depth_video_file"] = base + "_depth.mkv"
        scene["mask_video_file"] = base + "_mask.mkv"
        scene["xfovs_file"] = scene["depth_video_file"] + "_xfovs.json"
        scene["convergence_file"] = (scene["depth_video_file"]
                                     + "_convergence_depths.json")
        scene["sbs"] = scene["depth_video_file"] + "_stereo.mkv"
        scene["sbs_infill"] = scene["sbs"] + "_infillmask.mkv"
        scene["infilled"] = scene["sbs"] + "_infilled.mkv"
        scene["infill"] = not scene.get("Infill", "") == "No"
        scene["convergence"] = not scene.get("Convergence", "") == "No"
        scene["finished"] = (os.path.exists(scene["sbs"])
                             or os.path.exists(scene["infilled"]))
        out.append(scene)
        if end_scene != -1 and int(num) == end_scene:
            break
    return out


def step1_create_scene_videos(color_video, scenes):
    todo = [s for s in scenes if not s["finished"]
            and not os.path.exists(s["scene_video_file"])]
    if not todo:
        return
    reader = vio.VideoReader(color_video)
    fps = reader.fps
    it = iter(reader)
    for scene in scenes:
        n = int(scene["Length (frames)"])
        need = (not scene["finished"]
                and not os.path.exists(scene["scene_video_file"]))
        writer = (vio.VideoWriter(scene["scene_video_file"], fps,
                                  reader.width, reader.height)
                  if need else None)
        for _ in range(n):
            try:
                frame = next(it)
            except StopIteration:
                break
            if writer is not None:
                writer.write(frame)
        if writer is not None:
            writer.commit()
    reader.close()


# per-scene Engine override names that map onto the single_frame engine
# with a distinguishing variant (SURVEY.md §2.2)
_SINGLE_FRAME_NAMES = ("unidepth", "unik3d", "moge", "depthpro",
                       "single_frame")


def _two_pass_single_frame(videos, variant, max_depth, engine_kwargs):
    """Reference movie_2_3D.py:337-344: for single-frame engines the
    movie runs the engine TWICE per scene — a FOV-estimation pass, then
    a FOV-locked pass with the median estimate (so per-frame focal
    jitter never reaches the stereo stage)."""
    import numpy as np
    kw = dict(engine_kwargs or {})
    kw.pop("xfov", None)
    for v in videos:
        out = v + "_depth.mkv"
        if vio.is_valid_video(out):
            continue
        frames, _fps = vio.read_video_frames(v)
        est = depth_stage.SingleFrameEngine(
            max_depth=max_depth, variant="unik3d", **kw)
        _, fovs = est.infer_video(frames, return_fov=True)
        xfov = float(np.median(fovs)) if fovs is not None else 60.0
        print(f"{v}: two-pass FOV lock at xfov={xfov:.1f} deg")
        variant2 = variant if variant not in ("single_frame", "da") \
            else "unik3d"
        eng = depth_stage.SingleFrameEngine(
            max_depth=max_depth, variant=variant2, xfov=xfov, **kw)
        depth_stage.run_single_frame(
            v, max_depth=max_depth, engine=eng, xfov=xfov,
            save_xfovs=True)
        print(f"depth video saved: {out}")


def step2_estimate_depth(scenes, engine="vda", max_depth=100.0,
                         engine_kwargs=None):
    """Batched depth estimation: one engine instance per engine type for
    the whole movie (the reference's .txt batching,
    movie_2_3D.py:311-384)."""
    by_engine = {}
    for scene in scenes:
        if scene["finished"] or vio.is_valid_video(scene["depth_video_file"]):
            continue
        eng = scene.get("Engine", "") or engine
        variant = "da"
        if eng == "mvsa":
            # MVS needs a camera track the movie pipeline doesn't have
            # at depth time (reference movie_2_3D has no mvsa path
            # either); fall back to a self-contained engine
            print(f"scene {scene['Scene Number']}: mvsa needs "
                  "--transformation_file; using single_frame instead")
            eng = "single_frame"
        elif eng in _SINGLE_FRAME_NAMES:
            variant = eng if eng != "single_frame" else "da"
            eng = "single_frame"
        elif eng == "videoanythingmetric":
            eng = "vda"
        elif eng not in depth_stage.ENGINES:
            known = sorted(set(depth_stage.ENGINES)
                           | set(_SINGLE_FRAME_NAMES))
            print(f"WARNING: scene {scene['Scene Number']}: unknown "
                  f"Engine override '{eng}' (known: {', '.join(known)}); "
                  f"falling back to '{engine}'")
            eng = engine if engine in depth_stage.ENGINES else "vda"
        by_engine.setdefault((eng, variant), []).append(
            scene["scene_video_file"])
    for (eng, variant), videos in by_engine.items():
        if eng == "depthcrafter":
            # the diffusion engine re-metricizes against a reference;
            # the reference movie first runs a single-frame metric pass
            # per scene to make one (movie_2_3D.py:337-369)
            for v in videos:
                ref = v + "_ref_depth.mkv"
                if not vio.is_valid_video(ref):
                    tmp = depth_stage.run_batch(
                        "single_frame", v, max_depth=max_depth,
                        **(engine_kwargs or {}))[0]
                    os.replace(tmp, ref)
                depth_stage.run_batch(
                    eng, v, max_depth=max_depth,
                    reference_depth_video=ref, **(engine_kwargs or {}))
            continue
        if eng == "single_frame":
            # two-pass FOV flow (reference movie_2_3D.py:337-344)
            _two_pass_single_frame(videos, variant, max_depth,
                                   engine_kwargs)
            continue
        depth_stage.run_batch(eng, _as_list(videos), max_depth=max_depth,
                              **(engine_kwargs or {}))


def _as_list(videos):
    class _List(list):
        pass
    return videos if len(videos) > 1 else videos[0] if videos else []


def step3_generate_masks(scenes, mask_engine=None):
    eng = mask_engine
    for scene in scenes:
        if scene["finished"] or os.path.exists(scene["mask_video_file"]):
            continue
        if eng is None:
            eng = mask_stage.MaskEngine()
        mask_stage.generate_video_mask(scene["scene_video_file"],
                                       output=scene["mask_video_file"],
                                       engine=eng)


def step4_find_convergence(scenes, max_depth=100.0):
    for scene in scenes:
        if (scene["finished"] or not scene["convergence"]
                or os.path.exists(scene["convergence_file"])):
            continue
        if not os.path.exists(scene["depth_video_file"]):
            continue
        mask = (scene["mask_video_file"]
                if os.path.exists(scene["mask_video_file"]) else None)
        conv_stage.find_convergence_depths(
            scene["depth_video_file"], mask_video=mask,
            max_depth=max_depth, output=scene["convergence_file"])


def step5_render_sbs(scenes, xfov=None, max_depth=100.0, infill_mask=True,
                     batch_size=8, parallel=0, **stereo_kwargs):
    """Render each scene's SBS output. ``parallel`` > 1 runs scenes on
    worker threads — the reference's subprocess fan-out
    (movie_2_3D.py:422-452) becomes host-IO overlap here: video
    decode/encode of one scene overlaps device compute of another (the
    device itself is one resource; the batched stereo step keeps it
    busy)."""
    todo = [s for s in scenes
            if not (s["finished"] or os.path.exists(s["sbs"]))]

    def render(scene, gate=None):
        conv = None
        if scene["convergence"] and os.path.exists(scene["convergence_file"]):
            conv = sidecar.load_convergence_depths(scene["convergence_file"])
        xfovs = None
        if os.path.exists(scene["xfovs_file"]):
            xfovs = sidecar.load_xfovs(scene["xfovs_file"])
        return stereo_stage.render_stereo_video(
            scene["depth_video_file"],
            color_video=scene["scene_video_file"],
            output=scene["sbs"], xfov=xfov if xfovs is None else None,
            xfovs=xfovs, convergence_depths=conv, max_depth=max_depth,
            infill_mask=infill_mask and scene["infill"],
            batch_size=batch_size, **stereo_kwargs)

    if parallel and parallel > 1 and len(todo) > 1:
        from metric_depth_video_toolbox_tpu.parallel import scheduler
        results = scheduler.run_scenes_threaded(render, todo,
                                                workers=parallel)
        errs = [r for _, r in results if isinstance(r, Exception)]
        if errs:
            raise RuntimeError(f"{len(errs)} scene renders failed: "
                               f"{errs[0]}")
    else:
        for scene in todo:
            render(scene)


def step6_infill(scenes, infill_engine="basic", **kw):
    """Dispatch per-scene infill (movie_2_3D.py:454-503). 'none' skips;
    'basic' = the in-house normal-march infill; diffusion engines come
    from pipeline.infill_video."""
    if infill_engine == "none":
        return
    from metric_depth_video_toolbox_tpu.pipeline import infill_video
    for scene in scenes:
        if not scene["infill"] or os.path.exists(scene["infilled"]):
            continue
        if not os.path.exists(scene["sbs"]):
            continue
        if not os.path.exists(scene["sbs_infill"]):
            continue
        infill_video.infill_sbs_video(
            scene["sbs"], scene["sbs_infill"], output=scene["infilled"],
            engine=infill_engine, color_video=scene["scene_video_file"],
            **kw)


def validate_video_lengths(scenes):
    """Every scene output must match the CSV length
    (movie_2_3D.py:70-100)."""
    bad = []
    for scene in scenes:
        target = (scene["infilled"] if os.path.exists(scene["infilled"])
                  else scene["sbs"])
        if not os.path.exists(target):
            bad.append((scene["Scene Number"], "missing"))
            continue
        n, _, _, _ = vio.video_info(target)
        if n != int(scene["Length (frames)"]):
            bad.append((scene["Scene Number"], f"{n} != "
                        f"{scene['Length (frames)']}"))
    return bad


def step7_concat(scenes, color_video, output=None, compressed=False):
    """Concatenate scene outputs into the final SBS movie. Lossless FFV1
    via cv2; audio mux only if an ffmpeg binary exists (the reference
    requires ffmpeg, movie_2_3D.py:702-778)."""
    first = None
    for scene in scenes:
        target = (scene["infilled"] if os.path.exists(scene["infilled"])
                  else scene["sbs"])
        if os.path.exists(target):
            first = target
            break
    if first is None:
        raise RuntimeError("no rendered scenes to concatenate")
    _, w, h, fps = vio.video_info(first)
    output = output or (os.path.splitext(color_video)[0]
                        + ("_SBS.mp4" if compressed else "_SBS.mkv"))
    writer = vio.VideoWriter(output, fps, w, h,
                             codec_fourcc="avc1" if compressed else "FFV1")
    total = 0
    for scene in scenes:
        target = (scene["infilled"] if os.path.exists(scene["infilled"])
                  else scene["sbs"])
        if not os.path.exists(target):
            continue
        with vio.VideoReader(target) as r:
            for frame in r:
                writer.write(frame)
                total += 1
    writer.commit(total)

    if shutil.which("ffmpeg"):
        # mux source audio + tag SBS stereo mode (reference
        # movie_2_3D.py:752-762); AAC re-encode fallback when stream
        # copy fails (:765-778)
        muxed = output + ".audio.mkv"
        base = ["ffmpeg", "-y", "-i", output, "-i", color_video,
                "-map", "0:v", "-map", "1:a?",
                "-metadata:s:v", "stereo_mode=left_right"]
        r = subprocess.run(base + ["-c", "copy", muxed],
                           capture_output=True)
        if not (r.returncode == 0 and os.path.exists(muxed)
                and os.path.getsize(muxed) > 0):
            r = subprocess.run(
                base + ["-c:v", "copy", "-c:a", "aac", muxed],
                capture_output=True)
        if r.returncode == 0 and os.path.exists(muxed) \
                and os.path.getsize(muxed) > 0:
            os.replace(muxed, output)
    elif output.endswith(".mkv"):
        # native audio passthrough (io/mkv.py remux — copy the source's
        # audio blocks, no transcode), the reference's ffmpeg audio mux
        # (movie_2_3D.py:723-778) without an ffmpeg binary. Matroska
        # sources only; other containers still need ffmpeg.
        from metric_depth_video_toolbox_tpu.io import mkv as mkv_mod
        try:
            if mkv_mod.has_audio_track(color_video):
                mkv_mod.mux_audio(output, color_video)
                print(f"muxed source audio into {output} (native remux)")
            else:
                print("source has no (Matroska) audio track — final "
                      "movie is silent")
        except Exception as e:
            print(f"WARNING: native audio mux failed ({e}) — the final "
                  "movie has NO AUDIO. Mux manually: ffmpeg -i "
                  f"{output} -i {color_video} -map 0:v -map 1:a? "
                  "-c copy out.mkv")
    if output.endswith(".mkv"):
        # Matroska StereoMode on the video track — players key off this
        # to enable side-by-side mode. Written natively (io/mkv.py
        # remux; no ffmpeg needed) so the tag is guaranteed even where
        # ffmpeg's -metadata (which only sets a tag string, not the
        # track StereoMode element) or ffmpeg itself is unavailable.
        from metric_depth_video_toolbox_tpu.io import mkv as mkv_mod
        try:
            mkv_mod.set_stereo_mode(output,
                                    mkv_mod.STEREO_SBS_LEFT_FIRST)
        except Exception as e:  # tag is metadata; never lose the movie
            print(f"WARNING: could not tag StereoMode on {output}: {e}")
    return output


def movie_to_3d(color_video, output_dir=None, engine="vda",
                infill_engine="basic", xfov=None, max_depth=100.0,
                max_scene_frames=1500, scene_file=None, end_scene=-1,
                batch_size=16, engine_kwargs=None, stereo_kwargs=None,
                mask_engine=None, generate_masks=True,
                csv_delimiter=",", no_render=False, parallel=0):
    """The full pipeline (reference movie_2_3D.main, :785-830).
    Returns the final movie path. Fully resumable."""
    output_dir = output_dir or (os.path.splitext(color_video)[0] + "_3d")
    os.makedirs(output_dir, exist_ok=True)
    scene_file = scene_mod.ensure_scene_file(color_video, output_dir,
                                             scene_file)
    scenes = scene_mod.split_scenes(
        scene_mod.read_scene_csv(scene_file, delimiter=csv_delimiter),
        max_scene_frames=max_scene_frames)
    scenes = plan_scene_files(scenes, output_dir, end_scene)

    step1_create_scene_videos(color_video, scenes)
    step2_estimate_depth(scenes, engine=engine, max_depth=max_depth,
                         engine_kwargs=engine_kwargs)
    if generate_masks:
        step3_generate_masks(scenes, mask_engine=mask_engine)
    step4_find_convergence(scenes, max_depth=max_depth)
    if no_render:
        # reference --no_render: stop before rendering and later steps
        return None
    step5_render_sbs(scenes, xfov=xfov, max_depth=max_depth,
                     batch_size=batch_size, parallel=parallel,
                     **(stereo_kwargs or {}))
    step6_infill(scenes, infill_engine=infill_engine)
    bad = validate_video_lengths(scenes)
    if bad:
        raise RuntimeError(f"scene length validation failed: {bad}")
    return step7_concat(scenes, color_video)
