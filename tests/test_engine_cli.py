"""Engine CLI family behaviors: sidecar emission, batch resume,
target_fps decimation (reference wrapper-script semantics)."""

import os

import numpy as np

from metric_depth_video_toolbox_tpu.io import sidecar, video as vio
from metric_depth_video_toolbox_tpu.pipeline import depth as dstage


def _clip(tmp_path, name="c.mkv", t=5, h=28, w=28, fps=24):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (t, h, w, 3)).astype(np.uint8)
    path = str(tmp_path / name)
    vio.save_rgb_video(frames, path, fps)
    return path


def test_unik3d_class_engine_writes_xfovs(tmp_path):
    clip = _clip(tmp_path)
    outs = dstage.run_batch("single_frame", clip, max_depth=10.0,
                            size="vitt", input_size=28, save_xfovs=True)
    xf = sidecar.load_xfovs(outs[0] + "_xfovs.json")
    assert len(xf) == 5


def test_run_batch_txt_list_and_resume(tmp_path):
    """The .txt batch protocol loads the model once and resumes by
    existence (reference video_metric_convert.py:182-206)."""
    a = _clip(tmp_path, "a.mkv")
    b = _clip(tmp_path, "b.mkv")
    lst = str(tmp_path / "batch.txt")
    with open(lst, "w") as f:
        f.write(f"# comment line\n{a}\n{b}\n")
    outs = dstage.run_batch("single_frame", lst, max_depth=10.0,
                            size="vitt", input_size=28)
    assert len(outs) == 2 and all(vio.is_valid_video(o) for o in outs)

    # resume: poison one output's mtime marker by deleting it; rerun
    # regenerates only that one (the other short-circuits by existence)
    os.remove(outs[0])
    t0 = os.path.getmtime(outs[1])
    outs2 = dstage.run_batch("single_frame", lst, max_depth=10.0,
                             size="vitt", input_size=28)
    assert vio.is_valid_video(outs2[0])
    assert os.path.getmtime(outs2[1]) == t0  # untouched


def test_target_fps_decimates(tmp_path):
    clip = _clip(tmp_path, "f.mkv", t=12, fps=24)
    frames, fps = vio.read_video_frames(clip, target_fps=12)
    assert frames.shape[0] == 6 and abs(fps - 12.0) < 1e-6
    frames, fps = vio.read_video_frames(clip, target_fps=-1)
    assert frames.shape[0] == 12 and fps == 24.0
    # target above source: unchanged
    frames, fps = vio.read_video_frames(clip, target_fps=60)
    assert frames.shape[0] == 12


def test_engine_dispatcher_cli():
    from metric_depth_video_toolbox_tpu.cli import depth_engines
    assert depth_engines.main(["--help"]) == 0
    assert depth_engines.main(["nonsense"]) == 2
    assert set(depth_engines.MAINS) >= {
        "unidepth", "unik3d", "moge", "depthpro", "da3", "depthcrafter",
        "geometrycrafter", "mvsa", "videoanythingmetric"}
