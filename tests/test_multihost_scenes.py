"""Multi-host scene fan-out (SURVEY §2.5 TPU-native mapping): the same
movie command run on every host of a slice partitions scenes by
process_index, and resume-by-existence makes any overlap (a host
re-running another's scene after a failover) harmless.

Simulated with explicit host_index/host_count (a real pod run differs
only in where those two integers come from), plus a 2-process fan-out
through run_scenes_processes exercising real process isolation.
"""

import os
import sys

import numpy as np

from metric_depth_video_toolbox_tpu.parallel import scheduler


def test_shard_scenes_partitions_completely():
    scenes = [f"s{i}" for i in range(11)]
    shards = [scheduler.shard_scenes(scenes, host_index=i, host_count=3)
              for i in range(3)]
    # disjoint and complete
    flat = [s for sh in shards for s in sh]
    assert sorted(flat) == sorted(scenes)
    assert len(set(flat)) == len(flat)
    # balanced within 1
    sizes = [len(sh) for sh in shards]
    assert max(sizes) - min(sizes) <= 1


def test_two_host_overlap_is_harmless(tmp_path):
    """Both 'hosts' process an overlapping scene list; every scene's
    output is produced exactly once thanks to resume-by-existence (the
    per-scene-per-stage file contract, reference movie_2_3D.py:264-276)."""
    from metric_depth_video_toolbox_tpu.io import video as vio

    rng = np.random.default_rng(0)
    scenes = []
    for i in range(4):
        clip = str(tmp_path / f"scene{i}.mkv")
        vio.save_rgb_video(
            rng.integers(0, 255, (2, 16, 16, 3), np.uint8), clip, 24)
        scenes.append(clip)

    writes = []

    def process(host_scenes):
        for clip in host_scenes:
            out = clip + "_out.mkv"
            if vio.is_valid_video(out):  # resume-by-existence
                continue
            frames, fps = vio.read_video_frames(clip)
            vio.save_rgb_video(frames, out, fps)
            writes.append(out)

    shard0 = scheduler.shard_scenes(scenes, host_index=0, host_count=2)
    shard1 = scheduler.shard_scenes(scenes, host_index=1, host_count=2)
    process(shard0)
    # host 1 failover-reprocesses EVERYTHING (its shard + host 0's)
    process(scenes)
    process(shard1)
    # every scene produced, and none written twice
    for clip in scenes:
        assert vio.is_valid_video(clip + "_out.mkv")
    assert len(writes) == len(scenes)


def test_process_fanout_two_workers(tmp_path):
    """run_scenes_processes drives REAL subprocesses over a shard pair;
    both shards complete and a failing scene is reported."""
    script = tmp_path / "worker.py"
    script.write_text(
        "import sys\n"
        "out = sys.argv[1]\n"
        "if out.endswith('bad'):\n"
        "    sys.exit(3)\n"
        "open(out, 'w').write('done')\n")
    scenes = [str(tmp_path / f"o{i}") for i in range(5)] + \
        [str(tmp_path / "bad")]

    def cmd(scene):
        return [sys.executable, str(script), scene]

    failed = scheduler.run_scenes_processes(cmd, scenes, parallel=2)
    for s in scenes[:5]:
        assert os.path.exists(s)
    assert failed == [str(tmp_path / "bad")]
