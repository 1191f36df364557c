"""Scene-level fan-out — the reference's subprocess pool, re-designed.

The reference parallelizes across *scenes* with up to ``--parallel``
concurrent child processes and a poll-based wait loop
(movie_2_3D.py:41-59, 422-452). Here the same unit of work fans out as:

  - ``run_scenes_threaded``: host-side thread pool that overlaps video
    decode/encode of one scene with device compute of another, with the
    device serialized by a lock (the reference's _GPU_GATE semaphore
    pattern, stereo_crafter_infill.py:27) — the right shape for one chip.
  - ``shard_scenes``: deterministic scene -> host assignment for
    multi-host runs (each host runs the scenes whose index % host_count
    == host_index; outputs land in the shared filesystem and
    resume-by-existence makes overlap harmless).
  - ``run_scenes_processes``: optional process fan-out for host-bound
    stages (pure CPU video work), mirroring the reference's Popen pool.

Failure semantics follow the reference: per-scene exceptions are caught
and reported, remaining scenes continue (stereo_crafter_infill.py:349).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import subprocess
import threading
import traceback


class DeviceGate:
    """Serializes device sections across worker threads (the _GPU_GATE)."""

    def __init__(self):
        self._lock = threading.Lock()

    def __enter__(self):
        self._lock.acquire()
        return self

    def __exit__(self, *exc):
        self._lock.release()


def run_scenes_threaded(scene_fn, scenes, workers=2, gate=None):
    """Run ``scene_fn(scene, gate)`` over scenes with ``workers`` threads.

    ``scene_fn`` should wrap its device sections in ``with gate:`` so CPU
    pre/post-processing of one scene overlaps device work of another.
    Returns a list of (scene, result-or-exception).
    """
    gate = gate or DeviceGate()
    results = []
    lock = threading.Lock()

    def work(scene):
        try:
            out = scene_fn(scene, gate)
            with lock:
                results.append((scene, out))
        except Exception as e:  # continue-on-error like the reference
            traceback.print_exc()
            with lock:
                results.append((scene, e))

    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(work, scenes))
    return results


def shard_scenes(scenes, host_index=None, host_count=None):
    """The multi-host partition of the scene list. Defaults come from
    jax.process_index()/process_count() so the same movie command run on
    every host of a pod slice divides the work automatically."""
    if host_index is None or host_count is None:
        import jax
        host_index = jax.process_index()
        host_count = jax.process_count()
    return [s for i, s in enumerate(scenes) if i % host_count == host_index]


def run_scenes_processes(cmd_for_scene, scenes, parallel=None):
    """Popen fan-out for host-bound work: ``cmd_for_scene(scene)`` returns
    an argv list. Mirrors the reference's wait_for_first poll loop
    (movie_2_3D.py:41-59). Returns scenes whose command failed."""
    parallel = parallel or max(1, (os.cpu_count() or 2) // 2)
    pending = list(scenes)
    running = []  # (proc, scene)
    failed = []
    while pending or running:
        while pending and len(running) < parallel:
            scene = pending.pop(0)
            running.append((subprocess.Popen(cmd_for_scene(scene)), scene))
        done_i = None
        for i, (proc, scene) in enumerate(running):
            rc = proc.poll()
            if rc is not None:
                if rc != 0:
                    failed.append(scene)
                done_i = i
                break
        if done_i is not None:
            running.pop(done_i)
        elif running:
            running[0][0].wait()
    return failed
