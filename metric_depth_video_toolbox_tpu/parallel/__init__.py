"""Device-mesh parallelism.

The reference's only parallelism is subprocess fan-out over scenes
(movie_2_3D.py:41-59,422-452) and a thread+semaphore GPU gate
(stereo_crafter_infill.py:27). Here parallel scaling is native:

- ``mesh``:     build jax.sharding.Mesh over (data, model) axes
- ``sharding``: parameter/batch PartitionSpec rules (DP over frames,
                TP over attention heads / MLP hidden)
- ``train``:    a fully sharded train step (the dryrun_multichip target)
- ``scheduler``: scene-level fan-out across processes/hosts with
                resume-by-existence semantics
"""

from metric_depth_video_toolbox_tpu.parallel import mesh  # noqa: F401
from metric_depth_video_toolbox_tpu.parallel import sharding  # noqa: F401
