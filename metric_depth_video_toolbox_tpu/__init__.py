"""TPU-native metric depth video toolbox.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
calledit/metric_depth_video_toolbox (the "reference"): 2D video -> metric 3D
(per-pixel depth in meters, camera trajectories, stereo SBS/Touchly/VR180
video, point clouds and meshes).

Architecture (TPU-first, NOT a port):

- ``ops``      device compute: depth codec, camera geometry, forward-warp
               z-buffer rasterization, image filters, infill, solvers —
               plain jnp where XLA fuses well, Pallas kernels for the
               irregular hot loops.
- ``models``   Flax model families (ViT/DPT depth nets, video-temporal
               depth, diffusion UNet for infill, RAFT-style flow, point
               tracker) + torch-checkpoint converters.
- ``parallel`` mesh/sharding helpers: frame-batch data parallelism over
               ICI, temporal windowing as neighbor collectives, scene-level
               fan-out across hosts (replaces the reference's subprocess
               pool, reference movie_2_3D.py:41-59).
- ``pipeline`` stage framework with resume-by-existence + atomic outputs
               (reference depth_frames_helper.py:163-179 semantics) and the
               movie orchestrator.
- ``io``       host-side video (FFV1 lossless, the reference's data
               contract), JSON sidecars, PLY/OBJ export, async host->device
               frame pipelines.
- ``cli``      the reference's CLI surface, preserved tool-for-tool.

The central data contract is the RGB-encoded 16-bit metric depth video
(reference README.md:79-88): see ``ops.codec``.
"""

__version__ = "0.1.0"

from metric_depth_video_toolbox_tpu import ops  # noqa: F401
