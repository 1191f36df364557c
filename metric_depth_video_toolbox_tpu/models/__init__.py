"""Flax model families.

TPU-native re-implementations of the model classes the reference wraps
(external torch repos, reference install_mdvtoolbox.sh:24-252):

- ``vit`` / ``dpt`` / ``depth_anything``: DINOv2-ViT + DPT head depth
  estimators (Depth-Anything-V2-class, the reference's metric anchor and
  the backbone family of VDA/DA3/PromptDA).
- ``video_depth``: temporally-consistent video depth (VDA-class windowed
  inference with temporal attention).
- ``diffusion``: SVD-style video diffusion UNet (DepthCrafter /
  StereoCrafter-class denoisers).
- ``raft``: recurrent optical flow.
- ``tracker``: CoTracker-class point tracking.
- ``convert``: torch-checkpoint -> Flax parameter converters.

All models are shape-static, bfloat16-friendly, and annotated with
sharding-friendly einsum structure (heads / hidden dims divisible by
typical mesh axes).
"""
