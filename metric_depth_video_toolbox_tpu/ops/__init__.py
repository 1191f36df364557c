"""Device-side compute ops (jnp + Pallas).

Everything here is functional, shape-static, vmappable and jit-safe.
Frames are float32/bfloat16 arrays in RGB channel order; depth is float32
meters; batches are leading axes (T, H, W[, C]).
"""

from metric_depth_video_toolbox_tpu.ops import codec  # noqa: F401
from metric_depth_video_toolbox_tpu.ops import geometry  # noqa: F401
