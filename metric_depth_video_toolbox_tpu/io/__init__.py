"""Host-side I/O: lossless video (the system's data contract), JSON
sidecars, point-cloud/mesh export, and async host->device frame pipelines.
"""

from metric_depth_video_toolbox_tpu.io import video  # noqa: F401
from metric_depth_video_toolbox_tpu.io import sidecar  # noqa: F401
