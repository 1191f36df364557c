"""Shared utilities: timing/profiling, progress reporting, logging."""

from metric_depth_video_toolbox_tpu.utils.timer import timer, Progress  # noqa: F401
