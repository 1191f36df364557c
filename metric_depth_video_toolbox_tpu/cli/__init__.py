"""The reference's CLI surface, tool for tool.

Each module mirrors one reference script's argparse flags and file
contract (e.g. ``python -m metric_depth_video_toolbox_tpu.cli.
stereo_rerender --depth_video x_depth.mkv --xfov 60``), and ``main``
multiplexes them under one ``mdvt`` entry point (``mdvt stereo ...``).
"""
