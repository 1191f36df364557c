"""Voxel downsampling, including the perspective-aware variant.

The reference's background accumulator downsamples its growing point
cloud with a perspective-aware trick: warp points to (x/z, y/z, log z)
space, voxel-downsample there, unwarp (depth_map_tools.py:1136-1182 via
Open3D's C++ voxel grid). Here both plain and perspective-aware variants
are host-side voxel-hash reductions (np.add.at over unique cells — the
data lives on host between frames anyway), with a device path available
through ops.solvers-style segment ops if the cloud ever stays in HBM.
"""

from __future__ import annotations

import numpy as np


def voxel_downsample(points, colors=None, voxel_size=0.01):
    """Average points (and colors) within each voxel."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    keys = np.floor(pts / voxel_size).astype(np.int64)
    _, inverse = np.unique(keys, axis=0, return_inverse=True)
    n = inverse.max() + 1 if inverse.size else 0
    if n == 0:
        return pts, colors
    sums = np.zeros((n, 3), np.float64)
    counts = np.zeros(n, np.int64)
    np.add.at(sums, inverse, pts)
    np.add.at(counts, inverse, 1)
    out = (sums / counts[:, None]).astype(np.float32)
    out_colors = None
    if colors is not None:
        cols = np.asarray(colors, np.float64).reshape(-1, colors.shape[-1])
        csum = np.zeros((n, cols.shape[1]), np.float64)
        np.add.at(csum, inverse, cols)
        out_colors = (csum / counts[:, None]).astype(np.float32)
    return out, out_colors


def perspective_aware_downsample(points, colors=None, voxel_size=0.003,
                                 eps=1e-6):
    """Downsample with voxels that grow with distance: warp to
    (x/z, y/z, z), voxel there, unwarp — distant points merge more
    aggressively, preserving near detail (reference
    depth_map_tools.py:1136-1182; used every 10th frame by the
    background accumulator, stereo_rerender.py:653-657)."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    z = np.maximum(pts[:, 2], eps)
    warped = np.stack([pts[:, 0] / z, pts[:, 1] / z, np.log(z)], axis=-1)
    down, cols = voxel_downsample(warped, colors, voxel_size)
    zz = np.exp(down[:, 2])
    un = np.stack([down[:, 0] * zz, down[:, 1] * zz, zz], axis=-1)
    return un.astype(np.float32), cols
