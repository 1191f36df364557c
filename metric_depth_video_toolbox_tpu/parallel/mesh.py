"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices=None, data=None, model=1, axis_names=("data", "model")):
    """Build a 2D (data, model) mesh over the available devices.

    data * model must equal the device count; data defaults to
    n_devices // model. With one device this is a trivial 1x1 mesh —
    every sharded program also runs unchanged single-chip.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data({data}) * model({model}) != devices({n})")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names)


def frame_mesh(n_devices=None):
    """1D mesh over frames — the common inference layout (DP over time)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), ("data",))


def pad_to_multiple(batch, multiple, axis=0):
    """Pad a frame batch so it divides evenly across the data axis.
    Returns (padded, original_length)."""
    n = batch.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = [(0, 0)] * batch.ndim
    pad[axis] = (0, rem)
    return np.pad(batch, pad, mode="edge"), n
