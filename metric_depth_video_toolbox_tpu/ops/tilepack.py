"""Lossless tile-bitpack transfer codec for device->host image fetches.

On tunneled runtimes (the experimental 'axon' backend) D2H moves single-
digit MB/s while H2D runs hundreds of MB/s — the full-res SBS uint8
image (12.4 MB/frame at 1080p) is THE e2e bottleneck of the stereo
stage, not compute (BENCH_r03: device 50 fps vs e2e 0.43 fps). This
module spends cheap device FLOPs to shrink that transfer, the same
trade the sparse infill-mask packing makes (pipeline/stereo.py
``_pack_mask_batch``).

Scheme (fixed shapes, jit-friendly, exact):
  1. channel-planar horizontal delta (mod 256) per image row — the
     HuffYUV/FFV1 "left" predictor (reference writes FFV1 everywhere,
     depth_frames_helper.py:125-161; this is the transfer-side
     equivalent),
  2. zigzag to small magnitudes,
  3. per 256-byte tile, the max magnitude picks a bit width
     b in {0, 1, 2, 4, 8} (0 = all-zero tile: flat/black regions of
     SBS renders are common and transfer nothing),
  4. every tile is bit-packed at each nonzero width (static shift-or
     trees — no data-dependent control flow), and tiles are grouped by
     width via a stable argsort worklist (measured 5x faster than
     jnp.where-style compaction at this scale; see CLAUDE.md),
  5. the host fetches the per-width counts first, then slices only
     count-many rows of each width's array (power-of-two buckets keep
     the XLA slice-program set bounded — the mask-packing pattern).

Host-side ``unpack`` reverses it in vectorized numpy (a C++ path in
native/mdvt_native.cpp takes over when the shared library is built).

Compression on natural video content ~1.8-3x; pure-noise content packs
to ~1.0x (every tile falls in the 8-bit bucket) and still round-trips
exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

TILE = 256
WIDTHS = (1, 2, 4, 8)  # nonzero bit widths (bucket 0 = all-zero tile)


@dataclasses.dataclass(frozen=True)
class PackLayout:
    """Static geometry of a packed batch (host side needs it to undo
    the padding/reshapes; derive once per shape)."""
    batch: int
    height: int
    width: int
    channels: int = 3

    @property
    def padded_width(self):
        return ((self.width + TILE - 1) // TILE) * TILE

    @property
    def tiles_per_row(self):
        return self.padded_width // TILE

    @property
    def n_tiles(self):
        return self.batch * self.channels * self.height * self.tiles_per_row


def _zigzag(d_u8):
    """uint8 delta (mod-256 residual) -> uint8 zigzag magnitude."""
    s = d_u8.astype(jnp.int8)
    return (jnp.left_shift(s, 1) ^ jnp.right_shift(s, 7)).astype(jnp.uint8)


def _pack_width(z_tiles, b):
    """(N, TILE) uint8 zigzag values -> (N, TILE*b//8) uint8 packed at
    ``b`` bits/value (little-endian within each byte). Disjoint bit
    lanes, so an int32 sum equals the bitwise OR."""
    if b == 8:
        return z_tiles
    per = 8 // b
    v = z_tiles.reshape(z_tiles.shape[0], TILE // per, per).astype(jnp.int32)
    sh = (jnp.arange(per, dtype=jnp.int32) * b)[None, None, :]
    return jnp.sum(jnp.left_shift(v, sh), axis=-1).astype(jnp.uint8)


def pack(image_u8, layout=None):
    """Device side. image_u8: (B, H, W, C) uint8 -> dict of
    fixed-shape arrays:
      bids   (N,)  uint8   bucket id per tile (0,1,2,3,4 <-> 0/1/2/4/8)
      counts (5,)  int32   tiles per bucket
      b1/b2/b4/b8  (N, TILE*b//8) uint8, bucket-k tiles compacted to
                   the front in original order (stable argsort)
    Jit/vmap-friendly; exactly invertible by ``unpack``.
    """
    b, h, w, c = image_u8.shape
    if layout is None:
        layout = PackLayout(b, h, w, c)
    pw = layout.padded_width
    x = jnp.transpose(image_u8, (0, 3, 1, 2))  # (B, C, H, W) planar
    if pw > w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pw - w)))
    rows = x.reshape(-1, pw).astype(jnp.uint8)
    delta = rows - jnp.pad(rows[:, :-1], ((0, 0), (1, 0)))  # mod-256
    z = _zigzag(delta).reshape(-1, TILE)  # (N, TILE)

    m = jnp.max(z, axis=1)  # per-tile max magnitude
    bid = (jnp.zeros_like(m, dtype=jnp.uint8)
           + (m > 0) + (m > 1) + (m > 3) + (m > 15)).astype(jnp.uint8)

    out = {"bids": bid,
           "counts": jnp.stack([jnp.sum(bid == k) for k in range(5)])}
    n = z.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    for k, width in enumerate(WIDTHS, start=1):
        packed = _pack_width(z, width)
        # stable compaction: bucket-k tiles first, original order kept
        sel = jnp.argsort(jnp.where(bid == k, pos, pos + n))
        out[f"b{width}"] = packed[sel]
    return out


def fetch_buckets(host_meta, device_out, to_host, prefix=""):
    """Fetch only count-many rows of each width array (power-of-two
    buckets bound the sliced-program set). ``host_meta`` must already
    hold 'counts' on host; returns {width: ndarray}. ``prefix`` maps
    to the caller's output-dict key names (e.g. 'img_').

    All occupied buckets go through ONE pytree to_host call: on the
    tunneled runtime each fetch pays a fixed round trip, and four
    sequential bucket fetches per batch measured as real wall time in
    the VDA packed-disparity path."""
    counts = np.asarray(host_meta[prefix + "counts"])
    want = {}
    for k, width in enumerate(WIDTHS, start=1):
        cnt = int(counts[k])
        if cnt == 0:
            continue
        cap = device_out[f"{prefix}b{width}"].shape[0]
        bucket = min(cap, max(1 << 10, 1 << (cnt - 1).bit_length()))
        want[width] = device_out[f"{prefix}b{width}"][:bucket]
    fetched = to_host(want)
    if not isinstance(fetched, dict):  # plain per-array fetchers
        fetched = {wd: to_host(v) for wd, v in want.items()}
    return {width: (fetched[width][: int(counts[k])]
                    if width in fetched else None)
            for k, width in enumerate(WIDTHS, start=1)}


def _unpack_width_np(rows, b):
    """(n, TILE*b//8) uint8 -> (n, TILE) uint8 zigzag values."""
    if b == 8:
        return rows
    per = 8 // b
    mask = (1 << b) - 1
    sh = (np.arange(per, dtype=np.uint8) * b)[None, None, :]
    return ((rows[:, :, None] >> sh) & mask).reshape(rows.shape[0], TILE)


def unpack(bids, buckets, layout):
    """Host side: exact inverse of ``pack``.

    bids: (N,) uint8; buckets: {width: (count, TILE*b//8) uint8 or
    None}; layout: PackLayout. Returns (B, H, W, C) uint8.

    Tries the C++ fast path (native/mdvt_native.cpp tilepack_unpack)
    and falls back to vectorized numpy.
    """
    from metric_depth_video_toolbox_tpu.io import native

    bids = np.asarray(bids, np.uint8)
    z = np.zeros((layout.n_tiles, TILE), np.uint8)
    for k, width in enumerate(WIDTHS, start=1):
        rows = buckets.get(width)
        if rows is None:
            continue
        idx = np.flatnonzero(bids == k)
        z[idx] = _unpack_width_np(np.asarray(rows, np.uint8), width)

    pw = layout.padded_width
    z = z.reshape(-1, pw)
    done = native.tilepack_rows(z)  # un-zigzag + prefix sum, C++ or numpy
    x = done.reshape(layout.batch, layout.channels, layout.height, pw)
    return np.ascontiguousarray(
        x[..., :layout.width].transpose(0, 2, 3, 1))
