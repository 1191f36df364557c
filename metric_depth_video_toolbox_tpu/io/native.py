"""ctypes bindings for the native host runtime (native/mdvt_native.cpp).

C++ fast paths for host-side work: the depth codec (used by the
host-only analysis path, pipeline/analyse.py), single-pass PLY
serialization (the exporter's per-frame PLY writes go through it via
io/pointcloud.write_ply), and a lock-free SPSC byte ring available for
byte-granular streaming. Falls back to numpy implementations when the
shared library hasn't been built (``make -C native``), so the package
works everywhere and accelerates where it can.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_SEARCHED = False


def _autobuild(native_dir):
    """Build libmdvt_native.so on first use when a toolchain exists —
    ships the C++ fast paths in the default flow instead of requiring a
    manual ``make -C native`` (gate: MDVT_NATIVE_BUILD=0 disables).
    Quiet, bounded, and racing processes are serialized by make itself
    building to a temp name only through this single call site."""
    if os.environ.get("MDVT_NATIVE_BUILD", "1") == "0":
        return
    import shutil as _sh
    import subprocess
    if not (_sh.which("make") and _sh.which("g++")):
        return
    try:
        subprocess.run(["make", "-C", native_dir, "-s"], timeout=180,
                       stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL, check=False)
    except Exception:
        pass


def _find_lib():
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so_path = os.path.join(here, "native", "libmdvt_native.so")
    if not os.path.exists(so_path):
        _autobuild(os.path.dirname(so_path))
    for cand in (so_path, "libmdvt_native.so"):
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        lib.pack_code16_rgb.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.unpack_rgb_code16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int]
        lib.encode_depth_rgb.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float]
        lib.decode_rgb_depth.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int]
        lib.ply_serialize.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        lib.ply_serialize.restype = ctypes.c_int64
        try:
            lib.tilepack_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        except AttributeError:  # pre-tilepack .so on disk
            pass
        lib.ring_create.argtypes = [ctypes.c_int64]
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        for f in ("ring_push", "ring_pop"):
            getattr(lib, f).argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_int64]
            getattr(lib, f).restype = ctypes.c_int64
        for f in ("ring_free_space", "ring_used"):
            getattr(lib, f).argtypes = [ctypes.c_void_p]
            getattr(lib, f).restype = ctypes.c_int64
        _LIB = lib
        break
    return _LIB


def available():
    return _find_lib() is not None


def encode_depth_rgb(depth, max_depth):
    """float32 (..., H, W) -> uint8 (..., H, W, 3) via the C++ fused path
    (numpy fallback)."""
    depth = np.ascontiguousarray(depth, np.float32)
    lib = _find_lib()
    out = np.empty(depth.shape + (3,), np.uint8)
    if lib is not None:
        lib.encode_depth_rgb(depth.ctypes.data, out.ctypes.data,
                             depth.size, ctypes.c_float(max_depth))
        return out
    scale = 4228250625.0 / (max_depth * 65536.0)
    code = np.clip(np.clip(depth, 0, max_depth) * scale, 0,
                   65535).astype(np.uint16)
    out[..., 0] = code >> 8
    out[..., 1] = code >> 8
    out[..., 2] = code & 0xFF
    return out


def decode_rgb_depth(rgb, max_depth, average_rg=True):
    """uint8 (..., H, W, 3) -> float32 depth (numpy fallback)."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    lib = _find_lib()
    out = np.empty(rgb.shape[:-1], np.float32)
    if lib is not None:
        lib.decode_rgb_depth(rgb.ctypes.data, out.ctypes.data, out.size,
                             ctypes.c_float(max_depth), int(average_rg))
        return out
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    hi = (r + g) // 2 if average_rg else r
    code = (hi << 8) | b
    return (code * (max_depth * 65536.0 / 4228250625.0)).astype(np.float32)


def ply_bytes(points, colors=None):
    """Serialize a point cloud to binary PLY bytes (C++ single pass)."""
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    cols = None
    if colors is not None:
        cols = np.ascontiguousarray(colors, np.uint8).reshape(-1, 3)
    lib = _find_lib()
    if lib is None:
        import io as _io
        from metric_depth_video_toolbox_tpu.io import pointcloud
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".ply") as f:
            pointcloud.write_ply(f.name, pts, cols)
            return open(f.name, "rb").read()
    cap = 256 + pts.shape[0] * (12 + (3 if cols is not None else 0))
    out = np.empty(cap, np.uint8)
    n = lib.ply_serialize(pts.ctypes.data,
                          cols.ctypes.data if cols is not None else None,
                          pts.shape[0], out.ctypes.data, cap)
    if n < 0:
        raise RuntimeError("ply_serialize: buffer too small")
    return out[:n].tobytes()


def tilepack_rows(z_rows):
    """In-place host half of the tile-bitpack transfer codec
    (ops/tilepack.py): (R, W) uint8 zigzag residual rows -> original
    bytes (un-zigzag + mod-256 prefix sum per row). Returns the array.
    C++ when built; vectorized numpy fallback."""
    z = np.ascontiguousarray(z_rows, np.uint8)
    lib = _find_lib()
    if lib is not None and hasattr(lib, "tilepack_rows"):
        lib.tilepack_rows(z.ctypes.data, z.shape[0], z.shape[1])
        return z
    d = ((z >> 1) ^ (255 * (z & 1))).astype(np.uint8)  # un-zigzag
    return np.add.accumulate(d, axis=1, dtype=np.uint8)  # mod-256 cumsum


class RingBuffer:
    """Lock-free SPSC byte ring (C++; numpy/deque fallback)."""

    def __init__(self, capacity):
        self._lib = _find_lib()
        self._cap = capacity
        if self._lib is not None:
            self._h = self._lib.ring_create(capacity)
            if not self._h:
                raise MemoryError("ring_create failed")
        else:
            from collections import deque
            self._q = deque()
            self._used = 0

    def push(self, data):
        data = np.frombuffer(data, np.uint8) if isinstance(data, bytes) \
            else np.ascontiguousarray(data, np.uint8)
        if self._lib is not None:
            return int(self._lib.ring_push(self._h, data.ctypes.data,
                                           data.size))
        # Match the C++ SPSC ring: one slot is kept free to disambiguate
        # full from empty, so usable capacity is cap - 1.
        n = min(data.size, self._cap - 1 - self._used)
        if n:
            self._q.append(bytes(data[:n]))
            self._used += n
        return n

    def pop(self, n):
        if self._lib is not None:
            out = np.empty(n, np.uint8)
            got = int(self._lib.ring_pop(self._h, out.ctypes.data, n))
            return out[:got].tobytes()
        out = b""
        while self._q and len(out) < n:
            chunk = self._q.popleft()
            take = min(n - len(out), len(chunk))
            out += chunk[:take]
            if take < len(chunk):
                self._q.appendleft(chunk[take:])
        self._used -= len(out)
        return out

    @property
    def used(self):
        if self._lib is not None:
            return int(self._lib.ring_used(self._h))
        return self._used

    def __del__(self):
        if getattr(self, "_lib", None) is not None and \
                getattr(self, "_h", None):
            self._lib.ring_destroy(self._h)
