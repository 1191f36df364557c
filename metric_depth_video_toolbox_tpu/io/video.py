"""Lossless video I/O — the filesystem data contract between stages.

Same on-disk formats as the reference (FFV1 in .mkv, RGB-encoded depth,
grayscale masks) with the same atomic-commit discipline: writers stream to
``<name>_tmp_<suffix>`` and ``verify_and_move`` re-opens the file, checks
the frame count, and renames over the target (reference
depth_frames_helper.py:125-248). Unlike the reference's per-frame Python
loops, readers here expose *batched* iteration (``read_batch``) plus a
double-buffered background prefetch thread so the TPU never waits on
decode — the host decodes batch N+1 while the device works on N.

RGB channel order everywhere outside this module; BGR exists only at the
cv2 boundary here.
"""

from __future__ import annotations

import json
import os
import queue
import threading

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is a hard runtime dep
    cv2 = None

from metric_depth_video_toolbox_tpu.ops import codec as _codec
from metric_depth_video_toolbox_tpu.utils.host import to_host as _to_host

FFV1 = "FFV1"


def lossless_fourcc(width, height):
    """Fast-lossless codec choice for intermediate videos.

    HuffYUV (cv2 rgb24 path) is byte-exact like FFV1 but measured ~9x
    faster to encode (6.7 vs 0.71 fps at 3840x1080 SBS on this 1-core
    host) and ~2x faster to decode — FFV1's range coder was THE
    end-to-end bottleneck (e2e stereo was 0.2 fps while the device step
    ran 49 fps). Odd dimensions fall back to FFV1, the reference's
    codec (cv2 truncates odd dims to even for BOTH codecs — a
    pre-existing cv2 limitation shared with the reference's cv2+FFV1
    writers — so neither is exact there; real video sources are even).
    ``MDVT_LOSSLESS_CODEC=FFV1`` restores the reference's on-disk codec
    everywhere (reference writes FFV1 intermediates,
    stereo_rerender.py:435,442); any readable fourcc works too.
    """
    env = os.environ.get("MDVT_LOSSLESS_CODEC")
    if env:
        return env
    if width % 2 == 0 and height % 2 == 0:
        return "HFYU"
    return FFV1


def _require_cv2():
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) is required for video I/O")


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------

class VideoReader:
    """Streaming frame reader (RGB uint8). Context manager."""

    def __init__(self, path, start_frame=0, max_frames=-1):
        _require_cv2()
        if not os.path.exists(path):
            raise FileNotFoundError(f"video file {path} does not exist")
        self.path = path
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise RuntimeError(f"failed to open video: {path}")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS)
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self._remaining = max_frames
        for _ in range(start_frame):
            if not self.cap.grab():
                break

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self.cap is not None:
            self.cap.release()
            self.cap = None

    def __iter__(self):
        return self

    def __next__(self):
        if self._remaining == 0:
            raise StopIteration
        ok, frame = self.cap.read()
        if not ok:
            raise StopIteration
        if self._remaining > 0:
            self._remaining -= 1
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def read_frame(self, n):
        """Random-access read of frame ``n`` (RGB uint8, None past the
        end). Seeks via CAP_PROP_POS_FRAMES — exact on the intra-only
        codecs the toolbox writes (FFV1/HFYU); used by the interactive
        viewer's scrubber."""
        self.cap.set(cv2.CAP_PROP_POS_FRAMES, n)
        ok, frame = self.cap.read()
        if not ok:
            return None
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def read_batch(self, batch_size):
        """Read up to ``batch_size`` frames as one (T, H, W, 3) uint8 array
        (None at end of stream)."""
        frames = []
        for frame in self:
            frames.append(frame)
            if len(frames) == batch_size:
                break
        if not frames:
            return None
        return np.stack(frames)

    def read_all(self):
        batch = self.read_batch(1 << 62)
        return batch if batch is not None else np.zeros(
            (0, self.height, self.width, 3), np.uint8)


def read_video_frames(path, start_frame=0, max_frames=-1, target_fps=-1):
    """Full-video load -> (frames (T,H,W,3) uint8 RGB, fps).

    ``target_fps`` > 0 decimates frames to approximately that rate
    (reference video_metric_convert.py --target_fps)."""
    with VideoReader(path, start_frame, max_frames) as r:
        frames = r.read_all()
        if frames.shape[0] == 0:
            raise RuntimeError(f"no frames read from {path}")
        fps = r.fps
        if target_fps and target_fps > 0 and target_fps < fps:
            stride = max(1, int(round(fps / target_fps)))
            frames = frames[::stride]
            fps = fps / stride
        return frames, fps


def video_info(path):
    """(frame_count, width, height, fps) without decoding."""
    with VideoReader(path) as r:
        return r.frame_count, r.width, r.height, r.fps


class PrefetchingBatchReader:
    """Background-thread batched reader: decode of batch N+1 overlaps
    device compute on batch N (the host->device pipeline the reference
    lacks — it loads whole videos into RAM up front)."""

    def __init__(self, path, batch_size, start_frame=0, max_frames=-1,
                 depth=2, transform=None):
        self.reader = VideoReader(path, start_frame, max_frames)
        self.fps = self.reader.fps
        self.frame_count = self.reader.frame_count
        self.width = self.reader.width
        self.height = self.reader.height
        self._q = queue.Queue(maxsize=depth)
        self._transform = transform
        self._batch_size = batch_size
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        try:
            while not self._stop.is_set():
                batch = self.reader.read_batch(self._batch_size)
                if batch is None:
                    break
                if self._transform is not None:
                    batch = self._transform(batch)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        finally:
            # the EOF sentinel must not be dropped: block (with stop
            # checks) until there is room for it
            while not self._stop.is_set():
                try:
                    self._q.put(None, timeout=0.2)
                    break
                except queue.Full:
                    continue
            self.reader.close()

    def read_batch(self, batch_size=None):
        """Pop the next prefetched batch (decode overlapped with the
        caller's device work); VideoReader-interface compatible — the
        batch size is fixed at construction."""
        return self._q.get()

    def close(self):
        """Stop the decode thread early (e.g. max_frames reached)."""
        self._stop.set()
        while True:  # drain so the worker can exit a blocked put
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)

    def __iter__(self):
        while True:
            batch = self._q.get()
            if batch is None:
                return
            yield batch


class AsyncVideoWriter:
    """Background-thread writer: lossless encode of batch N overlaps
    device compute on batch N+1 (paired with PrefetchingBatchReader this
    makes the stereo driver's host I/O fully asynchronous — SURVEY.md §7
    hard part (e): ~10 GB/min lossless streams must not starve the
    chip). Codec defaults to lossless_fourcc (HuffYUV where exact)."""

    def __init__(self, path, fps, width, height, codec_fourcc=None,
                 depth=8):
        self.writer = VideoWriter(path, fps, width, height, codec_fourcc)
        self._q = queue.Queue(maxsize=depth)
        self._err = None
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        while True:
            frame = self._q.get()
            if frame is None:
                return
            try:
                self.writer.write(frame)
            except Exception as e:  # surfaced at commit()/write()
                self._err = e
                return

    def write(self, frame_rgb):
        if self._err is not None:
            raise self._err
        self._q.put(frame_rgb)

    def commit(self, expected_frames=None):
        self._q.put(None)
        self._thread.join()
        if self._err is not None:
            raise self._err
        return self.writer.commit(expected_frames)


# ---------------------------------------------------------------------------
# Writing (atomic: tmp file + verify_and_move)
# ---------------------------------------------------------------------------

class VideoWriter:
    """Streaming lossless writer (RGB uint8 in, FFV1 out), with atomic
    commit semantics. Use as a context manager; ``commit()`` verifies frame
    count and renames over the final path."""

    def __init__(self, path, fps, width, height, codec_fourcc=None,
                 tmp_path=None):
        _require_cv2()
        self.path = path
        self.tmp_path = tmp_path or _tmp_name(path)
        self.fps = fps
        self.width = int(width)
        self.height = int(height)
        self.frames_written = 0
        if codec_fourcc is None:  # fast-lossless default (HFYU/FFV1)
            codec_fourcc = lossless_fourcc(self.width, self.height)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.writer = cv2.VideoWriter(
            self.tmp_path, cv2.VideoWriter_fourcc(*codec_fourcc), fps,
            (self.width, self.height))
        if not self.writer.isOpened():
            raise RuntimeError(f"failed to open VideoWriter for {path}")

    def write(self, frame_rgb):
        frame_rgb = np.asarray(frame_rgb)
        if frame_rgb.dtype != np.uint8:
            frame_rgb = np.clip(frame_rgb, 0, 255).astype(np.uint8)
        if frame_rgb.shape[:2] != (self.height, self.width):
            frame_rgb = cv2.resize(frame_rgb, (self.width, self.height),
                                   interpolation=cv2.INTER_LINEAR)
        self.writer.write(cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR))
        self.frames_written += 1

    def write_batch(self, frames_rgb):
        for f in np.asarray(frames_rgb):
            self.write(f)

    def close(self):
        if self.writer is not None:
            self.writer.release()
            self.writer = None

    def commit(self, expected_frames=None):
        """Close, verify frame count, atomically move into place."""
        self.close()
        expected = (self.frames_written if expected_frames is None
                    else expected_frames)
        return verify_and_move(self.tmp_path, expected, self.path)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.commit()
        else:
            self.close()


def _tmp_name(path):
    d, b = os.path.split(path)
    return os.path.join(d, f"_tmp_{b}")


def verify_and_move(tmp_file, expected_frames, output_file):
    """Re-open the tmp file, check CAP_PROP_FRAME_COUNT == expected, rename
    over the output (reference depth_frames_helper.py:163-179)."""
    _require_cv2()
    if not os.path.isfile(tmp_file):
        return False
    cap = cv2.VideoCapture(tmp_file)
    if not cap.isOpened():
        return False
    actual = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    if actual != expected_frames:
        print(f"{tmp_file}: wrong frame count {actual} != {expected_frames}")
        return False
    if os.path.exists(output_file):
        os.remove(output_file)
    os.rename(tmp_file, output_file)
    return True


def is_valid_video(path, min_bytes=2048):
    """exists && >= 2 KB (reference movie_2_3D.py:62-67)."""
    return os.path.isfile(path) and os.path.getsize(path) >= min_bytes


# ---------------------------------------------------------------------------
# Depth-video convenience wrappers (the central contract)
# ---------------------------------------------------------------------------

def save_depth_video(depth_frames, path, fps, max_depth,
                     width=None, height=None, bit16=True):
    """Encode float metric depth (T, H, W) -> RGB16 FFV1 video, atomically.

    The encode runs as one jitted device op per batch; only uint8 RGB
    crosses back to the host.
    """
    import jax
    depth_frames = np.asarray(depth_frames)
    t, h, w = depth_frames.shape[:3]
    width = width or w
    height = height or h
    enc = jax.jit(lambda d: _codec.encode_depth_frame(d, max_depth,
                                                      bit16=bit16))
    with VideoWriter(path, fps, width, height) as vw:
        rgb = _to_host(enc(depth_frames))
        for i in range(t):
            vw.write(rgb[i])
    return True


class DepthVideoReader(VideoReader):
    """Reads an RGB-encoded metric depth video, decoding to float meters."""

    def __init__(self, path, max_depth, bit16=True, average_rg=True, **kw):
        super().__init__(path, **kw)
        self.max_depth = max_depth
        self.bit16 = bit16
        self.average_rg = average_rg

    def read_depth_batch(self, batch_size):
        rgb = self.read_batch(batch_size)
        if rgb is None:
            return None
        return _to_host(_codec.decode_depth_frame(
            rgb, self.max_depth, bit16=self.bit16,
            average_rg=self.average_rg))


def save_grayscale_video(frames, path, fps, max_value,
                         width=None, height=None):
    """Float frames -> 8-bit grayscale (R=G=B) FFV1 video, clipped to
    [0, max_value] (reference depth_frames_helper.py:181-232)."""
    frames = np.asarray(frames)
    t = frames.shape[0]
    h, w = frames.shape[1:3]
    width = width or w
    height = height or h
    denom = max_value if max_value > 0 else max(float(frames.max()), 1.0)
    with VideoWriter(path, fps, width, height) as vw:
        for i in range(t):
            f = frames[i]
            if f.ndim == 3 and f.shape[-1] == 1:
                f = f[..., 0]
            g = (np.clip(f, 0, max_value) / denom * 255.0).astype(np.uint8)
            vw.write(np.stack([g, g, g], axis=-1))
    return True


def save_rgb_video(frames, path, fps, width=None, height=None):
    """uint8 RGB frames -> FFV1 video, atomically."""
    frames = np.asarray(frames)
    h, w = frames.shape[1:3]
    with VideoWriter(path, fps, width or w, height or h) as vw:
        vw.write_batch(frames)
    return True
