"""Native Matroska (MKV) metadata editing — no ffmpeg binary needed.

The reference tags its final SBS movie with ``stereo_mode=left_right``
through ffmpeg (movie_2_3D.py:752-762); 3D players (VLC, Kodi,
headsets) key off that metadata to enable side-by-side mode. This host
has no ffmpeg binary, and cv2's writer cannot emit the tag, so this
module remuxes the cv2-written MKV in pure Python: it parses the EBML
tree, appends a ``StereoMode`` element to the video track, and rewrites
the file with recomputed sizes and regenerated Cues (clusters are
copied byte-for-byte, so the compressed payload is untouched).

Matroska StereoMode values (matroska.org spec):
  0 mono, 1 side-by-side left-first, 2 top-bottom right-first,
  3 top-bottom left-first, 11 side-by-side right-first.
"""

from __future__ import annotations

import os

# EBML / Matroska element IDs (raw, including the length-marker bits)
EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
SEEK_HEAD = 0x114D9B74
INFO = 0x1549A966
TRACKS = 0x1654AE6B
CLUSTER = 0x1F43B675
CUES = 0x1C53BB6B
TAGS = 0x1254C367
CHAPTERS = 0x1043A770
ATTACHMENTS = 0x1941A469
VOID = 0xEC
TRACK_ENTRY = 0xAE
TRACK_TYPE = 0x83
TRACK_NUMBER = 0xD7
VIDEO = 0xE0
STEREO_MODE = 0x53B8
CLUSTER_TIMESTAMP = 0xE7
CUE_POINT = 0xBB
CUE_TIME = 0xB3
CUE_TRACK_POSITIONS = 0xB7
CUE_TRACK = 0xF7
CUE_CLUSTER_POSITION = 0xF1

STEREO_SBS_LEFT_FIRST = 1
STEREO_TOP_BOTTOM_LEFT_FIRST = 3


def _read_id(buf, pos):
    """EBML element ID: length from leading-zero count of first byte."""
    first = buf[pos]
    for n in range(1, 5):
        if first & (0x80 >> (n - 1)):
            raw = int.from_bytes(buf[pos:pos + n], "big")
            return raw, pos + n
    raise ValueError(f"bad EBML ID at {pos}")


def _read_size(buf, pos):
    """EBML VINT size. Returns (value, new_pos, is_unknown)."""
    first = buf[pos]
    for n in range(1, 9):
        marker = 0x80 >> (n - 1)
        if first & marker:
            raw = int.from_bytes(buf[pos:pos + n], "big")
            val = raw - (marker << (8 * (n - 1)))
            unknown = val == (1 << (7 * n)) - 1
            return val, pos + n, unknown
    raise ValueError(f"bad EBML size at {pos}")


def _encode_id(eid):
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _encode_size(val, min_bytes=1):
    """Shortest VINT encoding of ``val`` (>= min_bytes)."""
    for n in range(min_bytes, 9):
        if val < (1 << (7 * n)) - 1:
            marker = 1 << (7 * n)
            return (marker | val).to_bytes(n, "big")
    raise ValueError("size too large")


def _encode_uint(val):
    n = max(1, (val.bit_length() + 7) // 8)
    return val.to_bytes(n, "big")


def _element(eid, payload):
    return _encode_id(eid) + _encode_size(len(payload)) + payload


def _iter_children(buf, start, end):
    """Yield (id, data_start, data_end, header_start) of each child."""
    pos = start
    while pos < end:
        eid, p1 = _read_id(buf, pos)
        size, p2, unknown = _read_size(buf, p1)
        data_end = end if unknown else p2 + size
        yield eid, p2, data_end, pos
        pos = data_end


def _parse_uint(buf, start, end):
    return int.from_bytes(buf[start:end], "big")


def _rebuild_tracks(buf, start, end, stereo_mode):
    """Rebuild the Tracks element with StereoMode appended to (or
    replaced in) every video TrackEntry's Video element. Returns
    (new_tracks_bytes, video_track_number)."""
    entries = []
    video_track_num = None
    for eid, ds, de, _ in _iter_children(buf, start, end):
        if eid != TRACK_ENTRY:
            if eid != VOID:
                entries.append(_element(eid, bytes(buf[ds:de])))
            continue
        # inspect the TrackEntry
        track_type = None
        track_num = None
        children = []
        for cid, cds, cde, chs in _iter_children(buf, ds, de):
            children.append((cid, cds, cde))
            if cid == TRACK_TYPE:
                track_type = _parse_uint(buf, cds, cde)
            elif cid == TRACK_NUMBER:
                track_num = _parse_uint(buf, cds, cde)
        payload = b""
        for cid, cds, cde in children:
            if cid == VIDEO and track_type == 1:
                # rebuild Video with StereoMode (replacing any existing)
                vp = b""
                for vid, vds, vde, _h in _iter_children(buf, cds, cde):
                    if vid != STEREO_MODE:
                        vp += _element(vid, bytes(buf[vds:vde]))
                vp += _element(STEREO_MODE, _encode_uint(stereo_mode))
                payload += _element(VIDEO, vp)
            else:
                payload += _element(cid, bytes(buf[cds:cde]))
        if track_type == 1 and video_track_num is None:
            video_track_num = track_num
            if not any(c[0] == VIDEO for c in children):
                # video track without a Video element (unusual): add one
                payload += _element(
                    VIDEO, _element(STEREO_MODE, _encode_uint(stereo_mode)))
        entries.append(_element(TRACK_ENTRY, payload))
    return _element(TRACKS, b"".join(entries)), video_track_num


def set_stereo_mode(path, mode=STEREO_SBS_LEFT_FIRST, out_path=None):
    """Remux ``path`` (MKV) with the video track tagged ``StereoMode``.

    Clusters are copied verbatim; Info/Tracks are rewritten; SeekHead
    is dropped and Cues regenerated (both hold absolute offsets that
    the rewrite invalidates). In-place when ``out_path`` is None (via a
    tmp file + rename). Returns the output path.
    """
    with open(path, "rb") as f:
        buf = f.read()

    # EBML header (copied verbatim)
    eid, p1 = _read_id(buf, 0)
    if eid != EBML_HEADER:
        raise ValueError(f"{path}: not an EBML/Matroska file")
    hsize, p2, _ = _read_size(buf, p1)
    header = bytes(buf[:p2 + hsize])

    seg_id, sp1 = _read_id(buf, p2 + hsize)
    if seg_id != SEGMENT:
        raise ValueError(f"{path}: no Segment element")
    seg_size, sp2, seg_unknown = _read_size(buf, sp1)
    seg_end = len(buf) if seg_unknown else sp2 + seg_size

    info = tracks = None
    clusters = []  # (header_start, data_start, data_end)
    keep_misc = []  # chapters/tags/attachments copied verbatim
    video_track_num = 1
    for eid2, ds, de, hs in _iter_children(buf, sp2, seg_end):
        if eid2 == INFO:
            info = _element(INFO, bytes(buf[ds:de]))
        elif eid2 == TRACKS:
            tracks, video_track_num = _rebuild_tracks(buf, ds, de, mode)
        elif eid2 == CLUSTER:
            clusters.append((hs, ds, de))
        elif eid2 in (TAGS, CHAPTERS, ATTACHMENTS):
            keep_misc.append(_element(eid2, bytes(buf[ds:de])))
        # SEEK_HEAD / CUES / VOID dropped (offsets invalidated)
    if tracks is None:
        raise ValueError(f"{path}: no Tracks element")
    if video_track_num is None:
        video_track_num = 1

    # layout: Info, Tracks, Clusters..., misc, Cues (at the end). Cue
    # positions are relative to the Segment data start.
    body_pre = (info or b"") + tracks
    cluster_blobs = [bytes(buf[hs:de]) for hs, ds, de in clusters]
    cluster_times = []
    for hs, ds, de in clusters:
        t = 0
        for cid, cds, cde, _h in _iter_children(buf, ds, de):
            if cid == CLUSTER_TIMESTAMP:
                t = _parse_uint(buf, cds, cde)
                break
        cluster_times.append(t)

    misc = b"".join(keep_misc)
    # two-pass: cue element size depends on itself only via placement
    # at the END, so positions are final before Cues is built
    positions = []
    off = len(body_pre)
    for blob in cluster_blobs:
        positions.append(off)
        off += len(blob)
    cues_payload = b""
    for t, pos in zip(cluster_times, positions):
        ctp = (_element(CUE_TRACK, _encode_uint(video_track_num))
               + _element(CUE_CLUSTER_POSITION, _encode_uint(pos)))
        cues_payload += _element(
            CUE_POINT, _element(CUE_TIME, _encode_uint(t))
            + _element(CUE_TRACK_POSITIONS, ctp))
    body = (body_pre + b"".join(cluster_blobs) + misc
            + _element(CUES, cues_payload))

    out = out_path or path
    tmp = os.path.join(os.path.dirname(os.path.abspath(out)),
                       f"_tmp_stereo_{os.path.basename(out)}")
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(_encode_id(SEGMENT) + _encode_size(len(body), 8))
        f.write(body)
    os.replace(tmp, out)
    return out


def get_stereo_mode(path):
    """Read back the StereoMode of the first video track (None if
    untagged) — used by tests and the movie pipeline's verification."""
    with open(path, "rb") as f:
        buf = f.read()
    eid, p1 = _read_id(buf, 0)
    hsize, p2, _ = _read_size(buf, p1)
    seg_id, sp1 = _read_id(buf, p2 + hsize)
    seg_size, sp2, seg_unknown = _read_size(buf, sp1)
    seg_end = len(buf) if seg_unknown else sp2 + seg_size
    for eid2, ds, de, _h in _iter_children(buf, sp2, seg_end):
        if eid2 != TRACKS:
            continue
        for tid, tds, tde, _h2 in _iter_children(buf, ds, de):
            if tid != TRACK_ENTRY:
                continue
            for cid, cds, cde, _h3 in _iter_children(buf, tds, tde):
                if cid == VIDEO:
                    for vid, vds, vde, _h4 in _iter_children(buf, cds, cde):
                        if vid == STEREO_MODE:
                            return _parse_uint(buf, vds, vde)
    return None
