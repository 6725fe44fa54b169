"""From-scratch MJPEG/AVI video container: RIFF writer/parser + the
repo's own baseline JPEG codec (functions/jpeg.py) per frame.

Motion-JPEG in an AVI RIFF container (both public Microsoft/IJG
formats) is the simplest standard video bitstream: every frame is an
independent JPEG, so the existing PIL-free JPEG codec turns the video
column from fake plumbing into real bytes — `00dc` chunks inside a
`movi` LIST, with the standard `hdrl` (avih + strl/strh/strf) header
and an `idx1` index, the layout any MJPEG-capable player accepts.

Decode walks the RIFF tree and JPEG-decodes each `00dc`/`00db` chunk;
it does NOT need the index (players tolerate its absence; we write it
anyway). Grayscale frames ride 1-band JPEGs (bitcount 8), color 3-band
(bitcount 24).

Used by ``operators/multimodal.py`` as the real ``mjpeg`` CODECS entry
and by ``sample_frames_decoded`` (one video row in, N real frame rows
out). The reference has no video surface at all (it delegates even
still images to PIL/GDAL); this is part of the training-data-pipeline
extension, where frame-level dedup of video corpora needs real frame
extraction.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def mjpeg_encode(frames: np.ndarray, fps: int = 10, quality: int = 90) -> bytes:
    """(n_frames, H, W) or (n_frames, H, W, C) uint8 -> MJPEG AVI bytes
    (C = 1 grayscale or 3 RGB, per the JPEG codec's band rules)."""
    from raquet_spark.functions.jpeg import jpeg_encode

    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 3:
        arr = arr[:, :, :, None]
    n, h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError(f"mjpeg frames must be 1 or 3 channels, got {c}")

    payloads = [
        jpeg_encode(f[:, :, 0] if c == 1 else f, quality=quality) for f in arr
    ]

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,      # microseconds per frame
        0,                     # max bytes per second (advisory)
        0,                     # padding granularity
        0x10,                  # AVIF_HASINDEX
        n, 0, 1,               # total frames, initial frames, streams
        max(len(p) for p in payloads),
        w, h, 0, 0, 0, 0,      # width, height, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiIHHHH",
        b"vids", b"MJPG",
        0, 0, 0, 0,            # flags, priority, language, initial frames
        1, fps,                # scale, rate -> fps frames/sec
        0, n,                  # start, length (frames)
        max(len(p) for p in payloads),
        -1, 0,                 # quality (default), sample size (varies)
        0, 0, w, h,            # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 8 * c, b"MJPG", w * h * c, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_items = [_chunk(b"00dc", p) for p in payloads]
    movi = _list(b"movi", b"".join(movi_items))
    # idx1 offsets are relative to the start of the movi LIST data
    # (i.e. just after the 'movi' fourcc), per the original spec
    idx_entries = []
    off = 4
    for item, p in zip(movi_items, payloads):
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += len(item)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, off: int, end: int):
    """Yield (fourcc, payload) for every chunk in [off, end), recursing
    into LISTs."""
    while off + 8 <= end:
        tag = data[off : off + 4]
        size = struct.unpack("<I", data[off + 4 : off + 8])[0]
        body_start = off + 8
        body_end = min(body_start + size, end)
        if tag in (b"LIST", b"RIFF"):
            yield from _walk(data, body_start + 4, body_end)
        else:
            yield tag, data[body_start:body_end]
        off = body_start + size + (size & 1)


def mjpeg_decode(buf: bytes) -> np.ndarray:
    """MJPEG AVI bytes -> (n_frames, H, W, C) uint8. Accepts `00dc` and
    `00db` frame chunks from any stream number; frames must share one
    geometry (true for MJPG by construction)."""
    from raquet_spark.functions.jpeg import jpeg_decode

    data = bytes(buf)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    frames = []
    for tag, body in _walk(data, 12, 8 + struct.unpack("<I", data[4:8])[0]):
        if tag[2:4] in (b"dc", b"db") and body[:2] == b"\xff\xd8":
            img = jpeg_decode(body)
            frames.append(img[:, :, None] if img.ndim == 2 else img)
    if not frames:
        raise ValueError("no MJPEG frame chunks in AVI")
    return np.stack(frames)


def avi_frame_count(buf: bytes) -> int:
    """Total frame count from the avih header (no frame decode)."""
    data = bytes(buf)
    for tag, body in _walk(data, 12, len(data)):
        if tag == b"avih":
            return struct.unpack("<I", body[16:20])[0]
    raise ValueError("no avih header")
