"""MJPEG/AVI video container (functions/avi.py): RIFF structure, frame
round trips through the from-scratch JPEG codec, real frame sampling
(sample_frames_decoded), and the video → frames → pHash dedup chain."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from raquet_spark.functions.avi import avi_frame_count, mjpeg_decode, mjpeg_encode


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else np.inf


def _smooth_frames(n, h, w, c, seed=0):
    x = np.linspace(0, 200, w)[None, :] + np.linspace(0, 55, h)[:, None]
    base = np.stack([x, x[::-1], 0.5 * x][:c], axis=2).astype(np.uint8)
    return np.stack([np.roll(base, 5 * (f + seed), axis=1) for f in range(n)])


def test_container_structure():
    frames = _smooth_frames(5, 32, 48, 3)
    buf = mjpeg_encode(frames, fps=8)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    assert struct.unpack("<I", buf[4:8])[0] == len(buf) - 8
    assert b"MJPG" in buf and b"movi" in buf and b"idx1" in buf
    assert avi_frame_count(buf) == 5
    # every frame chunk is a standalone JPEG (SOI marker)
    assert buf.count(b"00dc") >= 5


@pytest.mark.parametrize("c", [1, 3])
def test_roundtrip_frames(c):
    frames = _smooth_frames(4, 24, 40, c)
    got = mjpeg_decode(mjpeg_encode(frames, quality=95))
    assert got.shape == frames.shape
    for f in range(4):
        assert _psnr(frames[f], got[f]) > 30.0, f


def test_odd_payload_padding():
    """RIFF chunks pad odd payloads with one byte; the walker must not
    lose alignment across an odd-sized JPEG frame."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (3, 16, 16, 1), dtype=np.uint8)
    for q in (77, 85, 93):  # one of these will produce an odd payload
        buf = mjpeg_encode(frames, quality=q)
        got = mjpeg_decode(buf)
        assert got.shape[0] == 3


def test_sample_frames_decoded(spark):
    from raquet_spark.functions.png import png_decode
    from raquet_spark.operators.multimodal import (
        decode_mjpeg_video,
        make_media_table,
        sample_frames_decoded,
    )

    media = make_media_table(spark, n=4, kind="video", codec="mjpeg")
    rows = sample_frames_decoded(media, every_nth=2).collect()
    by_media: dict[int, dict[int, bytes]] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], {})[r["frame_idx"]] = bytes(r["payload"])
    assert len(by_media) == 4
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, frames in by_media.items():
        assert sorted(frames) == [0, 2, 4]  # 6 frames, every 2nd
        direct = decode_mjpeg_video(src[mid])
        for fi, png_bytes in frames.items():
            np.testing.assert_array_equal(png_decode(png_bytes), direct[fi])


def test_video_frame_dedup_chain(spark):
    """Two videos share one planted identical frame: sample frames,
    pHash the PNG frame rows, and the banded hamming join must surface
    exactly the cross-video duplicate."""
    import pandas as pd

    from raquet_spark.operators.multimodal import (
        phash_dedup_pairs,
        phash_table,
        sample_frames_decoded,
    )

    shared = _smooth_frames(1, 32, 32, 3)[0]
    vid_a = np.stack([shared, _smooth_frames(1, 32, 32, 3, seed=3)[0]])
    vid_b = np.stack([shared, _smooth_frames(1, 32, 32, 3, seed=9)[0]])
    media = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [1, 2],
            "payload": [mjpeg_encode(vid_a, quality=97),
                        mjpeg_encode(vid_b, quality=97)],
        })
    )
    # unique id per (video, frame) row for the pair join
    frames = sample_frames_decoded(media, every_nth=1).selectExpr(
        "media_id * 1000 + frame_idx AS media_id", "payload"
    )
    hashes = phash_table(frames, codec="png")
    pairs = phash_dedup_pairs(hashes, max_distance=2).collect()
    got = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])) for r in pairs}
    assert (1000, 2000) in got  # the planted shared frame
    # distinct frames of the same video must not collide at distance 2
    assert (1000, 1001) not in got and (2000, 2001) not in got
