"""From-scratch PNG codec (functions/png.py): round trips across color
types and depths, hand-built vectors for the filters/interlace the
encoder never emits, external conformance against the JVM's
javax.imageio (ships with Spark — an independent codec), and the real
``png`` CODECS entry in operators/multimodal.py."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from raquet_spark.functions.png import _chunk, png_decode, png_encode

_SIG = b"\x89PNG\r\n\x1a\n"


def _wrap(width, height, bit_depth, color_type, raw, interlace=0, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0,
                       interlace)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_uint8(channels):
    rng = np.random.default_rng(channels)
    img = rng.integers(0, 256, (23, 31, channels), dtype=np.uint8)
    back = png_decode(png_encode(img))
    np.testing.assert_array_equal(back, img)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_uint16(channels):
    rng = np.random.default_rng(channels)
    img = rng.integers(0, 1 << 16, (9, 14, channels), dtype=np.uint16)
    back = png_decode(png_encode(img))
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, img)


def test_roundtrip_edge_geometries():
    for h, w in [(1, 1), (1, 17), (17, 1), (2, 255)]:
        img = (np.arange(h * w * 3, dtype=np.int64) % 256).astype(np.uint8)
        img = img.reshape(h, w, 3)
        np.testing.assert_array_equal(png_decode(png_encode(img)), img)


def test_average_and_paeth_filters_handbuilt():
    """Forward-filter a known image with Average (type 3) and Paeth
    (type 4) per the spec, then require the decoder to invert them."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    rows = img.reshape(6, 15).astype(np.int64)
    bpp = 3
    out = bytearray()
    prev = np.zeros(15, dtype=np.int64)
    for y, row in enumerate(rows):
        if y % 2 == 0:  # Average
            out.append(3)
            for x in range(15):
                left = row[x - bpp] if x >= bpp else 0
                out.append((row[x] - ((left + prev[x]) >> 1)) & 0xFF)
        else:  # Paeth
            out.append(4)
            for x in range(15):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((row[x] - pred) & 0xFF)
        prev = row
    buf = _wrap(5, 6, 8, 2, bytes(out))
    np.testing.assert_array_equal(png_decode(buf), img)


def test_adam7_interlace_handbuilt():
    """Split a known image into the seven Adam7 passes (filter 0 rows)
    and require the decoder to reassemble it."""
    from raquet_spark.functions.png import _ADAM7

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (10, 9, 3), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub.reshape(sub.shape[0], -1):
            raw.append(0)
            raw.extend(row.tobytes())
    buf = _wrap(9, 10, 8, 2, bytes(raw), interlace=1)
    np.testing.assert_array_equal(png_decode(buf), img)


def test_palette_with_trns_handbuilt():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    extra = _chunk(b"PLTE", plte.tobytes()) + _chunk(b"tRNS", bytes([255, 128, 0]))
    buf = _wrap(3, 2, 8, 3, raw, extra=extra)
    got = png_decode(buf)
    assert got.shape == (2, 3, 4)
    np.testing.assert_array_equal(got[..., :3], plte[idx])
    np.testing.assert_array_equal(got[..., 3], np.array([[255, 128, 0], [0, 128, 255]]))


def test_subbyte_gray_handbuilt():
    """4-bit grayscale: packed two pixels per byte, scaled to 0..255."""
    # row of pixels 0,5,10,15 -> bytes 0x05, 0xAF
    raw = b"\x00\x05\xaf"
    buf = _wrap(4, 1, 4, 0, raw)
    got = png_decode(buf)
    np.testing.assert_array_equal(
        got.reshape(-1), (np.array([0, 5, 10, 15]) * 255 // 15).astype(np.uint8)
    )


def _imageio_read(spark, buf):
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(buf)))
    w, h = img.getWidth(), img.getHeight()
    out = np.zeros((h, w, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y) & 0xFFFFFFFF
            out[y, x] = [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF,
                         argb & 0xFF, (argb >> 24) & 0xFF]
    return out


def test_jvm_imageio_reads_our_png(spark):
    """javax.imageio (independent codec in the Spark JVM) must decode
    our encoder's bytes to the exact pixels."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (9, 12, 4), dtype=np.uint8)
    got = _imageio_read(spark, png_encode(img))
    np.testing.assert_array_equal(got, img)


def test_our_decoder_reads_jvm_imageio_png(spark):
    """The reverse: a PNG written by javax.imageio decodes bit-exactly
    in functions/png.py."""
    jvm = spark._jvm
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (8, 11, 4), dtype=np.uint8)
    bimg = jvm.java.awt.image.BufferedImage(11, 8, 2)  # TYPE_INT_ARGB
    for y in range(8):
        for x in range(11):
            r, g, b, a = (int(v) for v in img[y, x])
            argb = (a << 24) | (r << 16) | (g << 8) | b
            # py4j passes Python ints as signed 32-bit
            if argb >= 1 << 31:
                argb -= 1 << 32
            bimg.setRGB(x, y, argb)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bimg, "png", baos)
    got = png_decode(bytes(baos.toByteArray()))
    np.testing.assert_array_equal(got, img)


_PYENV_PNG = "/root/.pyenv/versions/3.13.0/lib/python3.13/test/tkinterdata/python.png"


@pytest.mark.skipif(not os.path.exists(_PYENV_PNG), reason="no sample png")
def test_real_world_file_matches_jvm_decoder(spark):
    """A libpng-written palette+tRNS file on disk must decode to the
    same pixels javax.imageio produces."""
    buf = open(_PYENV_PNG, "rb").read()
    ours = png_decode(buf)
    jvms = _imageio_read(spark, buf)
    assert ours.shape == jvms.shape
    # compare premultiplied-agnostic: alpha exact, rgb exact where a>0
    np.testing.assert_array_equal(ours[..., 3], jvms[..., 3])
    mask = ours[..., 3] > 0
    np.testing.assert_array_equal(ours[mask], jvms[mask])


def test_multimodal_png_codec_chain(spark):
    """CODECS['png'] is real: media table synthesis, feature extract
    and resize run through the PNG bitstream end to end."""
    from raquet_spark.operators.multimodal import (
        decode_png_image,
        extract_features,
        make_media_table,
        resize_images,
    )

    media = make_media_table(spark, n=8, codec="png")
    rows = media.collect()
    assert all(bytes(r["payload"])[:8] == b"\x89PNG\r\n\x1a\n" for r in rows)
    arr = decode_png_image(bytes(rows[0]["payload"]))
    assert arr.shape == (rows[0]["height"], rows[0]["width"], rows[0]["channels"])
    feats = {r["media_id"]: r for r in extract_features(media, codec="png").collect()}
    assert len(feats) == 8
    want = [float(arr[:, :, c].mean()) for c in range(3)]
    assert feats[rows[0]["media_id"]]["mean_rgb"] == pytest.approx(want, rel=1e-9)
    # resize re-encodes in the SAME codec (r08 default flip): the
    # output payload is a real PNG whose pixels are the
    # nearest-neighbor selection of the source
    small = {
        r["media_id"]: r for r in resize_images(media, 8, 8, codec="png").collect()
    }
    assert all(
        bytes(r["payload"])[:8] == b"\x89PNG\r\n\x1a\n"
        for r in small.values()
    )
    s0 = decode_png_image(bytes(small[rows[0]["media_id"]]["payload"]))
    assert s0.shape == (8, 8, 3)
    h, w, _ = arr.shape
    yi = (np.arange(8) * h // 8).astype(int)
    xi = (np.arange(8) * w // 8).astype(int)
    np.testing.assert_array_equal(s0, arr[np.ix_(yi, xi)])
