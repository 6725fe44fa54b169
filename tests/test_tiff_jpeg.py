"""JPEG-in-TIFF (compression 7, TIFF Tech Note 2): standalone per-strip
JPEG streams and abbreviated streams spliced against a shared
JPEGTables tag — the aerial-imagery GeoTIFF staple. Fixtures are built
from the repo's own JPEG encoder at quality 100 over 8x8-constant
blocks, which the baseline transform carries bit-exactly, so decode
asserts pixel EQUALITY, not a PSNR bound."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from raquet_spark.functions.jpeg import jpeg_encode
from raquet_spark.sources.tiff_reader import (
    read_tiff_structure,
    tiff_pixel_table,
)


def _blocky(h, w, c, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 8, w // 8, c), dtype=np.uint8)
    return np.repeat(np.repeat(base, 8, 0), 8, 1)


def _split_tables(jfif: bytes) -> tuple[bytes, bytes]:
    """Full JFIF -> (JPEGTables stream, abbreviated stream) per TTN2."""
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos < len(jfif) - 1:
        assert jfif[pos] == 0xFF
        m = jfif[pos + 1]
        if m == 0xDA:  # SOS: everything from here is scan data + EOI
            rest.extend(jfif[pos:])
            break
        (seglen,) = struct.unpack_from(">H", jfif, pos + 2)
        seg = jfif[pos : pos + 2 + seglen]
        (tables if m in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + seglen
    tables.extend(b"\xff\xd9")
    return bytes(tables), bytes(rest)


def _jpeg_tiff(payloads, w, h, rows_per_strip, nbands, jpeg_tables=None,
               bits=8, extra=(), photometric=None):
    """Minimal classic little-endian TIFF with JPEG-compressed strips."""
    if photometric is None:
        photometric = 6 if nbands == 3 else 1
    entries = [
        (256, 4, 1, w), (257, 4, 1, h),
        (258, 3, nbands, None), (259, 3, 1, 7),
        (262, 3, 1, photometric),
        (273, 4, len(payloads), None), (277, 3, 1, nbands),
        (278, 4, 1, rows_per_strip),
        (279, 4, len(payloads), None),
        *extra,
    ]
    if jpeg_tables is not None:
        entries.append((347, 7, len(jpeg_tables), None))
    entries.sort()
    n = len(entries)
    ifd_off = 8
    ext_base = ifd_off + 2 + n * 12 + 4
    ext = bytearray()

    def ext_put(b: bytes) -> int:
        off = ext_base + len(ext)
        ext.extend(b)
        return off

    bits_buf = b"".join(struct.pack("<H", bits) for _ in range(nbands))
    # size externals first so strip offsets are known
    ext_len = 0
    for tag, typ, count, _v in entries:
        if tag == 258 and len(bits_buf) > 4:
            ext_len += len(bits_buf)
        elif tag == 273 and len(payloads) > 1:
            ext_len += 4 * len(payloads)
        elif tag == 279 and len(payloads) > 1:
            ext_len += 4 * len(payloads)
        elif tag == 347:
            ext_len += len(jpeg_tables)
    data_base = ext_base + ext_len
    offs = []
    pos = data_base
    for p in payloads:
        offs.append(pos)
        pos += len(p)

    body = b""
    for tag, typ, count, val in entries:
        if tag == 258:
            buf = bits_buf
        elif tag == 273:
            buf = b"".join(struct.pack("<I", o) for o in offs)
        elif tag == 279:
            buf = b"".join(struct.pack("<I", len(p)) for p in payloads)
        elif tag == 347:
            buf = jpeg_tables
        else:
            buf = struct.pack("<H" if typ == 3 else "<I", val)
        if len(buf) <= 4:
            body += struct.pack("<HHI", tag, typ, count) + buf.ljust(4, b"\x00")
        else:
            body += struct.pack("<HHII", tag, typ, count, ext_put(buf))
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n) + body + struct.pack("<I", 0)
    out += ext
    assert len(out) == data_base
    for p in payloads:
        out += p
    return bytes(out)


@pytest.mark.parametrize("nbands", [1, 3])
def test_jpeg_tiff_standalone_strips(spark, tmp_path, nbands):
    w, h, rps = 24, 32, 16
    img = _blocky(h, w, nbands, seed=nbands)
    strips = [
        jpeg_encode(
            img[y : y + rps, :, 0] if nbands == 1 else img[y : y + rps],
            quality=100,
        )
        for y in range(0, h, rps)
    ]
    path = str(tmp_path / f"jpeg{nbands}.tif")
    with open(path, "wb") as f:
        f.write(_jpeg_tiff(strips, w, h, rps, nbands))
    info = read_tiff_structure(path)
    assert info["compression"] == 7 and info["jpeg_tables"] is None
    pdf = tiff_pixel_table(spark, info).toPandas().sort_values(["sy", "sx"])
    assert len(pdf) == w * h
    for b in range(nbands):
        got = pdf[f"band_{b + 1}"].to_numpy().reshape(h, w)
        np.testing.assert_array_equal(got, img[:, :, b])


def test_jpeg_tiff_shared_jpegtables(spark, tmp_path):
    """Abbreviated strips (no DQT/DHT of their own) splice against the
    shared tag-347 tables — including a short bottom strip whose JPEG
    header carries its true height."""
    w, h, rps = 24, 24, 16  # strips of 16 and 8 rows
    img = _blocky(h, w, 1, seed=9)
    full = [
        jpeg_encode(img[y : y + rps, :, 0], quality=100)
        for y in range(0, h, rps)
    ]
    tables0, abbrev0 = _split_tables(full[0])
    tables1, abbrev1 = _split_tables(full[1])
    assert tables0 == tables1  # same quality -> same tables
    assert b"\xff\xdb" not in abbrev0[:64]
    path = str(tmp_path / "jt.tif")
    with open(path, "wb") as f:
        f.write(_jpeg_tiff([abbrev0, abbrev1], w, h, rps, 1,
                           jpeg_tables=tables0))
    info = read_tiff_structure(path)
    assert info["jpeg_tables"] is not None
    pdf = tiff_pixel_table(spark, info).toPandas().sort_values(["sy", "sx"])
    assert len(pdf) == w * h
    got = pdf["band_1"].to_numpy().reshape(h, w)
    np.testing.assert_array_equal(got, img[:, :, 0])


def test_jpeg_tiff_gates(tmp_path):
    """Planar and 16-bit JPEG TIFFs fail fast with typed errors; a
    bare segment decodes standalone without tables."""
    img = _blocky(16, 16, 1, seed=1)
    strip = jpeg_encode(img[:, :, 0], quality=100)
    from raquet_spark.sources.tiff_reader import _jpeg_seg_decode

    arr = _jpeg_seg_decode(strip, None, 1)
    np.testing.assert_array_equal(arr[:, :, 0], img[:, :, 0])

    # SamplesPerPixel mismatch fails typed, not with an IndexError
    with pytest.raises(ValueError, match="SamplesPerPixel"):
        _jpeg_seg_decode(strip, None, 3)

    planar = str(tmp_path / "planar.tif")
    with open(planar, "wb") as f:
        f.write(_jpeg_tiff([strip], 16, 16, 16, 1, extra=((284, 3, 1, 2),)))
    with pytest.raises(NotImplementedError, match="planar"):
        read_tiff_structure(planar)

    deep = str(tmp_path / "deep.tif")
    with open(deep, "wb") as f:
        f.write(_jpeg_tiff([strip], 16, 16, 16, 1, bits=16))
    with pytest.raises(NotImplementedError, match="8-bit"):
        read_tiff_structure(deep)


def test_jpeg_tiff_photometric_rgb(spark, tmp_path):
    """photometric=2 (GDAL PHOTOMETRIC=RGB): the JPEG planes ARE the
    RGB samples — the decoder must skip YCbCr→RGB or pixels come out
    silently wrong. Quality-100 4:4:4 over 8x8-constant blocks is
    bit-exact, so assert equality."""
    w, h, rps = 24, 16, 16
    img = _blocky(h, w, 3, seed=7)
    strips = [jpeg_encode(img, quality=100, color_transform=False)]
    path = str(tmp_path / "rgbphoto.tif")
    with open(path, "wb") as f:
        f.write(_jpeg_tiff(strips, w, h, rps, 3, photometric=2))
    info = read_tiff_structure(path)
    assert info["photometric"] == 2
    pdf = tiff_pixel_table(spark, info).toPandas().sort_values(["sy", "sx"])
    assert len(pdf) == w * h
    for b in range(3):
        got = pdf[f"band_{b + 1}"].to_numpy().reshape(h, w)
        np.testing.assert_array_equal(got, img[:, :, b])


def test_jpeg_tiff_photometric_gate(tmp_path):
    """3-band compression-7 with a photometric the decoder can't map
    to a color transform (e.g. 5=CMYK-ish) fails fast and typed."""
    img = _blocky(16, 16, 3, seed=3)
    strip = jpeg_encode(img, quality=100)
    path = str(tmp_path / "photo5.tif")
    with open(path, "wb") as f:
        f.write(_jpeg_tiff([strip], 16, 16, 16, 3, photometric=5))
    with pytest.raises(NotImplementedError, match="Photometric"):
        read_tiff_structure(path)


def test_jpeg_tiff_tiled(spark, tmp_path):
    """Tiled (not striped) JPEG TIFF: tags 322/323/324/325, one JPEG
    per 16x16 tile, 2x2 tile grid with right/bottom padding cropped."""
    w, h, ts = 24, 24, 16  # 2x2 tiles, edge tiles padded to 16
    img = _blocky(h, w, 1, seed=4)
    padded = np.zeros((32, 32), dtype=np.uint8)
    padded[:h, :w] = img[:, :, 0]
    tiles = [
        jpeg_encode(padded[ty : ty + ts, tx : tx + ts], quality=100)
        for ty in range(0, 32, ts)
        for tx in range(0, 32, ts)
    ]
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, None),
        (259, 3, 1, 7), (262, 3, 1, 1), (277, 3, 1, 1),
        (322, 4, 1, ts), (323, 4, 1, ts),
        (324, 4, len(tiles), None), (325, 4, len(tiles), None),
    ]
    n = len(entries)
    ext_base = 8 + 2 + n * 12 + 4
    ext = bytearray()

    def ext_put(b):
        off = ext_base + len(ext)
        ext.extend(b)
        return off

    ext_len = 4 * len(tiles) * 2
    data_base = ext_base + ext_len
    offs = []
    pos = data_base
    for p in tiles:
        offs.append(pos)
        pos += len(p)
    body = b""
    for tag, typ, count, val in entries:
        if tag == 324:
            buf = b"".join(struct.pack("<I", o) for o in offs)
        elif tag == 325:
            buf = b"".join(struct.pack("<I", len(p)) for p in tiles)
        elif tag == 258:
            buf = struct.pack("<H", 8)
        else:
            buf = struct.pack("<H" if typ == 3 else "<I", val)
        if len(buf) <= 4:
            body += struct.pack("<HHI", tag, typ, count) + buf.ljust(4, b"\x00")
        else:
            body += struct.pack("<HHII", tag, typ, count, ext_put(buf))
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", n) + body + struct.pack("<I", 0)
    out += ext
    for p in tiles:
        out += p
    path = str(tmp_path / "tiled.tif")
    with open(path, "wb") as f:
        f.write(bytes(out))
    info = read_tiff_structure(path)
    assert info["tiled"] and info["compression"] == 7
    pdf = tiff_pixel_table(spark, info).toPandas().sort_values(["sy", "sx"])
    assert len(pdf) == w * h  # padding cropped
    got = pdf["band_1"].to_numpy().reshape(h, w)
    np.testing.assert_array_equal(got, img[:, :, 0])
