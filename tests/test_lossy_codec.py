"""Lossy-compression spec rules (format-specs/raquet.md:272-275):
metadata validation accepts/rejects correctly, webp round-trips through
the pure-python VP8L codec without PIL, and constraint checks fire
before any codec work."""

from __future__ import annotations

import pytest

from raquet_spark.operators.layout import (
    check_lossy_constraints,
    to_interleaved,
)
from raquet_spark.sources.raquet import write_raquet
from raquet_spark.sources.validate import validate_raquet
from raquet_spark.testing import make_synthetic_raster


@pytest.fixture(scope="module")
def rgb(spark):
    return make_synthetic_raster(
        spark, zoom=5, tiles_x=2, tiles_y=2, origin_x=4, origin_y=6,
        block_size=16, num_bands=3, dtype="uint8",
    )


def _interleaved(spark, rgb):
    tiles, meta = rgb
    out, meta_i = to_interleaved(tiles, meta, compression="gzip")
    return out, meta_i


def _write(tmp_path, name, df, meta):
    path = str(tmp_path / name)
    write_raquet(df, path, meta)
    return path


def test_valid_webp_metadata(spark, rgb, tmp_path):
    out, meta_i = _interleaved(spark, rgb)
    # blobs stay gzip (PIL absent) but the metadata contract is webp:
    # validation is metadata-level, mirroring reference validate.py
    meta = dict(meta_i, compression="webp", compression_quality=80)
    path = _write(tmp_path, "webp.parquet", out, meta)
    res = validate_raquet(spark, path)
    assert not [e for e in res.errors if "compression" in e or "webp" in e], res.errors


def test_jpeg_requires_interleaved(spark, rgb, tmp_path):
    tiles, meta = rgb
    bad = dict(meta, compression="jpeg")  # band_layout stays sequential
    path = _write(tmp_path, "seq_jpeg.parquet", tiles, bad)
    res = validate_raquet(spark, path)
    assert any("interleaved" in e for e in res.errors), res.errors


def test_jpeg_band_count(spark, rgb, tmp_path):
    out, meta_i = _interleaved(spark, rgb)
    two = dict(meta_i, compression="jpeg", bands=meta_i["bands"][:2])
    path = _write(tmp_path, "jpeg2.parquet", out, two)
    res = validate_raquet(spark, path)
    assert any("jpeg supports 1" in e for e in res.errors), res.errors


def test_webp_requires_uint8(spark, tmp_path):
    tiles, meta = make_synthetic_raster(
        spark, zoom=5, tiles_x=1, tiles_y=1, origin_x=4, origin_y=6,
        block_size=16, num_bands=3, dtype="float32",
    )
    out, meta_i = to_interleaved(tiles, meta, compression="gzip")
    bad = dict(meta_i, compression="webp")
    path = _write(tmp_path, "webp_f32.parquet", out, bad)
    res = validate_raquet(spark, path)
    assert any("uint8" in e for e in res.errors), res.errors


def test_quality_range_and_ignored_warning(spark, rgb, tmp_path):
    out, meta_i = _interleaved(spark, rgb)
    bad_q = dict(meta_i, compression="webp", compression_quality=150)
    path = _write(tmp_path, "q150.parquet", out, bad_q)
    res = validate_raquet(spark, path)
    assert any("compression_quality" in e for e in res.errors), res.errors

    gz_q = dict(meta_i, compression_quality=50)  # compression stays gzip
    path2 = _write(tmp_path, "gzq.parquet", out, gz_q)
    res2 = validate_raquet(spark, path2)
    assert not any("compression_quality" in e for e in res2.errors)
    assert any("ignored" in w for w in res2.warnings), res2.warnings


def test_unknown_compression_rejected(spark, rgb, tmp_path):
    tiles, meta = rgb
    bad = dict(meta, compression="lz4")
    path = _write(tmp_path, "lz4.parquet", tiles, bad)
    res = validate_raquet(spark, path)
    assert any("unknown compression" in e for e in res.errors), res.errors


def test_webp_interleaved_roundtrip_exact(spark, rgb):
    """WebP rides the pure-python VP8L (lossless) codec when PIL is
    absent, so interleave → de-interleave round-trips bit-exact."""
    import numpy as np

    from raquet_spark.functions.bands import decode_block
    from raquet_spark.operators.layout import to_sequential

    tiles, meta = rgb
    inter, meta_w = to_interleaved(tiles, meta, compression="webp")
    rows = inter.collect()
    assert all(bytes(r["pixels"])[:4] == b"RIFF" for r in rows)

    back, _meta_s = to_sequential(
        spark.createDataFrame(rows), meta_w, compression=None
    )
    orig = {r["block"]: r for r in tiles.collect()}
    for r in back.collect():
        for band in ("band_1", "band_2", "band_3"):
            np.testing.assert_array_equal(
                decode_block(r[band], "uint8"),
                decode_block(orig[r["block"]][band], "uint8"),
            )


def test_lossy_constraints(spark):
    with pytest.raises(ValueError, match="uint8"):
        check_lossy_constraints("jpeg", ["float32"])
    with pytest.raises(ValueError, match="1 or 3"):
        check_lossy_constraints("jpeg", ["uint8", "uint8"])
    with pytest.raises(ValueError, match="1-4"):
        check_lossy_constraints("webp", ["uint8"] * 5)


# -------------------------------------------- pure-numpy JPEG codec --


def _psnr(a, b):
    import numpy as np

    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_jpeg_codec_roundtrip_quality():
    """Baseline JFIF roundtrip: PSNR rises with quality, q100 is
    lossless on this smooth input, odd dims and RGB both work."""
    import numpy as np

    from raquet_spark.functions.jpeg import jpeg_decode, jpeg_encode

    gy, gx = np.mgrid[0:96, 0:112]
    img = (
        128 + 60 * np.sin(gx / 9.0) * np.cos(gy / 13.0)
        + 20 * np.sin((gx + gy) / 3.0)
    ).clip(0, 255).astype(np.uint8)
    prev = 0.0
    for q in (30, 50, 70, 85, 95, 100):
        p = _psnr(img, jpeg_decode(jpeg_encode(img, q)))
        assert p >= prev - 0.01, (q, p, prev)
        prev = p
    assert prev > 55  # q100 near-lossless
    assert _psnr(img, jpeg_decode(jpeg_encode(img, 85))) > 40

    odd = img[:37, :53]
    assert jpeg_decode(jpeg_encode(odd, 85)).shape == (37, 53)

    rgb = np.stack([img, img[::-1], np.roll(img, 17, axis=1)], axis=-1)
    drgb = jpeg_decode(jpeg_encode(rgb, 85))
    assert drgb.shape == rgb.shape and _psnr(rgb, drgb) > 38

    u = np.full((24, 24), 200, np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(u, 85)), u)


def test_jpeg_codec_bitstream_structure():
    """Emitted bytes are standard JFIF: SOI/APP0/DQT/SOF0/DHT/SOS/EOI
    markers in order, zigzag DQT, 0xFF bytes stuffed in the scan."""
    import numpy as np

    from raquet_spark.functions.jpeg import jpeg_encode

    img = (np.arange(64 * 64).reshape(64, 64) % 251).astype(np.uint8)
    b = jpeg_encode(img, 85)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in b
    # inside the entropy segment every 0xFF is followed by 0x00
    scan_start = b.index(b"\xff\xda")
    seg_len = int.from_bytes(b[scan_start + 2 : scan_start + 4], "big")
    scan = b[scan_start + 2 + seg_len : -2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, f"unstuffed 0xFF at {i}"
            i += 2
        else:
            i += 1


def test_jpeg_interleaved_roundtrip_spark(spark, rgb):
    """End-to-end lossy layout: sequential → interleaved JPEG tiles →
    back to sequential; per-band PSNR is bounded and metadata records
    the codec (PIL absent → the numpy fallback produced the bytes)."""
    import numpy as np

    from raquet_spark.functions.bands import decode_block
    from raquet_spark.operators.layout import to_sequential

    tiles, meta = rgb
    inter, meta_i = to_interleaved(tiles, meta, compression="jpeg")
    assert meta_i["compression"] == "jpeg"
    row = inter.where("block != 0").first()
    assert bytes(row["pixels"])[:2] == b"\xff\xd8"  # real JFIF payload

    back, meta_s = to_sequential(inter, meta_i, compression=None)
    orig = {r["block"]: r for r in tiles.where("block != 0").collect()}
    got = {r["block"]: r for r in back.collect()}
    assert orig.keys() == got.keys()
    for k in orig:
        for band in ("band_1", "band_2", "band_3"):
            a = decode_block(orig[k][band], "uint8")
            b = decode_block(got[k][band], "uint8")
            assert _psnr(a, b) > 20, (k, band)  # mod-251 sawtooth is worst-case for DCT


def test_jpeg_subsampled_roundtrip():
    """4:2:0 / 4:2:2 encode→decode round-trips: shape preserved, PSNR
    bounded, smaller payloads than 4:4:4, odd dims OK. This is the
    decode path reference/PIL-written 3-band lossy tiles need (PIL's
    RGB default below quality 95 is 4:2:0)."""
    import numpy as np

    from raquet_spark.functions.jpeg import jpeg_decode, jpeg_encode

    gy, gx = np.mgrid[0:96, 0:112]
    base = (
        128 + 60 * np.sin(gx / 9.0) * np.cos(gy / 13.0)
        + 20 * np.sin((gx + gy) / 7.0)
    ).clip(0, 255).astype(np.uint8)
    rgb = np.stack([base, base[::-1], np.roll(base, 17, axis=1)], axis=-1)

    enc444 = jpeg_encode(rgb, 85, "444")
    for sub in ("422", "420"):
        enc = jpeg_encode(rgb, 85, sub)
        dec = jpeg_decode(enc)
        assert dec.shape == rgb.shape
        assert _psnr(rgb, dec) > 32, sub
        assert len(enc) < len(enc444), sub
        # odd dims exercise MCU edge padding + crop
        odd = rgb[:37, :53]
        dodd = jpeg_decode(jpeg_encode(odd, 85, sub))
        assert dodd.shape == odd.shape and _psnr(odd, dodd) > 30

    with np.testing.assert_raises(ValueError):
        jpeg_encode(rgb, 85, "411x")


def test_jpeg_420_handcrafted_conformance():
    """Decoder conformance against a BYTE-HAND-BUILT 4:2:0 stream (not
    produced by this codec's encoder): DC-only blocks, two MCUs, a
    restart interval of one, all-ones quant tables. Every construct —
    MCU interleave order (T.81 A.2.3), per-component DC prediction,
    RSTn predictor reset, chroma upsampling, YCbCr→RGB — has a
    hand-computable expected value: a constant-DC block decodes to
    q·DC/8 + 128 everywhere under the orthonormal IDCT."""
    import numpy as np

    from raquet_spark.functions.jpeg import jpeg_decode

    # --- independent entropy writer (spec C.2 canonical codes) ---
    def canonical(bits, vals):
        out, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return out

    class W:
        def __init__(self):
            self.bytes_ = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, code, ln):
            for i in range(ln - 1, -1, -1):
                self.acc = (self.acc << 1) | ((code >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.bytes_.append(self.acc)
                    if self.acc == 0xFF:
                        self.bytes_.append(0x00)
                    self.acc, self.n = 0, 0

        def align(self):
            while self.n:
                self.put(1, 1)  # 1-fill pad

    # Annex K.3 DC tables (public constants); 1-entry AC table: EOB='0'
    dc_tab = canonical([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                       list(range(12)))
    DC_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
    DC_VALS = bytes(range(12))
    AC_BITS = bytes([1] + [0] * 15)
    AC_VALS = bytes([0x00])

    def put_dc_only(w, diff):
        size = int(abs(diff)).bit_length()
        code, ln = dc_tab[size]
        w.put(code, ln)
        if size:
            amp = diff if diff >= 0 else diff + (1 << size) - 1
            w.put(amp, size)
        w.put(0, 1)  # EOB from the 1-entry AC table

    # Pixel design: 32x16, 4:2:0 => two 16x16 MCUs, DRI=1.
    # MCU0 luma quadrants 160/96/208/64; chroma Cb=90 Cr=170 (both MCUs,
    # constant planes => triangle upsampling is exact everywhere).
    # MCU1 luma 128. DC coeff for constant value v is (v-128)*8 at q=1.
    yq = [160, 96, 208, 64]
    dcs = [(v - 128) * 8 for v in yq]
    cb_dc, cr_dc = (90 - 128) * 8, (170 - 128) * 8

    w = W()
    prev = 0
    for d in dcs:  # MCU0: Y blocks TL,TR,BL,BR then Cb, Cr
        put_dc_only(w, d - prev)
        prev = d
    put_dc_only(w, cb_dc)
    put_dc_only(w, cr_dc)
    w.align()
    scan = bytes(w.bytes_) + b"\xFF\xD0"  # RST0, predictors reset
    w = W()
    for _ in range(4):  # MCU1: Y=128 => diff 0 from the RESET predictor
        put_dc_only(w, 0)
    put_dc_only(w, cb_dc)  # fresh diffs, not deltas from MCU0
    put_dc_only(w, cr_dc)
    w.align()
    scan += bytes(w.bytes_)

    import struct

    hdr = bytearray(b"\xFF\xD8")
    for tid in (0, 1):  # all-ones quant tables
        hdr += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + b"\x01" * 64
    hdr += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, 16, 32, 3)
    hdr += bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])  # Y 2x2, Cb/Cr 1x1
    for cls, tid, bits, vals in (
        (0, 0, DC_BITS, DC_VALS), (1, 0, AC_BITS, AC_VALS),
        (0, 1, DC_BITS, DC_VALS), (1, 1, AC_BITS, AC_VALS),
    ):
        hdr += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        hdr += bits + vals
    hdr += b"\xFF\xDD" + struct.pack(">HH", 4, 1)  # DRI = 1 MCU
    hdr += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    hdr += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3F\x00"
    jpg = bytes(hdr) + scan + b"\xFF\xD9"

    out = jpeg_decode(jpg)
    assert out.shape == (16, 32, 3)

    def rgb_of(y, cb, cr):
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return np.clip(np.round([r, g, b]), 0, 255).astype(np.uint8)

    quads = {(0, 0): 160, (0, 8): 96, (8, 0): 208, (8, 8): 64}
    for (qy, qx), yv in quads.items():
        expect = rgb_of(yv, 90, 170)
        got = out[qy : qy + 8, qx : qx + 8]
        assert (got == expect).all(), ((qy, qx), got[0, 0], expect)
    # right MCU: neutral luma, same chroma — proves the RST reset both
    # byte-aligned the reader and zeroed every DC predictor
    expect = rgb_of(128, 90, 170)
    assert (out[:, 16:] == expect).all(), (out[0, 16], expect)


# --- progressive JPEG (SOF2) conformance vs the JVM's ImageIO --------

def _jvm_write_jpeg(jvm, img, quality, progressive):
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    param = writer.getDefaultWriteParam()
    param.setCompressionMode(2)  # MODE_EXPLICIT
    param.setCompressionQuality(float(quality))
    if progressive:
        param.setProgressiveMode(3)  # MODE_DEFAULT
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    return bytes(baos.toByteArray())


def test_progressive_jpeg_gray_matches_imageio(spark):
    """A progressive (SOF2) grayscale JPEG written by javax.imageio —
    spectral selection + successive approximation, DC/AC refinement
    scans — decodes to ImageIO's own pixels within IDCT rounding.
    Raster-level sample IO avoids the JVM's gray<->sRGB conversions."""
    import numpy as np

    jvm = spark._jvm
    x = np.linspace(0, 220, 40)[None, :] + np.linspace(0, 35, 24)[:, None]
    arr = (x % 256).astype(np.uint8)
    img = jvm.java.awt.image.BufferedImage(40, 24, 10)  # TYPE_BYTE_GRAY
    raster = img.getRaster()
    for y in range(24):
        for xx in range(40):
            raster.setSample(xx, y, 0, int(arr[y, xx]))
    buf = _jvm_write_jpeg(jvm, img, 0.9, True)
    assert b"\xff\xc2" in buf  # SOF2 really emitted

    from raquet_spark.functions.jpeg import jpeg_decode

    ours = jpeg_decode(buf)
    img2 = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(buf))
    )
    r2 = img2.getRaster()
    ref = np.array(
        [[r2.getSample(xx, y, 0) for xx in range(40)] for y in range(24)]
    )
    assert np.abs(ours.astype(int) - ref).max() <= 2


def test_progressive_jpeg_rgb_420_matches_imageio(spark):
    """Progressive RGB at the writer's default 4:2:0 subsampling with
    odd dimensions: interleaved DC scans (3 components, 2x2 sampling)
    + per-component AC scans + refinements, chroma upsampled — within
    a couple of levels of ImageIO's own decode."""
    import numpy as np

    jvm = spark._jvm
    rng = np.random.default_rng(5)
    h, w = 33, 49
    x = np.linspace(0, 200, w)[None, :] + np.linspace(0, 50, h)[:, None]
    img_np = np.stack([x, x[::-1], 0.5 * x], axis=2).astype(np.uint8)
    img_np += rng.integers(0, 5, img_np.shape, dtype=np.uint8)
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for xx in range(w):
            r, g, b = (int(v) for v in img_np[y, xx])
            img.setRGB(xx, y, (r << 16) | (g << 8) | b)
    buf = _jvm_write_jpeg(jvm, img, 0.85, True)
    assert b"\xff\xc2" in buf
    # default subsampling is 4:2:0 — the interleaved-DC + upsample path
    i = buf.find(b"\xff\xc2")
    assert buf[i + 11] == 0x22

    from raquet_spark.functions.jpeg import jpeg_decode

    ours = jpeg_decode(buf)
    img2 = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(buf))
    )
    ref = np.zeros((h, w, 3), dtype=np.int32)
    for y in range(h):
        for xx in range(w):
            argb = img2.getRGB(xx, y)
            ref[y, xx] = [(argb >> 16) & 255, (argb >> 8) & 255, argb & 255]
    d = np.abs(ours.astype(int) - ref)
    assert d.max() <= 4 and d.mean() < 1.0


def test_progressive_vs_baseline_same_pixels(spark):
    """The same source written progressive and baseline by ImageIO must
    decode (through OUR decoder) to nearly identical pixels — the two
    entropy layouts carry the same quantized coefficients."""
    import numpy as np

    jvm = spark._jvm
    x = np.linspace(0, 250, 32)[None, :] * np.ones((16, 1))
    arr = x.astype(np.uint8)
    img = jvm.java.awt.image.BufferedImage(32, 16, 10)
    raster = img.getRaster()
    for y in range(16):
        for xx in range(32):
            raster.setSample(xx, y, 0, int(arr[y, xx]))
    from raquet_spark.functions.jpeg import jpeg_decode

    prog = jpeg_decode(_jvm_write_jpeg(jvm, img, 0.92, True))
    base = jpeg_decode(_jvm_write_jpeg(jvm, img, 0.92, False))
    assert np.abs(prog.astype(int) - base.astype(int)).max() <= 2
