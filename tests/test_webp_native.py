"""Lossy VP8 WebP via the system libwebp (ctypes): decode/encode of the
bitstream family the reference's Pillow path writes
(raster2raquet.py:816), the typed split error when no native backend
exists, and external-encoder conformance for the from-scratch VP8L
codec (libwebp's lossless encoder emits meta-huffman groups, color
cache and LZ77 — real third-party streams for functions/webp.py)."""

from __future__ import annotations

import numpy as np
import pytest

from raquet_spark.functions import webp_native as wn
from raquet_spark.operators.layout import decode_lossy, encode_lossy

needs_native = pytest.mark.skipif(
    not wn.available(), reason="no system libwebp"
)


def _photo(h, w, bands, seed=7):
    """Smooth gradient + mild noise: compresses like a photo, so lossy
    PSNR gates are meaningful (pure noise defeats any codec)."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 200, w)[None, :] + np.linspace(0, 55, h)[:, None]
    chans = [x, x[::-1], 0.5 * x, 255 - x]
    img = np.stack(chans[:bands], axis=2).astype(np.uint8)
    return img + rng.integers(0, 6, img.shape, dtype=np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else np.inf


@needs_native
@pytest.mark.parametrize("bands", [1, 2, 3, 4])
def test_lossy_vp8_roundtrip_all_band_counts(bands):
    img = _photo(48, 64, bands)
    buf = wn.encode_lossy(img, quality=90)
    # alpha-carrying lossy webp = extended container (VP8X + ALPH +
    # VP8 chunks); alpha-less = a bare VP8 chunk
    want_tag = b"VP8X" if bands in (2, 4) else b"VP8 "
    assert buf[:4] == b"RIFF" and buf[12:16] == want_tag
    rgba = wn.decode_rgba(buf)
    assert rgba.shape == (48, 64, 4)
    # gray goes out replicated to RGB; compare on the stored channels
    got = rgba[..., [0, 3]] if bands == 2 else rgba[..., :max(bands, 1)]
    want = img if bands != 1 else img[..., :1]
    if bands == 1:
        got = rgba[..., :1]
    assert _psnr(want, got) > 30.0


@needs_native
def test_decode_lossy_dispatch_reads_vp8_without_pil():
    """decode_lossy('webp') on a lossy-VP8 payload must fall through to
    the native backend (PIL is absent in this container)."""
    img = _photo(32, 32, 3)
    buf = wn.encode_lossy(img, quality=92)
    flat = decode_lossy(buf, "webp", n_bands=3)
    assert flat.shape == (32 * 32 * 3,)
    assert _psnr(img, flat.reshape(32, 32, 3)) > 30.0


@needs_native
def test_encode_lossy_layout_opt_in_writes_vp8():
    img = _photo(32, 32, 3)
    buf = encode_lossy(
        img.reshape(-1), 3, 32, 32, "webp", quality=88, webp_lossless=False
    )
    assert buf[12:16] == b"VP8 "
    back = decode_lossy(buf, "webp", n_bands=3).reshape(32, 32, 3)
    assert _psnr(img, back) > 30.0


def test_typed_split_error_without_any_native_backend(monkeypatch):
    """With libwebp unloadable (and PIL absent), a lossy-VP8 payload
    raises the documented NotImplementedError naming the split."""
    img = _photo(16, 16, 3)
    if wn.available():
        buf = wn.encode_lossy(img, quality=85)
    else:  # build a minimal container with a VP8 chunk tag
        buf = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + b"\0" * 12
    monkeypatch.setattr(wn, "_LIB", None)
    monkeypatch.setattr(wn, "_TRIED", True)
    with pytest.raises(NotImplementedError, match="native backend"):
        decode_lossy(buf, "webp", n_bands=3)
    with pytest.raises(NotImplementedError, match="native backend"):
        encode_lossy(
            img.reshape(-1), 3, 16, 16, "webp", webp_lossless=False
        )


@needs_native
@pytest.mark.parametrize(
    "shape,kind",
    [((48, 64), "photo"), ((160, 200), "photo"), ((96, 128), "flag")],
)
def test_from_scratch_vp8l_decoder_reads_libwebp_streams(shape, kind):
    """libwebp's lossless encoder is a true external VP8L encoder
    (meta-huffman on larger images, color cache, LZ77): its bytes must
    decode bit-exactly in functions/webp.py."""
    from raquet_spark.functions.webp import webp_decode_bands

    h, w = shape
    if kind == "photo":
        img = _photo(h, w, 3)
    else:  # few-color tile: drives palette/cache-heavy encodings
        rng = np.random.default_rng(3)
        img = np.take(
            np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [20, 20, 20]],
                     dtype=np.uint8),
            rng.integers(0, 4, (h, w)),
            axis=0,
        )
    buf = wn.encode_lossless(img)
    assert buf[12:16] == b"VP8L"
    got = webp_decode_bands(buf, 3).reshape(h, w, 3)
    np.testing.assert_array_equal(got, img)


@needs_native
@pytest.mark.parametrize("bands", [1, 3, 4])
def test_libwebp_reads_from_scratch_vp8l_streams(bands):
    """The reverse direction: our VP8L encoder's bytes decode bit-exact
    in libwebp — standard-bitstream conformance from a real decoder."""
    from raquet_spark.functions.webp import vp8l_encode

    img = _photo(40, 56, bands)
    rgba = wn.decode_rgba(vp8l_encode(img))
    if bands == 1:
        np.testing.assert_array_equal(rgba[..., 0:1], img)
    else:
        np.testing.assert_array_equal(rgba[..., :bands], img)


@needs_native
def test_spark_roundtrip_lossy_vp8(spark):
    """End-to-end through the Spark layout operators: sequential ->
    interleaved lossy-VP8 tiles -> sequential, PSNR-gated per tile."""
    from raquet_spark.functions.bands import decode_block
    from raquet_spark.operators.layout import to_interleaved, to_sequential
    from raquet_spark.testing import make_synthetic_raster

    tiles, meta = make_synthetic_raster(
        spark, zoom=5, tiles_x=2, tiles_y=2, origin_x=4, origin_y=6,
        block_size=16, num_bands=3, dtype="uint8",
    )
    meta = dict(meta, webp_lossless=False, compression_quality=95)
    inter, meta_i = to_interleaved(tiles, meta, compression="webp")
    blobs = {r["block"]: bytes(r["pixels"]) for r in inter.collect()}
    assert all(b[12:16] == b"VP8 " for b in blobs.values())
    back, _ = to_sequential(inter, meta_i, compression="gzip")
    src = {r["block"]: r for r in tiles.collect()}
    names = [b["name"] for b in meta["bands"]]
    for row in back.collect():
        # the executors must produce byte-for-byte what a local
        # encode->decode of the same tile produces (the Spark test pins
        # the plumbing; codec quality is gated by the tests above)
        stacked = np.stack(
            [decode_block(src[row["block"]][n], "uint8") for n in names],
            axis=1,
        ).reshape(-1)
        local = decode_lossy(
            encode_lossy(stacked, 3, 16, 16, "webp", quality=95,
                         webp_lossless=False),
            "webp",
            n_bands=3,
        ).reshape(-1, 3)
        for i, name in enumerate(names):
            np.testing.assert_array_equal(
                decode_block(row[name], "uint8"), local[:, i], err_msg=name
            )
