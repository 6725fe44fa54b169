"""VP8L (WebP lossless) codec: exact round-trips across band counts,
every encoder transform/option path, edge geometries, and the typed
gates for the unimplemented spec corners (VP8 lossy, meta-huffman,
short plane codes). All pure-numpy — no Spark session needed."""

from __future__ import annotations

import numpy as np
import pytest

from raquet_spark.functions.webp import (
    BitReader,
    BitWriter,
    _canonical_codes,
    _limited_huffman_lengths,
    _prefix_decode,
    _prefix_encode,
    vp8l_decode,
    vp8l_encode,
    webp_decode_bands,
)


def _rt(arr, **kw):
    buf = vp8l_encode(arr, **kw)
    out = webp_decode_bands(buf, arr.shape[2])
    np.testing.assert_array_equal(out, arr)
    return buf


def test_bitio_roundtrip():
    bw = BitWriter()
    fields = [(0x2F, 8), (5, 3), (1, 1), (12345, 14), (0, 2), (7, 3)]
    for v, n in fields:
        bw.write(v, n)
    br = BitReader(bw.bytes())
    assert [(br.read(n)) for _, n in fields] == [v for v, _ in fields]


def test_prefix_code_bijection():
    bw = BitWriter()
    values = [1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 13, 16, 121, 1000, 4096, 100000]
    for v in values:
        sym, extra, ebits = _prefix_encode(v)
        assert 0 <= sym < 40
        bw.write(extra, ebits)
    br = BitReader(bw.bytes())
    for v in values:
        sym, _, _ = _prefix_encode(v)
        assert _prefix_decode(sym, br) == v


def test_huffman_lengths_kraft_and_limit():
    rng = np.random.RandomState(0)
    # skewed frequencies that would exceed 15 bits unlimited
    freqs = [int(2**i) for i in range(20)] + [0] * 236
    lens = _limited_huffman_lengths(freqs, 15)
    used = [ln for ln in lens if ln]
    assert max(used) <= 15
    assert sum(2.0 ** -ln for ln in used) <= 1.0 + 1e-12
    codes = _canonical_codes(lens)
    seen = {(lens[s], codes[s]) for s in range(len(lens)) if lens[s]}
    assert len(seen) == len(used)  # prefix-free by construction

    flat = list(rng.randint(1, 100, size=256))
    lens = _limited_huffman_lengths(flat, 15)
    assert sum(2.0 ** -ln for ln in lens) <= 1.0 + 1e-12


@pytest.mark.parametrize("bands", [1, 2, 3, 4])
def test_roundtrip_random(bands):
    rng = np.random.RandomState(bands)
    _rt(rng.randint(0, 256, (16, 13, bands), dtype=np.uint8))


def test_roundtrip_edge_geometries():
    rng = np.random.RandomState(9)
    _rt(np.array([[[7]]], dtype=np.uint8))
    _rt(np.array([[[1, 2, 3, 4]]], dtype=np.uint8))
    _rt(rng.randint(0, 256, (1, 37, 3), dtype=np.uint8))
    _rt(rng.randint(0, 256, (41, 1, 2), dtype=np.uint8))


def test_constant_tile_compresses_via_lz77():
    a = np.full((64, 64, 3), 123, dtype=np.uint8)
    buf = _rt(a)
    assert len(buf) < 64  # 12 KiB of pixels → a few dozen bytes of runs
    # without LZ77 the huffman tables alone stay tiny for one symbol
    _rt(a, use_lz77=False)


def test_transform_paths_roundtrip():
    rng = np.random.RandomState(1)
    base = (
        rng.randint(0, 50, (24, 24, 3), dtype=np.uint8)
        .cumsum(axis=1)
        .astype(np.uint8)
    )
    _rt(base, subtract_green=False)
    _rt(base, subtract_green=True)
    _rt(base, predictor_mode=1)
    _rt(base, predictor_mode=2)
    _rt(base, color_elements=(16, 8, 4))
    _rt(base, color_elements=(250, 3, 130))  # negative int8 multipliers
    _rt(base, cache_bits=4)
    _rt(base, cache_bits=8)
    _rt(
        base,
        subtract_green=True,
        color_elements=(250, 3, 130),
        predictor_mode=1,
        cache_bits=5,
    )


def test_palette_paths_roundtrip():
    rng = np.random.RandomState(2)
    # 4 colors → 2-px bundling; odd width exercises the partial byte
    four = rng.choice([3, 77, 130, 200], size=(20, 33)).astype(np.uint8)
    buf = _rt(np.repeat(four[:, :, None], 3, axis=2), palette=True)
    # 2 colors → 8-px bundling
    two = ((rng.rand(17, 19) > 0.5).astype(np.uint8) * 255)[:, :, None]
    _rt(two, palette=True)
    # 16 colors → 2-px bundling boundary
    c16 = (rng.randint(0, 16, (15, 21), dtype=np.uint8) * 16)[:, :, None]
    _rt(c16, palette=True)
    # >16 colors → plain 8-bit indices
    many = rng.randint(0, 100, (16, 16, 1), dtype=np.uint8)
    _rt(many, palette=True)
    # 4-band palette entries
    rgba = np.stack([four] * 4, axis=2)
    _rt(rgba, palette=True)
    with pytest.raises(ValueError, match="256 distinct"):
        grad = np.arange(512, dtype=np.uint16).reshape(16, 32)
        vp8l_encode(
            np.stack([grad & 0xFF, grad >> 1, grad >> 2], axis=2).astype(
                np.uint8
            ),
            palette=True,
        )


def test_palette_beats_literals_on_flag_like_tiles():
    rng = np.random.RandomState(3)
    flag = rng.choice([0, 128, 255], size=(32, 32)).astype(np.uint8)
    tile = np.repeat(flag[:, :, None], 3, axis=2)
    assert len(vp8l_encode(tile, palette=True)) < len(
        vp8l_encode(tile, subtract_green=False, use_lz77=False)
    )


def test_container_and_gates():
    a = np.full((4, 4, 1), 9, np.uint8)
    buf = vp8l_encode(a)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP" and buf[12:16] == b"VP8L"
    # raw VP8L payload (no RIFF) decodes too
    payload = buf[20 : 20 + int.from_bytes(buf[16:20], "little")]
    np.testing.assert_array_equal(
        webp_decode_bands(payload, 1), a
    )
    with pytest.raises(NotImplementedError, match="VP8L"):
        vp8l_decode(
            b"RIFF"
            + b"\x10\x00\x00\x00"
            + b"WEBP"
            + b"VP8 "
            + b"\x04\x00\x00\x00abcd"
        )
    with pytest.raises(ValueError, match="1-4"):
        vp8l_encode(np.zeros((4, 4, 5), dtype=np.uint8))


def test_dimension_limit():
    with pytest.raises(ValueError, match="16384"):
        vp8l_encode(np.zeros((1, 20000, 1), dtype=np.uint8))


def test_simple_code_descending_symbols_fast_table():
    """A spec-valid simple code may list the larger symbol first; code 0
    must map to the first-listed symbol in BOTH decoder lookup paths."""
    from raquet_spark.functions.webp import _read_huffman_code

    bw = BitWriter()
    bw.write(1, 1)  # simple
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # 8-bit first symbol
    bw.write(7, 8)  # sym0 = 7 (larger listed first)
    bw.write(2, 8)  # sym1 = 2
    dec = _read_huffman_code(BitReader(bw.bytes()), 256)
    assert dec.table == {(1, 0): 7, (1, 1): 2}
    assert dec.fast[0b0] == (7, 1)
    assert dec.fast[0b1] == (2, 1)
    assert dec.fast[0b10] == (7, 1)  # higher lookahead bits ignored
    assert dec.fast[0b11] == (2, 1)


def test_predictor_spec_semantics():
    """Select (11) ties pick TOP; ClampAddSubtractHalf (13) divides with
    C truncation toward zero, not Python floor — RFC 9649 semantics for
    externally encoded lossless tiles."""
    from raquet_spark.functions.webp import _predict

    # layout: out[0] = [TL, T, ...], out[1] = [L, cur]
    out = np.zeros((2, 3, 4), dtype=np.int64)
    # mode 11 tie: L and T predict TL equally badly -> T wins
    out[0, 0] = [0, 10, 10, 10]   # TL
    out[0, 1] = [0, 20, 20, 20]   # T
    out[1, 0] = [0, 0, 0, 0]      # L  (|p-L| == |p-T| when symmetric)
    pred = _predict(out, 1, 1, 3, 11)
    np.testing.assert_array_equal(pred, out[0, 1])  # T, not L

    # mode 13: ave=10, TL=13 -> delta=-3 -> trunc(-3/2) = -1 -> 9
    out[0, 0] = [13, 13, 13, 13]  # TL
    out[0, 1] = [10, 10, 10, 10]  # T
    out[1, 0] = [10, 10, 10, 10]  # L  (ave = 10)
    pred = _predict(out, 1, 1, 3, 13)
    np.testing.assert_array_equal(pred, [9, 9, 9, 9])  # floor would give 8


class _LsbWriter:
    """Independent LSB-first bit writer for hand-building VP8L streams
    in tests (mirrors the spec's bit order, not the module's writer)."""

    def __init__(self):
        self.bits = []

    def w(self, value, nbits):
        for i in range(nbits):
            self.bits.append((value >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _simple_code(w, syms):
    """Emit a spec 'simple code' (1-2 symbols, each ≤ 255)."""
    w.w(1, 1)
    w.w(len(syms) - 1, 1)
    w.w(1, 1)  # first symbol uses 8 bits
    w.w(syms[0], 8)
    if len(syms) == 2:
        w.w(syms[1], 8)


def test_vp8l_short_distance_plane_codes_handcrafted():
    """Decoder conformance for the 120-entry 2D distance map against a
    hand-built bitstream (our encoder never emits plane codes ≤ 120):
    a 4x2 image whose second row is one backreference with plane code 1
    = offset (0, 1) = the pixel directly above."""
    import numpy as np

    from raquet_spark.functions.webp import vp8l_decode

    w = _LsbWriter()
    w.w(0x2F, 8)          # signature
    w.w(4 - 1, 14)        # width
    w.w(2 - 1, 14)        # height
    w.w(0, 1)             # alpha hint
    w.w(0, 3)             # version
    w.w(0, 1)             # no transforms
    w.w(0, 1)             # no color cache
    w.w(0, 1)             # no meta-huffman

    # GREEN: normal code, lengths: sym 50 -> 1, sym 259 (length code
    # ls=3 => copy length 4) -> 1, rest 0, alphabet 280.
    w.w(0, 1)             # not simple
    w.w(0, 4)             # num_code_lengths = 4 (order 17,18,0,1)
    for ln in (0, 1, 0, 1):   # CLC lengths: sym18 -> 1, sym1 -> 1
        w.w(ln, 3)
    w.w(0, 1)             # no max_symbol shortcut
    # canonical CLC: sym1 = code 0, sym18 = code 1 (both 1 bit)
    def zeros(n):         # emit an 18-run covering n zeros (11..138)
        w.w(1, 1)
        w.w(n - 11, 7)
    zeros(50)             # syms 0..49
    w.w(0, 1)             # length 1 at sym 50
    zeros(138)            # 51..188
    zeros(70)             # 189..258
    w.w(0, 1)             # length 1 at sym 259
    zeros(20)             # 260..279
    _simple_code(w, [10, 20])    # RED: codes 0/1
    _simple_code(w, [30, 40])    # BLUE
    _simple_code(w, [255])       # ALPHA: zero-bit code
    _simple_code(w, [0])         # DISTANCE: zero-bit code (ds=0)

    # row 0: four literals (G bit 0 = sym 50), R/B chosen per pixel
    for rbit, bbit in ((0, 0), (1, 0), (1, 1), (0, 1)):
        w.w(0, 1)         # green literal 50
        w.w(rbit, 1)
        w.w(bbit, 1)
    # row 1: one backref: G bit 1 = sym 259 => length 4 (no extra),
    # distance symbol is zero-bit, ds=0 => plane code 1 => (dx,dy)=(0,1)
    # => dist = 0 + 1*4 = 4
    w.w(1, 1)

    out = vp8l_decode(w.bytes())
    assert out.shape == (2, 4, 4)
    exp_row = np.array([
        [255, 10, 50, 30], [255, 20, 50, 30],
        [255, 20, 50, 40], [255, 10, 50, 40],
    ], dtype=np.uint8)
    assert (out[0] == exp_row).all(), out[0]
    assert (out[1] == exp_row).all(), out[1]  # copied from the row above


def test_vp8l_meta_huffman_handcrafted():
    """Decoder conformance for meta-huffman partitions against a
    hand-built bitstream (libwebp emits these for larger images; our
    encoder never does): an 8x4 image split into two 4x4 tiles, each
    tile bound to a different huffman group through the huffman image
    (group index = red<<8 | green)."""
    import numpy as np

    from raquet_spark.functions.webp import vp8l_decode

    w = _LsbWriter()
    w.w(0x2F, 8)
    w.w(8 - 1, 14)
    w.w(4 - 1, 14)
    w.w(0, 1)             # alpha hint
    w.w(0, 3)             # version
    w.w(0, 1)             # no transforms
    w.w(0, 1)             # no color cache
    w.w(1, 1)             # meta-huffman present
    w.w(0, 3)             # precision = 2 + 0 => 4x4 tiles => 2x1 map

    # huffman image (2x1, level0=False): greens 0 and 1 are the groups
    w.w(0, 1)             # inner image: no color cache
    _simple_code(w, [0, 1])      # GREEN: two literals
    _simple_code(w, [0])         # RED (zero-bit)
    _simple_code(w, [0])         # BLUE
    _simple_code(w, [255])       # ALPHA
    _simple_code(w, [0])         # DISTANCE
    w.w(0, 1)             # tile 0 -> green 0 -> group 0
    w.w(1, 1)             # tile 1 -> green 1 -> group 1

    # two huffman-code groups, all single-symbol (zero-bit) codes
    for g, r, b in ((100, 11, 22), (200, 33, 44)):
        _simple_code(w, [g])
        _simple_code(w, [r])
        _simple_code(w, [b])
        _simple_code(w, [255])
        _simple_code(w, [0])
    # 32 literal pixels follow — every code is zero-bit, so no data bits

    out = vp8l_decode(w.bytes())
    assert out.shape == (4, 8, 4)
    left = np.array([255, 11, 100, 22], dtype=np.uint8)
    right = np.array([255, 33, 200, 44], dtype=np.uint8)
    assert (out[:, :4] == left).all(), out[0, 0]
    assert (out[:, 4:] == right).all(), out[0, 4]
