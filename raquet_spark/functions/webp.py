"""Pure-python WebP **lossless** (VP8L) codec for uint8 1-4 band tiles.

The reference encodes WebP via Pillow (reference raster2raquet.py:816,
Pillow-gated there too); this container has no PIL, so — like the JPEG
baseline codec in :mod:`raquet_spark.functions.jpeg` — the format is
implemented from the public bitstream specification (the "WebP Lossless
Bitstream Specification", also published as RFC 9649 §3). Lossy VP8 is
deliberately out of scope: it needs a full DCT/bool-coder video
intra-frame codec and the spec names VP8L as the lossless path; the
split is documented in operators/layout.py.

Encoder (``vp8l_encode``) emits a spec-subset chosen for simplicity and
good ratios on raster tiles:

- optional transforms: subtract-green (default), fixed-mode predictor,
  fixed-element color transform, color-indexing (palette, with pixel
  bundling below 16 colors)
- LZ77 backreferences for pixel runs (distance-1 RLE, encoded through
  the >120 "direct distance" plane codes, so the 2D distance map is
  never needed on our own output)
- optional color cache
- canonical Huffman codes serialized through the code-length code, with
  the 1-2 symbol "simple code" shortcut

Decoder (``vp8l_decode``) covers the FULL VP8L spatial feature set —
everything the encoder can emit plus color-cache hits, all four inverse
transforms, the 120-entry short-distance plane-code map, and
meta-Huffman partitions (the per-tile huffman-group image libwebp emits
for larger photos). The libwebp-only features are verified against
hand-built bitstreams in tests (no PIL in this container), the rest by
encoder round-trips.

Bit order: LSB-first within bytes for value fields; Huffman codes are
read/written most-significant code bit first (DEFLATE convention), per
the spec.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# green-channel symbol space: 256 literals + 24 length prefixes (+ cache)
NUM_LITERALS = 256
NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40
MAX_ALLOWED_CODE_LENGTH = 15
# code-length-code transmission order (spec §"Decoding the code lengths")
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_HASH_MUL = 0x1E35A7BD

TRANSFORM_PREDICTOR = 0
TRANSFORM_COLOR = 1
TRANSFORM_SUBTRACT_GREEN = 2
TRANSFORM_PALETTE = 3


def _bit_reverse(code: int, length: int) -> int:
    out = 0
    for _ in range(length):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


class BitWriter:
    """LSB-first bit packer (value fields); MSB-first for Huffman codes.

    Values are buffered as (value, nbits) pairs — plus whole numpy
    arrays via :meth:`write_array` — and packed ONCE in :meth:`bytes`
    with a vectorized bit scatter, so emitting a 256×256 tile's symbol
    stream costs a handful of numpy ops instead of a per-bit loop."""

    def __init__(self) -> None:
        self._chunks: list[tuple] = []  # (values array-like, nbits array-like)

    def write(self, value: int, nbits: int) -> None:
        if nbits:
            self._chunks.append((value & ((1 << nbits) - 1), nbits))

    def write_code(self, code: int, length: int) -> None:
        # MSB-of-code-first == LSB-first emission of the reversed code
        self.write(_bit_reverse(code, length), length)

    def write_array(self, values: np.ndarray, nbits: np.ndarray) -> None:
        """Append many fields at once (values already bit-reversed for
        Huffman codes). Zero-width entries are allowed and skipped."""
        self._chunks.append((values, nbits))

    def bytes(self) -> bytes:
        if not self._chunks:
            return b""
        vals = np.concatenate(
            [np.atleast_1d(np.asarray(v, dtype=np.int64)) for v, _ in self._chunks]
        )
        bits = np.concatenate(
            [
                np.atleast_1d(np.asarray(n, dtype=np.int64))
                for _, n in self._chunks
            ]
        )
        keep = bits > 0
        vals, bits = vals[keep], bits[keep]
        offsets = np.concatenate(([0], np.cumsum(bits)[:-1]))
        total = int(offsets[-1] + bits[-1]) if len(bits) else 0
        out = np.zeros(-(-total // 8) * 8, dtype=np.uint8)
        max_b = int(bits.max()) if len(bits) else 0
        for i in range(max_b):
            mask = bits > i
            out[offsets[mask] + i] = (vals[mask] >> i) & 1
        return np.packbits(out, bitorder="little").tobytes()[: -(-total // 8)]


class BitReader:
    """LSB-first bit reader over a bytes payload."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            p = self._pos + i
            v |= ((self._data[p >> 3] >> (p & 7)) & 1) << i
        self._pos += nbits
        return v


def _limited_huffman_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Canonical Huffman code lengths, depth-limited via Kraft repair."""
    symbols = [i for i, f in enumerate(freqs) if f > 0]
    n = len(symbols)
    lengths = [0] * len(freqs)
    if n == 0:
        return lengths
    if n == 1:
        lengths[symbols[0]] = 1
        return lengths
    # standard heap huffman
    heap = [(freqs[s], s, None) for s in symbols]
    heapq.heapify(heap)
    nodes: list[tuple] = []
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        node = (a[0] + b[0], -len(nodes) - 1, (a, b))
        nodes.append(node)
        heapq.heappush(heap, node)

    def assign(node: tuple, depth: int) -> None:
        if node[2] is None:
            lengths[node[1]] = max(1, depth)
        else:
            assign(node[2][0], depth + 1)
            assign(node[2][1], depth + 1)

    assign(heap[0], 0)
    # depth-limit: clamp, then restore the Kraft inequality by demoting
    # the shallowest over-budget leaves
    for s in symbols:
        if lengths[s] > max_len:
            lengths[s] = max_len
    kraft = sum(1 << (max_len - lengths[s]) for s in symbols)
    budget = 1 << max_len
    while kraft > budget:
        # deepen the least-frequent symbol that can still go deeper
        cand = min(
            (s for s in symbols if lengths[s] < max_len),
            key=lambda s: (freqs[s], -lengths[s]),
        )
        kraft -= 1 << (max_len - lengths[cand])
        lengths[cand] += 1
        kraft += 1 << (max_len - lengths[cand])
    return lengths


def _canonical_codes(lengths: list[int]) -> list[int]:
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    codes = [0] * len(lengths)
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    for sym, ln in enumerate(lengths):
        if ln:
            codes[sym] = next_code[ln]
            next_code[ln] += 1
    return codes


class _HuffDecoder:
    """Canonical decoder (MSB-of-code-first) with an 8-bit first-level
    lookup table; codes longer than 8 bits fall back to a bit walk."""

    def __init__(self, lengths: list[int]) -> None:
        codes = _canonical_codes(lengths)
        self.table = {
            (ln, codes[s]): s for s, ln in enumerate(lengths) if ln
        }
        nonzero = [s for s, ln in enumerate(lengths) if ln]
        # a single-symbol code costs zero bits in VP8L
        self.only = nonzero[0] if len(nonzero) == 1 else None
        # first-level table over the next 8 stream bits (LSB-first
        # lookahead ⇔ bit-reversed code in the low bits)
        fast: list[tuple[int | None, int]] = [(None, 0)] * 256
        for s, ln in enumerate(lengths):
            if 0 < ln <= 8:
                rev = _bit_reverse(codes[s], ln)
                for j in range(1 << (8 - ln)):
                    fast[rev | (j << ln)] = (s, ln)
        self.fast = fast

    def decode(self, br: BitReader) -> int:
        if self.only is not None:
            return self.only
        code = 0
        length = 0
        table = self.table
        for _ in range(MAX_ALLOWED_CODE_LENGTH):
            code = (code << 1) | br.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L huffman code")


# --------------------------------------------------------------------------
# Huffman code (de)serialization
# --------------------------------------------------------------------------


def _write_huffman_code(bw: BitWriter, lengths: list[int]) -> None:
    used = [s for s, ln in enumerate(lengths) if ln]
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple code
        bw.write(len(used) - 1, 1)
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    if not used:
        # degenerate: an alphabet never read (e.g. distances when no
        # backrefs); emit a 1-symbol simple code for symbol 0
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(0, 8)
        return
    bw.write(0, 1)  # normal code

    # RLE the length array into code-length-code symbols
    cl_syms: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    n = len(lengths)
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                cl_syms.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                cl_syms.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                cl_syms.append((0, 0, 0))
        else:
            cl_syms.append((ln, 0, 0))
            left = run - 1
            while left >= 3:
                take = min(left, 6)
                cl_syms.append((16, take - 3, 2))
                left -= take
            for _ in range(left):
                cl_syms.append((ln, 0, 0))
        i += run

    clc_freq = [0] * 19
    for s, _, _ in cl_syms:
        clc_freq[s] += 1
    clc_len = _limited_huffman_lengths(clc_freq, 7)
    # single-symbol codes cost ZERO bits (decoder shortcut); mirror that
    # on the emit side or the streams desync
    clc_multi = sum(1 for x in clc_len if x) > 1
    clc_codes = _canonical_codes(clc_len)

    order_lengths = [clc_len[s] for s in _CLC_ORDER]
    num = 19
    while num > 4 and order_lengths[num - 1] == 0:
        num -= 1
    bw.write(num - 4, 4)
    for k in range(num):
        bw.write(order_lengths[k], 3)
    bw.write(0, 1)  # no max_symbol shortcut: lengths cover the alphabet
    for s, extra, ebits in cl_syms:
        if clc_multi:
            bw.write_code(clc_codes[s], clc_len[s])
        if ebits:
            bw.write(extra, ebits)


def _read_huffman_code(br: BitReader, alphabet_size: int) -> _HuffDecoder:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1
            dec = _HuffDecoder(lengths)
            return dec
        sym1 = br.read(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        dec = _HuffDecoder(lengths)
        if sym0 > sym1:
            # spec: the FIRST-listed symbol takes code 0; canonical
            # assignment sorted by symbol, so remap BOTH lookup paths
            # (the fast table is consulted before the bit-walk table)
            dec.table = {(1, 0): sym0, (1, 1): sym1}
            fast = [(None, 0)] * 256
            for j in range(128):
                fast[(j << 1) | 0] = (sym0, 1)
                fast[(j << 1) | 1] = (sym1, 1)
            dec.fast = fast
        return dec

    num = br.read(4) + 4
    clc_len = [0] * 19
    for k in range(num):
        clc_len[_CLC_ORDER[k]] = br.read(3)
    clc = _HuffDecoder(clc_len)

    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size

    lengths = [0] * alphabet_size
    prev_nonzero = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev_nonzero = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev_nonzero
                    sym += 1
        elif s == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _HuffDecoder(lengths)


# --------------------------------------------------------------------------
# prefix (length/distance) codes
# --------------------------------------------------------------------------


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value >= 1 → (symbol, extra_bits_value, extra_bits_count)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    hb = x.bit_length() - 1
    shb = (x >> (hb - 1)) & 1
    sym = 2 * hb + shb
    eb = hb - 1
    extra = x - ((2 + shb) << eb)
    return sym, extra, eb


def _prefix_decode(sym: int, br: BitReader) -> int:
    if sym < 4:
        return sym + 1
    eb = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << eb
    return offset + br.read(eb) + 1


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _to_argb(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 → (H, W, 4) channels [A, R, G, B]."""
    h, w = arr.shape[:2]
    c = arr.shape[2]
    out = np.empty((h, w, 4), dtype=np.uint8)
    if c == 1:
        out[..., 0] = 255
        out[..., 1] = out[..., 2] = out[..., 3] = arr[..., 0]
    elif c == 2:
        out[..., 0] = arr[..., 1]
        out[..., 1] = out[..., 2] = out[..., 3] = arr[..., 0]
    elif c == 3:
        out[..., 0] = 255
        out[..., 1] = arr[..., 0]
        out[..., 2] = arr[..., 1]
        out[..., 3] = arr[..., 2]
    else:
        out[..., 0] = arr[..., 3]
        out[..., 1] = arr[..., 0]
        out[..., 2] = arr[..., 1]
        out[..., 3] = arr[..., 2]
    return out


def _cache_index(argb_px: int, cache_bits: int) -> int:
    return ((argb_px * _HASH_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)


def _delta(t: int, v: int) -> int:
    """Color-transform delta: (int8(t) * int8(v)) >> 5, arithmetic."""
    ts = t - 256 if t >= 128 else t
    vs = v - 256 if v >= 128 else v
    return (ts * vs) >> 5


def _write_entropy_image(
    bw: BitWriter,
    argb: np.ndarray,
    use_lz77: bool = True,
    cache_bits: int = 0,
    level0: bool = False,
) -> None:
    """Serialize one ARGB image (H, W, 4) as a VP8L entropy-coded image
    (cache bit [+ meta-huffman bit at level 0] + 5 huffman codes +
    symbol stream). The caller has already written any transform
    headers."""
    h, w = argb.shape[:2]
    flat = argb.reshape(-1, 4)
    n = len(flat)
    packed = (
        flat[:, 0].astype(np.uint32) << 24
        | flat[:, 1].astype(np.uint32) << 16
        | flat[:, 2].astype(np.uint32) << 8
        | flat[:, 3].astype(np.uint32)
    )

    if not cache_bits:
        # the cache-free stream has no sequential state, so tokenize and
        # emit fully vectorized (same runs, same bits as the loop below)
        _write_entropy_image_fast(bw, flat, packed, use_lz77, level0)
        return

    # tokenize: distance-1 runs as LZ77 copies, optional cache hits
    tokens: list[tuple] = []
    cache: list[int] | None = (
        [-1] * (1 << cache_bits) if cache_bits else None
    )
    if use_lz77 and n > 1:
        same = np.concatenate(([False], packed[1:] == packed[:-1]))
    else:
        same = np.zeros(n, dtype=bool)
    i = 0
    while i < n:
        if same[i]:
            run = 1
            while i + run < n and same[i + run] and run < 4096:
                run += 1
            if run >= 4:
                tokens.append(("copy", run, 1))
                if cache is not None:
                    for j in range(i, i + run):
                        cache[_cache_index(int(packed[j]), cache_bits)] = int(
                            packed[j]
                        )
                i += run
                continue
        px = int(packed[i])
        if cache is not None:
            ci = _cache_index(px, cache_bits)
            if cache[ci] == px:
                tokens.append(("cache", ci))
                i += 1
                continue
            cache[ci] = px
        a, r, g, b = flat[i]
        tokens.append(("lit", int(a), int(r), int(g), int(b)))
        i += 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    green_size = NUM_LITERALS + NUM_LENGTH_CODES + cache_size
    freq_g = [0] * green_size
    freq_r = [0] * 256
    freq_b = [0] * 256
    freq_a = [0] * 256
    freq_d = [0] * NUM_DISTANCE_CODES
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1:]
            freq_g[g] += 1
            freq_r[r] += 1
            freq_b[b] += 1
            freq_a[a] += 1
        elif t[0] == "copy":
            ls, _, _ = _prefix_encode(t[1])
            freq_g[NUM_LITERALS + ls] += 1
            # distance 1 → direct plane code 1 + 120
            ds, _, _ = _prefix_encode(t[2] + 120)
            freq_d[ds] += 1
        else:
            freq_g[NUM_LITERALS + NUM_LENGTH_CODES + t[1]] += 1

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta-huffman partition

    len_g = _limited_huffman_lengths(freq_g, MAX_ALLOWED_CODE_LENGTH)
    len_r = _limited_huffman_lengths(freq_r, MAX_ALLOWED_CODE_LENGTH)
    len_b = _limited_huffman_lengths(freq_b, MAX_ALLOWED_CODE_LENGTH)
    len_a = _limited_huffman_lengths(freq_a, MAX_ALLOWED_CODE_LENGTH)
    len_d = _limited_huffman_lengths(freq_d, MAX_ALLOWED_CODE_LENGTH)
    for lengths in (len_g, len_r, len_b, len_a, len_d):
        _write_huffman_code(bw, lengths)
    code_g = _canonical_codes(len_g)
    code_r = _canonical_codes(len_r)
    code_b = _canonical_codes(len_b)
    code_a = _canonical_codes(len_a)
    code_d = _canonical_codes(len_d)

    def emit(codes: list[int], lens: list[int], sym: int) -> None:
        # single-symbol codes cost zero bits
        if lens[sym]:
            bw.write_code(codes[sym], lens[sym])

    nonzero_g = sum(1 for x in len_g if x)
    nonzero = {
        "g": nonzero_g > 1,
        "r": sum(1 for x in len_r if x) > 1,
        "b": sum(1 for x in len_b if x) > 1,
        "a": sum(1 for x in len_a if x) > 1,
        "d": sum(1 for x in len_d if x) > 1,
    }

    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1:]
            if nonzero["g"]:
                emit(code_g, len_g, g)
            if nonzero["r"]:
                emit(code_r, len_r, r)
            if nonzero["b"]:
                emit(code_b, len_b, b)
            if nonzero["a"]:
                emit(code_a, len_a, a)
        elif t[0] == "copy":
            ls, lextra, lbits = _prefix_encode(t[1])
            if nonzero["g"]:
                emit(code_g, len_g, NUM_LITERALS + ls)
            if lbits:
                bw.write(lextra, lbits)
            ds, dextra, dbits = _prefix_encode(t[2] + 120)
            if nonzero["d"]:
                emit(code_d, len_d, ds)
            if dbits:
                bw.write(dextra, dbits)
        else:
            if nonzero["g"]:
                emit(code_g, len_g, NUM_LITERALS + NUM_LENGTH_CODES + t[1])


def _write_entropy_image_fast(
    bw: BitWriter,
    flat: np.ndarray,
    packed: np.ndarray,
    use_lz77: bool,
    level0: bool,
) -> None:
    """Vectorized serializer for the color-cache-free stream: run
    detection, frequency counting, and code emission are numpy passes;
    Python loops only over LZ77 runs (not pixels). Produces bit-for-bit
    the same stream as the general tokenizer."""
    n = len(flat)
    runs: list[tuple[int, int]] = []  # (start pixel, copy length)
    if use_lz77 and n > 1:
        same = packed[1:] == packed[:-1]
        edges = np.flatnonzero(
            np.diff(np.concatenate(([False], same, [False])).astype(np.int8))
        )
        for s, e in zip(edges[::2], edges[1::2]):
            pos, left = int(s) + 1, int(e - s)
            while left >= 4:
                take = min(left, 4096)
                runs.append((pos, take))
                pos += take
                left -= take
    lit_mask = np.ones(n, dtype=bool)
    for s, length in runs:
        lit_mask[s : s + length] = False

    av = flat[:, 0][lit_mask].astype(np.int64)
    rv = flat[:, 1][lit_mask].astype(np.int64)
    gv = flat[:, 2][lit_mask].astype(np.int64)
    bv = flat[:, 3][lit_mask].astype(np.int64)

    green_size = NUM_LITERALS + NUM_LENGTH_CODES
    freq_g = np.bincount(gv, minlength=green_size).tolist()
    run_syms = [_prefix_encode(length) for _, length in runs]
    for ls, _, _ in run_syms:
        freq_g[NUM_LITERALS + ls] += 1
    freq_r = np.bincount(rv, minlength=256).tolist()
    freq_b = np.bincount(bv, minlength=256).tolist()
    freq_a = np.bincount(av, minlength=256).tolist()
    freq_d = [0] * NUM_DISTANCE_CODES
    dist_sym, dist_extra, dist_ebits = _prefix_encode(1 + 120)
    if runs:
        freq_d[dist_sym] = len(runs)

    bw.write(0, 1)  # no color cache
    if level0:
        bw.write(0, 1)  # no meta-huffman partition

    lens = [
        _limited_huffman_lengths(f, MAX_ALLOWED_CODE_LENGTH)
        for f in (freq_g, freq_r, freq_b, freq_a, freq_d)
    ]
    for lengths in lens:
        _write_huffman_code(bw, lengths)
    len_g, len_r, len_b, len_a, len_d = lens

    def emit_tables(lengths: list[int]) -> tuple[np.ndarray, np.ndarray]:
        codes = _canonical_codes(lengths)
        if sum(1 for x in lengths if x) <= 1:
            # single-symbol codes cost zero bits on the wire
            lengths = [0] * len(lengths)
        rc = np.fromiter(
            (_bit_reverse(c, ln) for c, ln in zip(codes, lengths)),
            dtype=np.int64,
            count=len(lengths),
        )
        return rc, np.asarray(lengths, dtype=np.int64)

    (rc_g, ln_g), (rc_r, ln_r), (rc_b, ln_b), (rc_a, ln_a), (rc_d, ln_d) = (
        emit_tables(ls) for ls in lens
    )

    def emit_span(lo: int, hi: int) -> None:
        """Literal pixels lo..hi-1 of the literal-compressed arrays."""
        m = hi - lo
        if m <= 0:
            return
        sl = slice(lo, hi)
        vals = np.empty(m * 4, dtype=np.int64)
        nb = np.empty(m * 4, dtype=np.int64)
        vals[0::4] = rc_g[gv[sl]]
        nb[0::4] = ln_g[gv[sl]]
        vals[1::4] = rc_r[rv[sl]]
        nb[1::4] = ln_r[rv[sl]]
        vals[2::4] = rc_b[bv[sl]]
        nb[2::4] = ln_b[bv[sl]]
        vals[3::4] = rc_a[av[sl]]
        nb[3::4] = ln_a[av[sl]]
        bw.write_array(vals, nb)

    # walk the stream: literal spans between runs, runs as 4 scalar
    # fields (green length code, length extra, distance code, extra)
    lidx = 0  # consumed literal pixels
    pixel = 0
    for (start, length), (ls, lextra, lbits) in zip(runs, run_syms):
        span = start - pixel
        emit_span(lidx, lidx + span)
        lidx += span
        gsym = NUM_LITERALS + ls
        bw.write(int(rc_g[gsym]), int(ln_g[gsym]))
        if lbits:
            bw.write(lextra, lbits)
        bw.write(int(rc_d[dist_sym]), int(ln_d[dist_sym]))
        if dist_ebits:
            bw.write(dist_extra, dist_ebits)
        pixel = start + length
    emit_span(lidx, len(gv))


def vp8l_encode(
    arr: np.ndarray,
    subtract_green: bool = True,
    predictor_mode: int | None = None,
    color_elements: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = True,
) -> bytes:
    """(H, W, C) uint8 (C in 1..4) → WebP (RIFF/VP8L) bytes, lossless.

    Options select which spec transforms precede the entropy image;
    defaults (subtract-green + LZ77 runs) give good ratios on raster
    tiles with zero risk of precision loss."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if not (1 <= c <= 4):
        raise ValueError(f"webp supports 1-4 bands, got {c}")
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L dimensions limited to 16384 x 16384")
    argb = _to_argb(arr).astype(np.int32)
    alpha_used = c in (2, 4)

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha_used else 0, 1)
    bw.write(0, 3)

    enc_w = w
    if palette:
        colors, inverse = np.unique(
            argb.reshape(-1, 4), axis=0, return_inverse=True
        )
        psize = len(colors)
        if psize > 256:
            raise ValueError("palette transform needs <= 256 distinct colors")
        bw.write(1, 1)
        bw.write(TRANSFORM_PALETTE, 2)
        bw.write(psize - 1, 8)
        # palette entries are delta-coded against the previous entry
        pal = colors.astype(np.int32)
        deltas = pal.copy()
        deltas[1:] = (pal[1:] - pal[:-1]) & 0xFF
        _write_entropy_image(bw, deltas.reshape(1, psize, 4), use_lz77=False)
        # bundle indices into the green channel
        if psize <= 2:
            width_bits = 3
        elif psize <= 4:
            width_bits = 2
        elif psize <= 16:
            width_bits = 1
        else:
            width_bits = 0
        xb = 1 << width_bits
        enc_w = (w + xb - 1) >> width_bits
        idx = inverse.reshape(h, w).astype(np.uint32)
        packed_idx = np.zeros((h, enc_w), dtype=np.uint32)
        bits_per = 8 >> width_bits
        for sub in range(xb):
            cols = idx[:, sub::xb]
            packed_idx[:, : cols.shape[1]] |= cols << (sub * bits_per)
        argb = np.zeros((h, enc_w, 4), dtype=np.int32)
        argb[..., 0] = 255
        argb[..., 2] = packed_idx
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(TRANSFORM_SUBTRACT_GREEN, 2)
            argb[..., 1] = (argb[..., 1] - argb[..., 2]) & 0xFF
            argb[..., 3] = (argb[..., 3] - argb[..., 2]) & 0xFF
        if color_elements is not None:
            g2r, g2b, r2b = color_elements
            bw.write(1, 1)
            bw.write(TRANSFORM_COLOR, 2)
            size_bits = 4
            bw.write(size_bits - 2, 3)
            bs = 1 << size_bits
            sw, sh = (enc_w + bs - 1) >> size_bits, (h + bs - 1) >> size_bits
            sub = np.zeros((sh, sw, 4), dtype=np.uint8)
            sub[..., 0] = 255
            sub[..., 1] = r2b  # red channel stores red_to_blue
            sub[..., 2] = g2b  # green channel stores green_to_blue
            sub[..., 3] = g2r  # blue channel stores green_to_red
            _write_entropy_image(bw, sub, use_lz77=False)
            for y in range(h):
                for x in range(enc_w):
                    g = argb[y, x, 2]
                    r = (argb[y, x, 1] - _delta(g2r, int(argb[y, x, 2]))) & 0xFF
                    b = (
                        argb[y, x, 3]
                        - _delta(g2b, int(g))
                        - _delta(r2b, int(argb[y, x, 1]))
                    ) & 0xFF
                    argb[y, x, 1] = r
                    argb[y, x, 3] = b
        if predictor_mode is not None:
            if predictor_mode not in (1, 2):
                raise ValueError(
                    "encoder supports fixed predictor modes 1 (left) and "
                    "2 (top); the decoder handles all 14"
                )
            bw.write(1, 1)
            bw.write(TRANSFORM_PREDICTOR, 2)
            size_bits = 4
            bw.write(size_bits - 2, 3)
            bs = 1 << size_bits
            sw, sh = (enc_w + bs - 1) >> size_bits, (h + bs - 1) >> size_bits
            sub = np.zeros((sh, sw, 4), dtype=np.uint8)
            sub[..., 0] = 255
            sub[..., 2] = predictor_mode  # mode rides the green channel
            _write_entropy_image(bw, sub, use_lz77=False)
            src = argb.copy()
            for y in range(h):
                for x in range(enc_w):
                    if x == 0 and y == 0:
                        pred = np.array([255, 0, 0, 0])
                    elif y == 0:
                        pred = src[y, x - 1]
                    elif x == 0:
                        pred = src[y - 1, x]
                    elif predictor_mode == 1:
                        pred = src[y, x - 1]
                    else:
                        pred = src[y - 1, x]
                    argb[y, x] = (src[y, x] - pred) & 0xFF
    bw.write(0, 1)  # end of transforms
    _write_entropy_image(
        bw, argb.astype(np.uint8), use_lz77, cache_bits, level0=True
    )

    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
"""Plane codes 1..120 → (dx, dy) neighbor offsets (WebP lossless spec
§4.2.2 "distance mapping"): dist = dx + dy·xsize, clamped to ≥ 1."""


def _read_entropy_coded_image(
    br: BitReader, w: int, h: int, level0: bool
) -> np.ndarray:
    """Decode one entropy-coded ARGB image → (h, w, 4) uint8.

    ``level0`` gates the meta-huffman bit (only the top-level image may
    carry one): when set, a sub-resolution "huffman image" assigns each
    2^p×2^p tile a huffman-code group (index = red<<8|green), and every
    symbol is decoded with the group of the pixel position it starts
    at. Single-group images (what our encoder writes) skip the per-
    symbol group lookup entirely."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"invalid color cache bits {cache_bits}")
    gmap = None
    prec = 0
    num_groups = 1
    if level0 and br.read(1):
        # meta-huffman: the huffman image is itself an entropy-coded
        # image (never recursively partitioned)
        prec = br.read(3) + 2
        hw = (w + (1 << prec) - 1) >> prec
        hh = (h + (1 << prec) - 1) >> prec
        himg = _read_entropy_coded_image(br, hw, hh, level0=False)
        gmap = (himg[:, :, 1].astype(np.int32) << 8) | himg[:, :, 2]
        num_groups = int(gmap.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [
        (
            _read_huffman_code(br, NUM_LITERALS + NUM_LENGTH_CODES + cache_size),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, NUM_DISTANCE_CODES),
        )
        for _ in range(num_groups)
    ]
    dec_g, dec_r, dec_b, dec_a, dec_d = groups[0]

    cache = [0] * cache_size
    n = h * w
    out: list[int] = []  # packed 0xAARRGGBB ints; unpacked vectorized below

    # manual bit buffer over the shared reader's payload: ~10x fewer
    # Python operations per symbol than per-bit reads (zero-padded so
    # the 8-bit table can peek past the last byte safely)
    data = br._data + b"\x00\x00\x00\x00"
    bitpos = br._pos
    bytepos = bitpos >> 3
    acc = 0
    nacc = 0
    if bitpos & 7:
        acc = data[bytepos] >> (bitpos & 7)
        nacc = 8 - (bitpos & 7)
        bytepos += 1

    def _decode_sym(dec: _HuffDecoder) -> int:
        nonlocal acc, nacc, bytepos
        if dec.only is not None:
            return dec.only
        while nacc < 24:
            acc |= data[bytepos] << nacc
            bytepos += 1
            nacc += 8
        sym, ln = dec.fast[acc & 0xFF]
        if sym is None:
            code = 0
            ln = 0
            while True:
                code = (code << 1) | ((acc >> ln) & 1)
                ln += 1
                sym = dec.table.get((ln, code))
                if sym is not None:
                    break
                if ln > MAX_ALLOWED_CODE_LENGTH:
                    raise ValueError("invalid VP8L huffman code")
        acc >>= ln
        nacc -= ln
        return sym

    def _read_bits(k: int) -> int:
        nonlocal acc, nacc, bytepos
        while nacc < k:
            acc |= data[bytepos] << nacc
            bytepos += 1
            nacc += 8
        v = acc & ((1 << k) - 1)
        acc >>= k
        nacc -= k
        return v

    while len(out) < n:
        if gmap is not None:
            y, x = divmod(len(out), w)
            dec_g, dec_r, dec_b, dec_a, dec_d = groups[
                gmap[y >> prec, x >> prec]
            ]
        s = _decode_sym(dec_g)
        if s < NUM_LITERALS:
            r = _decode_sym(dec_r)
            b = _decode_sym(dec_b)
            a = _decode_sym(dec_a)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out.append(px)
            if cache_size:
                cache[_cache_index(px, cache_bits)] = px
        elif s < NUM_LITERALS + NUM_LENGTH_CODES:
            ls = s - NUM_LITERALS
            length = (
                ls + 1
                if ls < 4
                else ((2 + (ls & 1)) << ((ls - 2) >> 1))
                + _read_bits((ls - 2) >> 1)
                + 1
            )
            ds = _decode_sym(dec_d)
            plane_code = (
                ds + 1
                if ds < 4
                else ((2 + (ds & 1)) << ((ds - 2) >> 1))
                + _read_bits((ds - 2) >> 1)
                + 1
            )
            if plane_code <= 120:
                dx, dy = _DIST_MAP[plane_code - 1]
                dist = max(1, dx + dy * w)
            else:
                dist = plane_code - 120
            pos = len(out)
            if dist > pos:
                raise ValueError("VP8L backreference before image start")
            length = min(length, n - pos)
            if dist == 1:
                out.extend([out[-1]] * length)
            elif dist >= length:
                out.extend(out[pos - dist : pos - dist + length])
            else:
                left = length
                while left > 0:
                    p = len(out)
                    take = min(dist, left)
                    out.extend(out[p - dist : p - dist + take])
                    left -= take
            if cache_size:
                for px in out[pos:]:
                    cache[_cache_index(px, cache_bits)] = px
        else:
            px = cache[s - NUM_LITERALS - NUM_LENGTH_CODES]
            out.append(px)

    br._pos = bytepos * 8 - nacc
    arr = np.asarray(out, dtype=np.uint32)
    res = np.empty((n, 4), dtype=np.uint8)
    res[:, 0] = arr >> 24
    res[:, 1] = (arr >> 16) & 0xFF
    res[:, 2] = (arr >> 8) & 0xFF
    res[:, 3] = arr & 0xFF
    return res.reshape(h, w, 4)


def vp8l_decode(buf: bytes) -> np.ndarray:
    """WebP (RIFF/VP8L) bytes → (H, W, 4) uint8 in [A, R, G, B] order."""
    data = bytes(buf)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        # walk chunks to VP8L
        off = 12
        payload = None
        while off + 8 <= len(data):
            tag = data[off : off + 4]
            size = struct.unpack("<I", data[off + 4 : off + 8])[0]
            body = data[off + 8 : off + 8 + size]
            if tag == b"VP8L":
                payload = body
                break
            if tag == b"VP8 ":
                raise NotImplementedError(
                    "lossy VP8 webp requires a DCT/bool-coder video codec; "
                    "only lossless VP8L is implemented (module docstring)"
                )
            off += 8 + size + (size & 1)
        if payload is None:
            raise ValueError("no VP8L chunk in WebP container")
    else:
        payload = data

    br = BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")

    transforms: list[tuple] = []
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == TRANSFORM_SUBTRACT_GREEN:
            transforms.append((ttype,))
        elif ttype in (TRANSFORM_PREDICTOR, TRANSFORM_COLOR):
            size_bits = br.read(3) + 2
            bs = 1 << size_bits
            sw = (cur_w + bs - 1) >> size_bits
            sh = (h + bs - 1) >> size_bits
            sub = _read_entropy_coded_image(br, sw, sh, level0=False)
            transforms.append((ttype, size_bits, sub))
        elif ttype == TRANSFORM_PALETTE:
            psize = br.read(8) + 1
            deltas = _read_entropy_coded_image(br, psize, 1, level0=False)
            pal = np.cumsum(
                deltas.reshape(psize, 4).astype(np.int64), axis=0
            ) % 256
            pal = pal.astype(np.uint8)
            if psize <= 2:
                width_bits = 3
            elif psize <= 4:
                width_bits = 2
            elif psize <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((ttype, width_bits, pal))
            cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits

    argb = _read_entropy_coded_image(br, cur_w, h, level0=True)

    for t in reversed(transforms):
        ttype = t[0]
        if ttype == TRANSFORM_SUBTRACT_GREEN:
            a32 = argb.astype(np.int32)
            a32[..., 1] = (a32[..., 1] + a32[..., 2]) & 0xFF
            a32[..., 3] = (a32[..., 3] + a32[..., 2]) & 0xFF
            argb = a32.astype(np.uint8)
        elif ttype == TRANSFORM_COLOR:
            _, size_bits, sub = t
            a32 = argb.astype(np.int32)
            hh, ww = a32.shape[:2]
            for y in range(hh):
                for x in range(ww):
                    cte = sub[y >> size_bits, x >> size_bits]
                    g2r = int(cte[3])  # blue channel
                    g2b = int(cte[2])  # green channel
                    r2b = int(cte[1])  # red channel
                    g = int(a32[y, x, 2])
                    r = (a32[y, x, 1] + _delta(g2r, g)) & 0xFF
                    b = (
                        a32[y, x, 3] + _delta(g2b, g) + _delta(r2b, int(r))
                    ) & 0xFF
                    a32[y, x, 1] = r
                    a32[y, x, 3] = b
            argb = a32.astype(np.uint8)
        elif ttype == TRANSFORM_PREDICTOR:
            _, size_bits, sub = t
            a32 = argb.astype(np.int32)
            hh, ww = a32.shape[:2]
            out = np.zeros_like(a32)
            for y in range(hh):
                for x in range(ww):
                    if x == 0 and y == 0:
                        pred = np.array([255, 0, 0, 0])
                    elif y == 0:
                        pred = out[y, x - 1]
                    elif x == 0:
                        pred = out[y - 1, x]
                    else:
                        mode = int(sub[y >> size_bits, x >> size_bits, 2])
                        pred = _predict(out, y, x, ww, mode)
                    out[y, x] = (a32[y, x] + pred) & 0xFF
            argb = out.astype(np.uint8)
        elif ttype == TRANSFORM_PALETTE:
            _, width_bits, pal = t
            hh = argb.shape[0]
            bits_per = 8 >> width_bits
            xb = 1 << width_bits
            packed = argb[..., 2].astype(np.uint32)
            idx = np.zeros((hh, packed.shape[1] * xb), dtype=np.uint32)
            mask = (1 << bits_per) - 1
            for sub_i in range(xb):
                idx[:, sub_i::xb] = (packed >> (sub_i * bits_per)) & mask
            idx = idx[:, :w]
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("palette index out of range")
            argb = pal[idx]
    return argb


def _predict(out: np.ndarray, y: int, x: int, w: int, mode: int) -> np.ndarray:
    L = out[y, x - 1]
    T = out[y - 1, x]
    TL = out[y - 1, x - 1]
    TR = out[y - 1, x + 1] if x + 1 < w else out[y - 1, x]

    def avg2(p, q):
        return (p + q) >> 1

    if mode == 0:
        return np.array([255, 0, 0, 0])
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return avg2(avg2(L, TR), T)
    if mode == 6:
        return avg2(L, TL)
    if mode == 7:
        return avg2(L, T)
    if mode == 8:
        return avg2(TL, T)
    if mode == 9:
        return avg2(T, TR)
    if mode == 10:
        return avg2(avg2(L, TL), avg2(T, TR))
    if mode == 11:  # select: whichever of L/T predicts TL better
        p = L.astype(np.int64) + T - TL
        perr_l = np.abs(p - L).sum()
        perr_t = np.abs(p - T).sum()
        # spec: strictly-smaller L error picks L; ties pick T
        return L if perr_l < perr_t else T
    if mode == 12:  # clamp-add-subtract-full
        return np.clip(L.astype(np.int64) + T - TL, 0, 255)
    if mode == 13:  # clamp-add-subtract-half
        ave = avg2(L, T).astype(np.int64)
        # spec divides by 2 with C truncation toward zero, not floor
        delta = ave - TL
        return np.clip(ave + np.sign(delta) * (np.abs(delta) >> 1), 0, 255)
    raise ValueError(f"invalid predictor mode {mode}")


def webp_decode_bands(buf: bytes, n_bands: int) -> np.ndarray:
    """Decode to the original band layout: gray / gray+alpha / RGB /
    RGBA from the stored ARGB."""
    argb = vp8l_decode(buf)
    if n_bands == 1:
        return argb[..., 2:3]  # green carries the gray value
    if n_bands == 2:
        return np.stack([argb[..., 2], argb[..., 0]], axis=-1)
    if n_bands == 3:
        return argb[..., [1, 2, 3]]
    return argb[..., [1, 2, 3, 0]]
