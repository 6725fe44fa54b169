"""TIFF codecs, pure Python: LZW (compression 5) and PackBits (32773).

LZW is the most common GeoTIFF codec in the wild; the reference reads it
through GDAL (/root/reference/raquet/raster2raquet.py:872 ``read_raster``).
This container has no GDAL/PIL/imagecodecs, so the codec is implemented
from the public TIFF 6.0 specification (section 13): codes are packed
MSB-first, the table starts at 9 bits with ClearCode=256 / EOI=257, and
the code width bumps one code EARLY (at table sizes 511/1023/2047 — the
"early change" convention every TIFF writer uses). The spec's worked
example (compressing ``7 7 7 8 8 7 7 6 6``) is pinned as a golden vector
in tests/test_tiff_ingest.py.

Scale note: decode runs executor-side inside ``tiff_pixel_table``'s
``mapInPandas`` — one segment per call, so throughput scales with cores
exactly like the deflate path. Encode exists for the export path and for
building test fixtures.
"""

from __future__ import annotations

_CLEAR = 256
_EOI = 257


def lzw_decode(data: bytes) -> bytes:
    """Decode a TIFF LZW segment (strip or tile payload)."""
    out: list[bytes] = []
    table: list[bytes] = []
    nbits = 9
    prev = b""
    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    while True:
        while bitcnt < nbits:
            if pos >= n:
                # stream ended without an EOI — accept (some writers
                # drop it); everything decoded so far is valid
                return b"".join(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        bitcnt -= nbits
        code = (bitbuf >> bitcnt) & ((1 << nbits) - 1)
        bitbuf &= (1 << bitcnt) - 1
        if code == _EOI:
            return b"".join(out)
        if code == _CLEAR:
            table = _BASE_TABLE.copy()
            nbits = 9
            prev = b""
            continue
        if not table:
            raise ValueError("LZW stream does not start with a clear code")
        if prev:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # KwKwK case
            else:
                raise ValueError(f"corrupt LZW stream: code {code} out of range")
            table.append(prev + entry[:1])
        else:
            if code >= len(table):
                raise ValueError(f"corrupt LZW stream: code {code} after clear")
            entry = table[code]
        out.append(entry)
        prev = entry
        # early change: widen when the NEXT code to assign is 2^nbits - 1
        if len(table) == (1 << nbits) - 1 and nbits < 12:
            nbits += 1


_BASE_TABLE = [bytes([i]) for i in range(256)] + [b"", b""]


def lzw_encode(data: bytes) -> bytes:
    """Encode bytes as a TIFF LZW segment (with leading clear code and
    trailing EOI, early-change width bumps, table reset at 4094)."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)
        bitbuf &= (1 << bitcnt) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    nbits = 9
    emit(_CLEAR, nbits)
    w = b""
    for i in range(len(data)):
        ch = data[i : i + 1]
        wk = w + ch
        if wk in table:
            w = wk
            continue
        emit(table[w], nbits)
        table[wk] = next_code
        next_code += 1
        # width sync (libtiff convention): decoder widens after DEFINING
        # entry (1<<nbits)-1, which happens one code after the encoder
        # defines it — so the encoder widens at next_code == 1<<nbits
        if next_code == (1 << nbits) and nbits < 12:
            nbits += 1
        elif next_code == 4094:
            # table nearly full: reset, exactly as libtiff's writer does
            emit(_CLEAR, nbits)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
            nbits = 9
        w = ch
    if w:
        emit(table[w], nbits)
    emit(_EOI, nbits)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (compression 32773): byte-wise RLE per the TIFF 6.0
    spec — n in 0..127 copies n+1 literals, n in -127..-1 repeats the
    next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    pos = 0
    end = len(data)
    while pos < end:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            out += data[pos : pos + 1] * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (runs ≥3 become repeats; used for fixtures and
    the export path's smallest-common-denominator codec)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal stretch until the next >=3 run (or 128 cap)
        j = i + 1
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)
