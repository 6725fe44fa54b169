"""Baseline JFIF/JPEG codec, pure numpy — the lossy tile codec.

The reference compresses interleaved uint8 tiles with Pillow
(/root/reference/raquet/raster2raquet.py:816 raises without it). This
container has no PIL, so the codec is implemented from the public
ITU-T T.81 (JPEG) and JFIF specifications: baseline sequential DCT,
8-bit, grayscale or YCbCr at 4:4:4/4:2:2/4:2:0 (the decoder reads any
sampling factors plus restart intervals — everything PIL/libjpeg emit
for baseline files), Annex-K quantization and Huffman tables with IJG
quality scaling. ``operators/layout.py`` prefers PIL
when importable and falls back here, so lossy RaQuet datasets
round-trip in either environment (files are standard JFIF either way).

Scale note: encode/decode run executor-side per tile inside the layout
converters' ``mapInPandas``; the DCT is a batched numpy matmul over all
8×8 blocks of a tile at once.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan order (T.81 figure A.6)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZZ = np.argsort(_ZZ)

# Annex K.1 quantization tables (luminance, chrominance)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 Huffman tables: (BITS[1..16], HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# orthonormal 8-point DCT-II basis
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _T[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16.0)
_T[0, :] *= np.sqrt(1.0 / 8.0)
_T[1:, :] *= 0.5


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol: (code, length)} from BITS/HUFFVAL (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling (libjpeg jpeg_quality_scaling)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(n_blocks, 8, 8) float blocks (edge-replicated padding), plus the
    padded block grid dims."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = (
        padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks.astype(np.float64) - 128.0, by, bx


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(arr: np.ndarray) -> np.ndarray:
    y, cb, cr = arr[..., 0], arr[..., 1] - 128.0, arr[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _box_downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Box-average ``plane`` by (fv, fh), edge-padding to multiples first
    (libjpeg's encoder downsampling is a box filter, h2v2_downsample)."""
    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fv) * fv, -(-w // fh) * fh
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))


def _encode_blocks(bw: "_BitWriter", zz: np.ndarray, prev_dc: int,
                   dc_tab: dict, ac_tab: dict) -> int:
    """Entropy-encode one zigzag block; returns the new DC predictor."""
    diff = int(zz[0]) - prev_dc
    size, bits = _magnitude(diff)
    code, length = dc_tab[size]
    bw.put(code, length)
    if size:
        bw.put(bits, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, end + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | size]
        bw.put(code, length)
        bw.put(bits, size)
        run = 0
    if end < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.put(code, length)
    return int(zz[0])


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    color_transform: bool = True,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF bytes.

    ``subsampling``: ``"444"`` (default — every pixel exact at
    quality 100, which the hash-exact driver queries rely on),
    ``"422"``, or ``"420"`` (PIL/libjpeg's RGB default; chroma box-
    downsampled, MCU-interleaved per T.81 A.2.3).
    ``color_transform=False`` stores the three planes as-is (RGB),
    matching TIFF photometric=2 JPEG segments."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        if color_transform:
            ycc = _rgb_to_ycbcr(a.astype(np.float64))
        else:
            ycc = a.astype(np.float64)
        planes = [ycc[..., i] for i in range(3)]
    else:
        raise ValueError(f"jpeg_encode expects (h,w) or (h,w,3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    ncomp = len(planes)
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING)}")
    hmax, vmax = _SUBSAMPLING[subsampling] if ncomp == 3 else (1, 1)
    # (Hi, Vi) per component: luma at max, chroma at 1x1
    factors = [(hmax, vmax)] + [(1, 1)] * (ncomp - 1)
    ql, qc = _quant_tables(quality)
    qtabs = [ql] + ([qc] if ncomp == 3 else [])

    # MCU grid (in 8px units scaled by each component's factor)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized zigzag coefficients per component, on the MCU-padded grid
    comp_coef = []
    comp_bx = []
    for ci, plane in enumerate(planes):
        fh, fv = hmax // factors[ci][0], vmax // factors[ci][1]
        sub = _box_downsample(plane, fh, fv)
        # pad the component plane to its MCU-aligned block grid
        tw, th = mcux * 8 * factors[ci][0], mcuy * 8 * factors[ci][1]
        sh, sw = sub.shape
        sub = np.pad(sub, ((0, th - sh), (0, tw - sw)), mode="edge")
        blocks, _by, bx = _blocks(sub)
        f = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T)
        q = qtabs[min(ci, 1)].reshape(8, 8)
        coef = np.round(f / q).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        comp_coef.append(coef)
        comp_bx.append(bx)

    dc_tabs = [_canonical_codes(*_DC_L), _canonical_codes(*_DC_C)]
    ac_tabs = [_canonical_codes(*_AC_L), _canonical_codes(*_AC_C)]

    bw = _BitWriter()
    prev_dc = [0] * ncomp
    # interleaved MCU order (T.81 A.2.3): components in SOF order, each
    # contributing Vi x Hi blocks raster-ordered within the MCU
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                t = min(ci, 1)
                hi, vi = factors[ci]
                for vy in range(vi):
                    for vx in range(hi):
                        n = (my * vi + vy) * comp_bx[ci] + (mx * hi + vx)
                        prev_dc[ci] = _encode_blocks(
                            bw, comp_coef[ci][n], prev_dc[ci],
                            dc_tabs[t], ac_tabs[t],
                        )
    bw.flush()

    # ---------------- markers ----------------
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, qt in enumerate(qtabs):
        # DQT stores entries in ZIGZAG order (T.81 B.2.4.1)
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + bytes(
            int(qt[_ZZ[k]]) for k in range(64)
        )
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = factors[ci]
        out += struct.pack("BBB", ci + 1, (hi << 4) | vi, min(ci, 1))
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_L), (1, 0, _AC_L), (0, 1, _DC_C), (1, 1, _AC_C)
    )[: 2 * min(ncomp, 2)]:
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        t = min(ci, 1)
        out += struct.pack("BB", ci + 1, (t << 4) | t)
    out += b"\x00\x3F\x00"  # Ss, Se, Ah/Al
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Byte-align (dropping pad bits) and consume an RSTn marker
        (T.81 E.2.4 — the entropy stream resets at each restart)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected restart marker in scan")


def _upsample_axis(p: np.ndarray, axis: int, factor: int) -> np.ndarray:
    """Upsample a chroma plane along one axis. Factor 2 uses libjpeg's
    'fancy' triangle filter (h2v1/h2v2_fancy_upsample: nearest 3/4 +
    next-nearest 1/4, edges clamped); other factors replicate."""
    if factor == 1:
        return p
    if factor != 2:
        return np.repeat(p, factor, axis=axis)
    a = np.moveaxis(p, axis, 0)
    prev = np.concatenate([a[:1], a[:-1]], axis=0)
    nxt = np.concatenate([a[1:], a[-1:]], axis=0)
    up = np.empty((a.shape[0] * 2,) + a.shape[1:], dtype=np.float64)
    up[0::2] = (3.0 * a + prev) / 4.0
    up[1::2] = (3.0 * a + nxt) / 4.0
    return np.moveaxis(up, 0, axis)


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, tree: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _decode_block(br: "_BitReader", dct: dict, act: dict) -> np.ndarray:
    """One entropy-coded block → zigzag coefficient vector (DC holds the
    DIFF; the caller adds the predictor)."""
    zz = np.zeros(64, dtype=np.int32)
    size = _read_symbol(br, dct)
    zz[0] = _extend(br.read(size), size) if size else 0
    k = 1
    while k < 64:
        rs = _read_symbol(br, act)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.read(size), size)
        k += 1
    return zz


def _parse_dht(seg: bytes, htrees: dict) -> None:
    p = 0
    while p < len(seg):
        cls, tid = seg[p] >> 4, seg[p] & 0xF
        bits = list(seg[p + 1 : p + 17])
        nv = sum(bits)
        htrees[(cls, tid)] = _decode_tree(bits, list(seg[p + 17 : p + 17 + nv]))
        p += 17 + nv


def _parse_dqt(seg: bytes, qtabs: dict) -> None:
    p = 0
    while p < len(seg):
        prec, tid = seg[p] >> 4, seg[p] & 0xF
        p += 1
        n = 64 * (2 if prec else 1)
        qtabs[tid] = np.frombuffer(
            seg[p : p + n], dtype=">u2" if prec else "u1"
        ).astype(np.int32)
        p += n


def _find_scan_end(data: bytes, start: int) -> int:
    """First true marker at/after ``start``: inside entropy data every
    0xFF is either stuffed (FF00) or a restart, so scanning forward for
    FF + (non-zero, non-RST, non-FF-fill) finds the scan boundary."""
    p = start
    while p < len(data) - 1:
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and data[p + 1] != 0xFF
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    return len(data)


def _dc_scan(br, zz, dtree, preds, ci, Ah, Al):
    """One DC data unit (one block of one component)."""
    if Ah == 0:
        size = _read_symbol(br, dtree)
        preds[ci] += _extend(br.read(size), size) if size else 0
        zz[0] = preds[ci] << Al
    elif br.read(1):
        zz[0] |= 1 << Al


def _ac_scan_first(br, act, zz, Ss, Se, Al, state):
    """AC spectral-selection first pass for one block (T.81 G.1.2.2)."""
    if state[0] > 0:
        state[0] -= 1
        return
    k = Ss
    while k <= Se:
        rs = _read_symbol(br, act)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > Se:
                raise ValueError("AC run past band end")
            zz[k] = _extend(br.read(s), s) << Al
            k += 1
        else:
            if r != 15:
                state[0] = (1 << r) - 1
                if r:
                    state[0] += br.read(r)
                break
            k += 16  # ZRL


def _ac_scan_refine(br, act, zz, Ss, Se, Al, state):
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3 / the public libjpeg jdphuff recipe): new ±1<<Al
    coefficients interleave with correction bits for already-nonzero
    ones."""
    p1 = 1 << Al
    m1 = -1 << Al
    k = Ss
    if state[0] == 0:
        while k <= Se:
            rs = _read_symbol(br, act)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s:
                val = p1 if br.read(1) else m1
            elif r != 15:
                state[0] = 1 << r
                if r:
                    state[0] += br.read(r)
                break
            while k <= Se:
                c = int(zz[k])
                if c != 0:
                    if br.read(1) and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= Se:
                zz[k] = val
            k += 1
    if state[0] > 0:
        while k <= Se:
            c = int(zz[k])
            if c != 0 and br.read(1) and (c & p1) == 0:
                zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        state[0] -= 1


def _decode_progressive(
    data: bytes,
    pos: int,
    comps: list,
    qtabs: dict,
    htrees: dict,
    h: int,
    w: int,
    restart_interval: int,
) -> list[np.ndarray]:
    """Progressive (SOF2) scan loop: accumulate every component's DCT
    coefficients across DC/AC spectral-selection and successive-
    approximation scans, then dequantize + IDCT once at the end.
    ``pos`` sits at the first SOS marker; DHT/DQT/DRI between scans
    update the live tables."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_ci = {c[0]: i for i, c in enumerate(comps)}
    # padded (interleaved-grid) coefficient stores + true block dims
    coefs, nbdims = [], []
    for _cid, hi, vi, _q in comps:
        coefs.append(np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32))
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        nbdims.append((-(-ch // 8), -(-cw // 8)))

    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # fill byte: only ONE byte consumed (T.81 B.1.1.2)
            pos -= 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xC4:  # DHT between scans
            _parse_dht(seg, htrees)
        elif marker == 0xDB:  # DQT between scans
            _parse_dqt(seg, qtabs)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # one scan
            ns = seg[0]
            p = 1
            scan = []  # (ci, dc_tid, ac_tid)
            for _ in range(ns):
                cid, tabs = seg[p], seg[p + 1]
                scan.append((by_ci[cid], tabs >> 4, tabs & 0xF))
                p += 2
            Ss, Se, ahal = seg[p], seg[p + 1], seg[p + 2]
            Ah, Al = ahal >> 4, ahal & 0xF
            ent_start = pos + seglen
            # no per-scan copy of the file tail: read in place
            br = _BitReader(data)
            br.pos = ent_start
            preds = [0] * len(comps)
            state = [0]  # EOBRUN

            if Ss == 0:  # DC scan (spec: Se must be 0)
                if ns > 1:  # interleaved over the MCU grid
                    n_units = mcux * mcuy
                    for n in range(n_units):
                        if restart_interval and n and n % restart_interval == 0:
                            br.restart()
                            preds = [0] * len(comps)
                        my, mx = divmod(n, mcux)
                        for ci, dtid, _atid in scan:
                            _cid, hi, vi, _q = comps[ci]
                            for vy in range(vi):
                                for vx in range(hi):
                                    zz = coefs[ci][my * vi + vy, mx * hi + vx]
                                    _dc_scan(
                                        br, zz, htrees.get((0, dtid)),
                                        preds, ci, Ah, Al,
                                    )
                else:  # single component: true block grid
                    ci, dtid, _atid = scan[0]
                    nbh, nbw = nbdims[ci]
                    for n in range(nbh * nbw):
                        if restart_interval and n and n % restart_interval == 0:
                            br.restart()
                            preds = [0] * len(comps)
                        byy, bxx = divmod(n, nbw)
                        zz = coefs[ci][byy, bxx]
                        _dc_scan(
                            br, zz, htrees.get((0, dtid)), preds, ci, Ah, Al
                        )
            else:  # AC scan: exactly one component (T.81 G.1.1)
                if ns != 1:
                    raise ValueError("progressive AC scan with >1 component")
                ci, _dtid, atid = scan[0]
                act = htrees[(1, atid)]
                nbh, nbw = nbdims[ci]
                fn = _ac_scan_first if Ah == 0 else _ac_scan_refine
                for n in range(nbh * nbw):
                    if restart_interval and n and n % restart_interval == 0:
                        br.restart()
                        state = [0]
                    byy, bxx = divmod(n, nbw)
                    fn(br, act, coefs[ci][byy, bxx], Ss, Se, Al, state)

            pos = _find_scan_end(data, ent_start)
            continue
        pos += seglen
    return coefs


def jpeg_decode(data: bytes, color_transform: bool = True) -> np.ndarray:
    """JFIF bytes → uint8 (h, w) or (h, w, 3).

    Reads the full feature set PIL/libjpeg/javax.imageio emit: baseline
    sequential (SOF0) AND progressive (SOF2 — spectral selection +
    successive approximation, DC/AC first and refinement passes, EOB
    runs), 8-bit grayscale or YCbCr with ANY sampling factors (4:4:4,
    4:2:2, 4:2:0, 4:1:1, ...; MCU interleave per T.81 A.2.3), restart
    intervals (DRI/RSTn), chroma triangle upsampling matching libjpeg's
    decoder. Arithmetic coding and 12-bit remain typed gates.

    ``color_transform=False`` skips the YCbCr→RGB step for 3-component
    streams whose planes are already RGB (TIFF photometric=2 JPEG
    segments, e.g. GDAL's PHOTOMETRIC=RGB)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htrees: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, Hi, Vi, qtab)
    h = w = 0
    restart_interval = 0
    progressive = False
    prog_sos = 0
    scan_comps: list[tuple[int, int, int]] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # fill byte: only ONE byte consumed (T.81 B.1.1.2)
            pos -= 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qtabs)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, htrees)
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            p = 6
            for _ in range(nc):
                cid, samp, qid = seg[p], seg[p + 1], seg[p + 2]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad sampling factors {samp:#x}")
                comps.append((cid, hi, vi, qid))
                p += 3
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) huffman JPEG"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if progressive:
                prog_sos = pos - 2  # hand the whole scan loop over
                break
            nc = seg[0]
            p = 1
            for _ in range(nc):
                cid, tabs = seg[p], seg[p + 1]
                scan_comps.append((cid, tabs >> 4, tabs & 0xF))
                p += 2
            pos += seglen
            break
        pos += seglen
    if progressive:
        if not comps:
            raise ValueError("missing SOF2")
        coefs = _decode_progressive(
            data, prog_sos, comps, qtabs, htrees, h, w, restart_interval
        )
        planes = []
        for (_cid, hi, vi, qid), coef in zip(comps, coefs):
            q = qtabs[qid]
            nby, nbx = coef.shape[0], coef.shape[1]
            f = (
                (coef.reshape(-1, 64) * q)[:, _UNZZ]
                .reshape(-1, 8, 8)
                .astype(np.float64)
            )
            blocks = np.einsum("ij,njk,kl->nil", _T.T, f, _T) + 128.0
            planes.append(
                blocks.reshape(nby, nbx, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(nby * 8, nbx * 8)
            )
        ncomp = len(comps)
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        for _cid, hi, vi, _q in comps:
            if hmax % hi or vmax % vi:
                raise NotImplementedError(
                    f"non-integer chroma upsampling ({hi}x{vi} vs {hmax}x{vmax})"
                )
        out_planes = []
        for (_cid, hi, vi, _q), plane in zip(comps, planes):
            plane = _upsample_axis(plane, 0, vmax // vi)
            plane = _upsample_axis(plane, 1, hmax // hi)
            out_planes.append(plane[:h, :w])
        if ncomp == 1:
            return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        if ncomp == 3:
            stacked = np.stack(out_planes, axis=-1)
            rgb = _ycbcr_to_rgb(stacked) if color_transform else stacked
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        raise NotImplementedError(f"{ncomp}-component JPEG")
    if not comps or not scan_comps:
        raise ValueError("missing SOF0/SOS")
    if len(scan_comps) != len(comps):
        raise NotImplementedError("non-interleaved (multi-scan) sequential JPEG")

    ncomp = len(comps)
    if ncomp == 1:
        # single-component scans are non-interleaved: MCU = 1 block and
        # the SOF sampling factors do not apply (T.81 A.2.2)
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hi, vi, _q in comps:
        if hmax % hi or vmax % vi:
            raise NotImplementedError(
                f"non-integer chroma upsampling ({hi}x{vi} vs {hmax}x{vmax})"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data[pos:])
    planes = [
        np.zeros((mcuy * 8 * vi, mcux * 8 * hi)) for _cid, hi, vi, _q in comps
    ]
    prev_dc = [0] * ncomp
    idct_t = _T  # orthonormal DCT basis
    for n in range(mcuy * mcux):
        if restart_interval and n and n % restart_interval == 0:
            br.restart()
            prev_dc = [0] * ncomp
        my, mx = divmod(n, mcux)
        for ci in range(ncomp):
            _cid, dtab, atab = scan_comps[ci]
            dct = htrees[(0, dtab)]
            act = htrees[(1, atab)]
            _id, hi, vi, qid = comps[ci]
            q = qtabs[qid]
            for vy in range(vi):
                for vx in range(hi):
                    zz = _decode_block(br, dct, act)
                    prev_dc[ci] += int(zz[0])
                    zz[0] = prev_dc[ci]
                    f = (zz * q)[_UNZZ].reshape(8, 8).astype(np.float64)
                    block = idct_t.T @ f @ idct_t + 128.0
                    yy = (my * vi + vy) * 8
                    xx = (mx * hi + vx) * 8
                    planes[ci][yy : yy + 8, xx : xx + 8] = block
    out_planes = []
    for (_cid, hi, vi, _q), plane in zip(comps, planes):
        plane = _upsample_axis(plane, 0, vmax // vi)
        plane = _upsample_axis(plane, 1, hmax // hi)
        out_planes.append(plane[:h, :w])
    if ncomp == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if ncomp == 3:
        stacked = np.stack(out_planes, axis=-1)
        rgb = _ycbcr_to_rgb(stacked) if color_transform else stacked
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{ncomp}-component JPEG")
