"""Native libwebp binding (ctypes, no pip packages) for lossy VP8 WebP.

The reference writes WebP tiles through Pillow's default path, which is
*lossy VP8* at a quality factor (reference raster2raquet.py:816), and
Pillow itself is a thin wrapper over libwebp. The from-scratch codec in
``functions/webp.py`` covers the VP8L *lossless* bitstream end to end,
but lossy VP8 is a full video intra-frame codec (boolean coder, 4x4
DCT, intra prediction, loop filter) whose ~3 KB of entropy tables make
a from-spec reimplementation a poor risk/benefit trade — so lossy VP8
is deliberately delegated to a *native* decoder: Pillow when
importable, else the system ``libwebp`` shared library via ctypes
(present on most images that ship any imaging stack — it is the same
code Pillow calls). When neither is present, decoding a lossy-VP8 tile
raises the typed :class:`NotImplementedError` in
``operators/layout.py`` naming this split.

The binding doubles as an independent conformance oracle for the
from-scratch VP8L codec: tests round-trip our encoder's bytes through
libwebp's decoder (and libwebp's lossless encoder — which emits
meta-huffman groups, color-cache hits and LZ77 backrefs — through our
decoder) for bit-exact pixel equality.

API (all raise :class:`RuntimeError` if the library is unavailable;
call :func:`available` first):

- :func:`decode_rgba` — WebP bytes (VP8 or VP8L) -> (H, W, 4) uint8
- :func:`encode_lossy` — (H, W, C) uint8 -> lossy VP8 WebP bytes
- :func:`encode_lossless` — (H, W, C) uint8 -> lossless VP8L bytes
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB: ctypes.CDLL | None = None
_TRIED = False

# find_library needs gcc/ldconfig machinery that containers often lack,
# so fall back to conventional sonames per platform
_CANDIDATES = (
    "libwebp.so.7",
    "libwebp.so.6",
    "libwebp.so",
    "libwebp.7.dylib",
    "libwebp.dylib",
    "libwebp.dll",
)


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = []
    found = ctypes.util.find_library("webp")
    if found:
        names.append(found)
    names.extend(_CANDIDATES)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            _configure(lib)
        except AttributeError:
            continue  # too old to have the simple API
        _LIB = lib
        break
    return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.restype = u8p
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    for enc in ("WebPEncodeRGB", "WebPEncodeRGBA"):
        fn = getattr(lib, enc)
        fn.restype = ctypes.c_size_t
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(u8p),
        ]
    for enc in ("WebPEncodeLosslessRGB", "WebPEncodeLosslessRGBA"):
        fn = getattr(lib, enc)
        fn.restype = ctypes.c_size_t
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(u8p),
        ]
    # WebPFree exists from 0.5; older libs free with stdlib free, which
    # we avoid by requiring it in _configure (AttributeError -> skip)
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]


def available() -> bool:
    """True when a usable system libwebp was found."""
    return _load() is not None


def _lib() -> ctypes.CDLL:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "no system libwebp shared library found (tried "
            + ", ".join(_CANDIDATES)
            + ")"
        )
    return lib


def decode_rgba(buf: bytes) -> np.ndarray:
    """WebP bytes (lossy VP8 or lossless VP8L) -> (H, W, 4) uint8 RGBA."""
    lib = _lib()
    w = ctypes.c_int()
    h = ctypes.c_int()
    data = bytes(buf)
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp could not decode the WebP payload")
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return arr.reshape(h.value, w.value, 4)


def _to_rgb_or_rgba(arr: np.ndarray) -> tuple[np.ndarray, bool]:
    """Expand 1/2-band (gray / gray+alpha) to 3/4 channels; return
    (array, has_alpha). libwebp's simple API takes RGB or RGBA only."""
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    c = arr.shape[2]
    if c == 1:
        return np.repeat(arr, 3, axis=2), False
    if c == 2:
        rgb = np.repeat(arr[:, :, :1], 3, axis=2)
        return np.concatenate([rgb, arr[:, :, 1:2]], axis=2), True
    if c == 3:
        return arr, False
    if c == 4:
        return arr, True
    raise ValueError(f"expected 1-4 channels, got {c}")


def _encode(arr: np.ndarray, quality: float | None) -> bytes:
    lib = _lib()
    px, has_alpha = _to_rgb_or_rgba(arr)
    h, w, c = px.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    data = px.tobytes()
    if quality is None:
        fn = lib.WebPEncodeLosslessRGBA if has_alpha else lib.WebPEncodeLosslessRGB
        size = fn(data, w, h, w * c, ctypes.byref(out))
    else:
        fn = lib.WebPEncodeRGBA if has_alpha else lib.WebPEncodeRGB
        size = fn(data, w, h, w * c, ctypes.c_float(quality), ctypes.byref(out))
    if size == 0 or not out:
        raise ValueError("libwebp encode failed")
    try:
        buf = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return buf


def encode_lossy(arr: np.ndarray, quality: float = 85.0) -> bytes:
    """(H, W, 1..4) uint8 -> lossy VP8 WebP bytes — the same bitstream
    family Pillow's default ``img.save(format='WEBP', quality=q)``
    writes (reference raster2raquet.py:816)."""
    return _encode(arr, float(quality))


def encode_lossless(arr: np.ndarray) -> bytes:
    """(H, W, 1..4) uint8 -> lossless VP8L WebP bytes via libwebp (an
    independent external encoder for conformance-testing the
    from-scratch decoder in ``functions/webp.py``)."""
    return _encode(arr, None)
