"""Band layout conversion: sequential (one column per band) <->
interleaved (single BIP ``pixels`` column), per spec
/root/reference/format-specs/raquet.md:40-57 and :265-275.

Lossy codecs for the interleaved layout: JPEG uses PIL when importable
and otherwise falls back to the pure-numpy baseline codec in
``functions/jpeg.py`` (standard JFIF bytes either way; quality from
metadata ``compression_quality``, default 85 per spec). WebP is encoded
LOSSLESS (VP8L) by default: the from-scratch codec in
``functions/webp.py`` when PIL is absent, ``lossless=True`` through
Pillow when present — both produce standard VP8L bitstreams so tiles
written in either environment decode in the other. Lossy VP8 webp
(what the reference's Pillow path emits at a given quality,
raster2raquet.py:816) is a full video intra-frame codec and is
deliberately *native-delegated* rather than reimplemented: decode
order is Pillow -> system libwebp via ctypes
(``functions/webp_native.py`` — the same library Pillow wraps, so
reference-written lossy tiles decode identically) -> typed
NotImplementedError naming the split. Writing lossy VP8 is opt-in via
metadata ``webp_lossless: false`` and needs one of the same two
native backends.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from raquet_spark.functions.bands import decode_block, encode_block

LOSSY = ("jpeg", "webp")
# spec raquet.md:274-275: jpeg = grayscale or RGB; webp adds LA/RGBA
_PIL_MODES = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}


def _pil_image():
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def check_lossy_constraints(compression: str, band_types: list[str]) -> None:
    """Spec constraints for lossy compression (raquet.md:272-275):
    interleaved-only is enforced by the callers (the sequential writer
    never passes lossy); this checks dtype and band count."""
    if any(t != "uint8" for t in band_types):
        raise ValueError(f"{compression} requires uint8 bands (spec raquet.md:274)")
    n = len(band_types)
    if compression == "jpeg" and n not in (1, 3):
        raise ValueError(f"jpeg supports 1 or 3 bands, got {n} (spec raquet.md:274)")
    if compression == "webp" and not 1 <= n <= 4:
        raise ValueError(f"webp supports 1-4 bands, got {n} (spec raquet.md:275)")


def encode_lossy(
    inter: np.ndarray,
    n_bands: int,
    width: int,
    height: int,
    compression: str,
    quality: int = 85,
    webp_lossless: bool = True,
) -> bytes:
    """Pixel-interleaved uint8 array -> JPEG/WebP bytes. JPEG: PIL when
    available, else the pure-numpy baseline codec (functions/jpeg.py).
    WebP: lossless VP8L by default (PIL or the from-scratch codec);
    ``webp_lossless=False`` writes lossy VP8 at ``quality`` — the
    reference's Pillow default (raster2raquet.py:816) — via PIL or the
    system libwebp (functions/webp_native.py)."""
    arr = np.asarray(inter, dtype=np.uint8).reshape(height, width, n_bands)
    Image = _pil_image()
    if Image is not None:
        img = Image.fromarray(arr.squeeze(), mode=_PIL_MODES[n_bands])
        buf = io.BytesIO()
        if compression == "jpeg":
            # subsampling=0 (4:4:4) keeps chroma full-resolution; the
            # PIL-less decoder (functions/jpeg.py) reads any sampling
            # factors, so PIL-default 4:2:0 files also stay readable —
            # writing 4:4:4 is a quality choice, not a compat one
            img.save(buf, format="JPEG", quality=quality, subsampling=0)
        elif webp_lossless:
            # lossless VP8L keeps webp tiles readable in any
            # environment: the fallback codec (functions/webp.py)
            # reads VP8L without any native library
            img.save(buf, format="WEBP", lossless=True)
        else:
            img.save(buf, format="WEBP", lossless=False, quality=quality)
        return buf.getvalue()
    if compression == "jpeg":
        from raquet_spark.functions.jpeg import jpeg_encode

        return jpeg_encode(arr.squeeze(), quality=quality)
    if webp_lossless:
        from raquet_spark.functions.webp import vp8l_encode

        return vp8l_encode(arr)
    from raquet_spark.functions import webp_native

    if not webp_native.available():
        raise NotImplementedError(
            "lossy VP8 webp encode needs a native backend: install Pillow "
            "or a system libwebp shared library, or write the default "
            "lossless VP8L (functions/webp_native.py docstring)"
        )
    return webp_native.encode_lossy(arr, quality)


def decode_lossy(raw: bytes, compression: str, n_bands: int | None = None) -> np.ndarray:
    """JPEG/WebP bytes -> flat pixel-interleaved uint8 array.

    ``n_bands`` is required for webp: the VP8L stream always carries
    ARGB, so the original band layout (gray / gray+alpha / RGB / RGBA)
    must be re-sliced on decode."""
    Image = _pil_image()
    if Image is not None:
        img = Image.open(io.BytesIO(raw))
        if compression == "webp" and n_bands is not None:
            rgba = np.asarray(img.convert("RGBA"), dtype=np.uint8)
            if n_bands == 1:
                return rgba[..., 0].reshape(-1)
            if n_bands == 2:
                return rgba[..., [0, 3]].reshape(-1)
            return rgba[..., :n_bands].reshape(-1)
        return np.asarray(img, dtype=np.uint8).reshape(-1)
    if compression == "jpeg":
        from raquet_spark.functions.jpeg import jpeg_decode

        return jpeg_decode(raw).reshape(-1)
    from raquet_spark.functions.webp import webp_decode_bands

    try:
        return webp_decode_bands(raw, n_bands if n_bands else 4).reshape(-1)
    except NotImplementedError as exc:
        # lossy VP8 chunk: delegate to the system libwebp (the library
        # Pillow itself wraps) when present; else the typed split error
        from raquet_spark.functions import webp_native

        if not webp_native.available():
            raise NotImplementedError(
                "lossy VP8 webp decode needs a native backend: install "
                "Pillow or a system libwebp shared library (the "
                "from-scratch codec covers lossless VP8L only; "
                "functions/webp_native.py docstring)"
            ) from exc
        rgba = webp_native.decode_rgba(raw)
        nb = n_bands if n_bands else 4
        if nb == 1:
            return rgba[..., 0].reshape(-1)
        if nb == 2:
            return rgba[..., [0, 3]].reshape(-1)
        return rgba[..., :nb].reshape(-1)


def _check_compression(compression: str | None, band_types: list[str]) -> None:
    if compression in LOSSY:
        check_lossy_constraints(compression, band_types)


def to_interleaved(df: DataFrame, metadata: dict, compression: str | None = "gzip") -> tuple[DataFrame, dict]:
    """Sequential band columns -> single BIP ``pixels`` column."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    bands = [(b["name"], b["type"]) for b in metadata["bands"]]
    _check_compression(compression, [t for _, t in bands])
    btype = bands[0][1]
    if any(t != btype for _, t in bands):
        raise ValueError("interleaved layout requires uniform band type")
    bw = metadata["tiling"]["block_width"]
    bh = metadata["tiling"]["block_height"]
    quality = int(metadata.get("compression_quality", 85))
    webp_lossless = bool(metadata.get("webp_lossless", True))
    n_bands = len(bands)

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for row in pdf.to_dict("records"):
                arrs = [decode_block(row[name], t) for name, t in bands]
                # BIP: [b1_0, b2_0, ..., b1_1, b2_1, ...]
                inter = np.stack(arrs, axis=1).reshape(-1)
                if compression in LOSSY:
                    pixels.append(
                        encode_lossy(
                            inter, n_bands, bw, bh, compression, quality,
                            webp_lossless=webp_lossless,
                        )
                    )
                else:
                    pixels.append(encode_block(inter, btype, compression))
            yield pd.DataFrame({"block": pdf["block"], "pixels": pixels})

    out = df.mapInPandas(conv, schema="block bigint, pixels binary")
    meta = dict(metadata, band_layout="interleaved", compression=compression)
    return out, meta


def to_sequential(df: DataFrame, metadata: dict, compression: str | None = "gzip") -> tuple[DataFrame, dict]:
    """Interleaved ``pixels`` column -> one column per band."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    src_comp = metadata.get("compression")
    bands = [(b["name"], b["type"]) for b in metadata["bands"]]
    btype = bands[0][1]
    n = len(bands)

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {name: [] for name, _ in bands}
            for row in pdf.to_dict("records"):
                if src_comp in LOSSY:
                    inter = decode_lossy(bytes(row["pixels"]), src_comp, n).reshape(-1, n)
                else:
                    inter = decode_block(row["pixels"], btype).reshape(-1, n)
                for i, (name, _) in enumerate(bands):
                    cols[name].append(encode_block(inter[:, i], btype, compression))
            out = {"block": pdf["block"]}
            out.update(cols)
            yield pd.DataFrame(out)

    schema = "block bigint, " + ", ".join(f"{name} binary" for name, _ in bands)
    out = df.mapInPandas(conv, schema=schema)
    meta = dict(metadata, band_layout="sequential", compression=compression)
    return out, meta
