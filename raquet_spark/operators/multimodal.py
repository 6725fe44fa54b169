"""Multimodal binary columns: images/audio/video as opaque ``binary``
plus typed metadata, with Arrow-batched decode / feature-extract /
resize / frame-sample plumbing.

The container has no image/audio libraries, so every codec is either
from-scratch or deterministic-fake behind ``CODECS`` — the Spark-side
contract (schema, partitioning, UDF signatures, batch shapes) is the
same either way: swap a codec entry for a PIL/ffmpeg implementation
and nothing else changes. ``jpeg`` (functions/jpeg.py), ``png``
(functions/png.py), ``mjpeg`` video (functions/avi.py) and ``wav``
(below) are REAL standard-bitstream codecs; the ``fake`` entry stays
for plumbing tests and the data generator.

Fake codec format (deterministic, self-describing, used by tests and
the data generator): ``b"FAKEIMG1" + uint16 width + uint16 height +
uint8 channels + payload`` where payload[i] = (i * 37 + seed) % 251.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FAKEIMG1"

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int, "
    "channels int, duration_ms int"
)


def encode_fake_image(width: int, height: int, channels: int, seed: int = 0) -> bytes:
    n = width * height * channels
    payload = ((np.arange(n, dtype=np.int64) * 37 + seed) % 251).astype("u1").tobytes()
    return MAGIC + struct.pack("<HHB", width, height, channels) + payload


def decode_fake_image(buf: bytes) -> np.ndarray:
    if buf[:8] != MAGIC:
        raise ValueError("not a FAKEIMG1 payload")
    w, h, c = struct.unpack("<HHB", buf[8:13])
    arr = np.frombuffer(buf[13 : 13 + w * h * c], dtype="u1")
    return arr.reshape(h, w, c)


def _real_codec_stub(name: str) -> Callable:
    def stub(*_a, **_k):
        raise NotImplementedError(
            f"{name} codec requires an image/audio library not present in this "
            "container; register one in multimodal.CODECS"
        )

    return stub


CODECS: dict[str, dict[str, Callable]] = {
    "fake": {"decode": decode_fake_image, "encode": encode_fake_image},
    "jpeg": {"decode": _real_codec_stub("jpeg"), "encode": _real_codec_stub("jpeg")},
    "png": {"decode": _real_codec_stub("png"), "encode": _real_codec_stub("png")},
    "wav": {"decode": _real_codec_stub("wav"), "encode": _real_codec_stub("wav")},
}


def make_media_table(spark, n: int = 64, kind: str = "image", codec: str = "png") -> DataFrame:
    """Deterministic media table for tests/benchmarks."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = CODECS[codec]["encode"]
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            w = 32 + (ids % 4) * 16
            h = 32 + ((ids * 3) % 4) * 16
            yield pd.DataFrame({
                "media_id": ids,
                "kind": kind,
                "payload": [
                    enc(int(wi), int(hi), 3, seed=int(i)) for i, wi, hi in zip(ids, w, h)
                ],
                "width": w.astype("int32"),
                "height": h.astype("int32"),
                "channels": 3,
                "duration_ms": 0,
            })

    n_parts = max(1, min(n // 16, spark.sparkContext.defaultParallelism))
    return spark.range(n, numPartitions=n_parts).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(df: DataFrame, codec: str = "png") -> DataFrame:
    """Decode each payload and emit simple per-channel statistics —
    the shape of any real feature extractor (CLIP embedding, mel
    spectrogram): binary in, fixed-width vector out, one Arrow batch at
    a time."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    dec = CODECS[codec]["decode"]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = dec(bytes(payload))
                rows.append({
                    "media_id": mid,
                    "mean_rgb": [float(img[:, :, c].mean()) for c in range(img.shape[2])],
                    "std_rgb": [float(img[:, :, c].std()) for c in range(img.shape[2])],
                    "aspect": float(img.shape[1] / img.shape[0]),
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        feats,
        schema="media_id bigint, mean_rgb array<double>, std_rgb array<double>, aspect double",
    )


def _image_reencoder(codec: str):
    """pixel array → payload bytes in ``codec``'s container, so resized
    output stays consumable by every downstream operator taking the
    same codec."""
    if codec == "png":
        from raquet_spark.functions.png import png_encode

        return png_encode
    if codec == "jpeg":
        from raquet_spark.functions.jpeg import jpeg_encode

        return lambda arr: jpeg_encode(
            arr[:, :, 0] if arr.shape[2] == 1 else arr, 90
        )
    if codec == "fake":
        return lambda arr: (
            MAGIC
            + struct.pack("<HHB", arr.shape[1], arr.shape[0], arr.shape[2])
            + arr.tobytes()
        )
    raise ValueError(f"no image re-encoder for codec {codec!r}")


def resize_images(df: DataFrame, out_w: int, out_h: int, codec: str = "png") -> DataFrame:
    """Nearest-neighbor resize, payload→payload in the SAME codec
    (PNG default — the real from-scratch codec; PIL is absent here)."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    dec, enc = CODECS[codec]["decode"], _image_reencoder(codec)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                img = dec(bytes(payload))
                h, w, c = img.shape
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                small = np.ascontiguousarray(img[np.ix_(yi, xi)])
                out.append(enc(small))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": out,
                "width": out_w,
                "height": out_h,
            })

    return df.mapInPandas(
        resize, schema="media_id bigint, payload binary, width int, height int"
    )


def sample_frames(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling contract for video: one row in, N frame rows out
    (here: synthetic frame indices, since no video codec exists in the
    container — the explode shape is what matters)."""
    frames = F.expr(f"sequence(0, greatest(CAST(duration_ms / 1000 AS INT), 1) - 1, {every_nth})")
    return df.select("media_id", F.explode(frames).alias("frame_idx"))


def encode_jpeg_image(width: int, height: int, channels: int, seed: int = 0) -> bytes:
    """Deterministic test image compressed with the real baseline JPEG
    codec (functions/jpeg.py — PIL-free), 1 or 3 channels."""
    from raquet_spark.functions.jpeg import jpeg_encode

    n = width * height * channels
    arr = ((np.arange(n, dtype=np.int64) * 37 + seed) % 251).astype("u1")
    arr = arr.reshape(height, width, channels)
    return jpeg_encode(arr[:, :, 0] if channels == 1 else arr[:, :, :3], 90)


def decode_jpeg_image(buf: bytes) -> np.ndarray:
    from raquet_spark.functions.jpeg import jpeg_decode

    arr = jpeg_decode(bytes(buf))
    return arr[:, :, None] if arr.ndim == 2 else arr


CODECS["jpeg"] = {"decode": decode_jpeg_image, "encode": encode_jpeg_image}


def encode_png_image(width: int, height: int, channels: int, seed: int = 0) -> bytes:
    """Deterministic test image through the real from-scratch PNG codec
    (functions/png.py — stdlib zlib + numpy, lossless any channels)."""
    from raquet_spark.functions.png import png_encode

    n = width * height * channels
    arr = ((np.arange(n, dtype=np.int64) * 37 + seed) % 251).astype("u1")
    return png_encode(arr.reshape(height, width, channels))


def decode_png_image(buf: bytes) -> np.ndarray:
    from raquet_spark.functions.png import png_decode

    arr = png_decode(bytes(buf))
    return arr[:, :, None] if arr.ndim == 2 else arr


CODECS["png"] = {"decode": decode_png_image, "encode": encode_png_image}


def encode_mjpeg_video(
    width: int, height: int, channels: int, seed: int = 0,
    n_frames: int = 6, fps: int = 4,
) -> bytes:
    """Deterministic test video through the real MJPEG/AVI container
    (functions/avi.py + functions/jpeg.py): frame f is the seeded base
    image rolled 3f pixels horizontally."""
    from raquet_spark.functions.avi import mjpeg_encode

    n = width * height * channels
    base = ((np.arange(n, dtype=np.int64) * 37 + seed) % 251).astype("u1")
    base = base.reshape(height, width, channels)
    frames = np.stack([np.roll(base, 3 * f, axis=1) for f in range(n_frames)])
    return mjpeg_encode(frames, fps=fps)


def decode_mjpeg_video(buf: bytes) -> np.ndarray:
    """MJPEG AVI bytes -> (n_frames, H, W, C) uint8."""
    from raquet_spark.functions.avi import mjpeg_decode

    return mjpeg_decode(bytes(buf))


CODECS["mjpeg"] = {"decode": decode_mjpeg_video, "encode": encode_mjpeg_video}


def sample_frames_decoded(
    df: DataFrame, every_nth: int = 2, codec: str = "mjpeg"
) -> DataFrame:
    """REAL frame sampling: one video row in, one row per sampled frame
    out, each frame decoded from the container and re-encoded lossless
    as PNG — so downstream image operators (``phash_table`` /
    ``extract_features`` with ``codec='png'``) consume frame rows
    unchanged. The synthetic-index :func:`sample_frames` stays for
    plumbing tests; this is the production shape (frame-level dedup of
    a video corpus)."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    dec = CODECS[codec]["decode"]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raquet_spark.functions.png import png_encode

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "payload": [],
                "width": [], "height": [], "channels": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = dec(bytes(payload))
                for fi in range(0, len(frames), every_nth):
                    f = frames[fi]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fi)
                    out["payload"].append(png_encode(f))
                    out["height"].append(f.shape[0])
                    out["width"].append(f.shape[1])
                    out["channels"].append(f.shape[2])
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        sample,
        "media_id bigint, frame_idx int, payload binary, "
        "width int, height int, channels int",
    )


_DCT32 = None


def _dct32() -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        t = np.zeros((32, 32))
        for u in range(32):
            for x in range(32):
                t[u, x] = np.cos((2 * x + 1) * u * np.pi / 64.0)
        t[0, :] *= np.sqrt(1.0 / 32.0)
        t[1:, :] *= np.sqrt(2.0 / 32.0)
        _DCT32 = t
    return _DCT32


def phash_table(df: DataFrame, codec: str = "png", hash_size: int = 8) -> DataFrame:
    """Perceptual hash per image (the classic pHash recipe, public):
    grayscale → area-resample to 32×32 → 2-D DCT → sign-vs-median of
    the top-left ``hash_size``² low-frequency block, packed row-major
    into one BIGINT. Arrow-batched; the DCT is one matmul per image."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    dec = CODECS[codec]["decode"]

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = _dct32()
        weights = 1 << np.arange(hash_size * hash_size, dtype=np.uint64)
        for pdf in batches:
            ids, out = [], []
            for row in pdf.to_dict("records"):
                img = dec(bytes(row["payload"])).astype("f8").mean(axis=2)
                h, w = img.shape
                # area resample to 32x32 (pad to a multiple, then mean)
                ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
                img = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
                img = img.reshape(32, ph // 32, 32, pw // 32).mean(axis=(1, 3))
                d = t @ img @ t.T
                low = d[:hash_size, :hash_size].ravel()
                bits = (low > np.median(low)).astype(np.uint64)
                ids.append(int(row["media_id"]))
                out.append(int((bits * weights).sum().astype(np.int64)))
            yield pd.DataFrame({"media_id": ids, "phash": out})

    return df.select("media_id", "payload").mapInPandas(
        hashes, schema="media_id bigint, phash bigint"
    )


def phash_dedup_pairs(
    hashes: DataFrame,
    max_distance: int = 3,
    n_bands: int = 4,
    id_col: str = "media_id",
    collapse_identical: bool = False,
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs by pHash hamming distance: the 64-bit
    hash splits into ``n_bands`` 16-bit segments — two hashes within
    hamming ``n_bands - 1`` MUST share at least one exact segment
    (pigeonhole, the SimHash trick) — so candidates come from one
    banded self equi-join and the exact ``bit_count(xor)`` check runs
    only on candidates. Never all-pairs.

    ``collapse_identical=True``: the family-wide r16 duplicate
    collapse — byte-identical images share the pHash, so a k-copy
    group emits k−1 (rep, member, distance=0) star edges instead of
    k(k−1)/2 banded pairs, and the segment join runs over one
    representative per distinct hash. Exact for component-shaped
    consumers (identical hash ⇒ identical segments ⇒ identical
    collision sets); use False when the complete pairwise listing is
    the product.

    ``max_bucket_rows`` (r16, the minhash chain-cap applied to the
    segment join): segment buckets over the cap emit id-rank-adjacent
    chain candidates (k−1 rows) instead of k(k−1)/2; the distance
    verify still filters each chain edge. Connectivity-preserving,
    lossy for the complete listing; opt-in.

    Compute-once (r17, guide §8): the banded candidate join is a SELF
    join, so without a barrier the whole upstream pipeline — media
    decode + DCT in :func:`phash_table` — executes once per side (the
    r17 before-plan shows the subtree twice; there is no Exchange for
    AQE to reuse, the gather side broadcasts). The tiny (id, phash)
    proxy table is eagerly ``localCheckpoint``ed — ONE materializing
    job runs the decode exactly once at any corpus size, both join
    sides then scan the checkpointed 16-byte rows, and the pair
    build itself stays lazy (no cache to leak, no second
    checkpoint job — cheaper at job-floor scale than the
    persist→build→unpersist recipe, measured interleaved).

    Retention (ADVICE r17): the checkpointed (id, phash) blocks live
    until the returned DataFrame is garbage-collected on the driver —
    there is no explicit unpersist because the caller consumes the
    result lazily. A long session issuing MANY phash_dedup_pairs
    calls accumulates one tiny proxy table (16 bytes/image + ids) per
    LIVE result; drop references to release the blocks."""
    ph = hashes.select(id_col, "phash").localCheckpoint(eager=True)
    if collapse_identical:
        from raquet_spark.operators.dedup import (
            collapse_identical_signatures,
        )

        _, reps, star = collapse_identical_signatures(ph, id_col)
        star = star.withColumn("distance", F.lit(0).cast("int"))
        return _phash_banded_pairs(
            reps, max_distance, n_bands, id_col, max_bucket_rows
        ).unionByName(star)
    return _phash_banded_pairs(
        ph, max_distance, n_bands, id_col, max_bucket_rows
    )


def _phash_banded_pairs(
    sigs: DataFrame,
    max_distance: int,
    n_bands: int,
    id_col: str,
    max_bucket_rows: int | None,
) -> DataFrame:
    """Banded self-join body of :func:`phash_dedup_pairs`; expects an
    input that is cheap to scan twice (persisted (id, phash) rows)."""
    hashes = sigs
    seg_bits = 64 // n_bands
    mask = (1 << seg_bits) - 1
    segs = hashes.select(
        id_col,
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.expr(f"(phash >> {i * seg_bits}) & {mask}").alias("seg"),
                )
                for i in range(n_bands)
            ])
        ).alias("b"),
    ).select(id_col, "phash", "b.band", "b.seg")
    chain = None
    if max_bucket_rows is not None:
        from raquet_spark.operators.dedup import chain_capped_buckets

        segs, chain = chain_capped_buckets(
            segs, ["band", "seg"], id_col, max_bucket_rows,
            carry_cols=["phash"],
        )
        chain = chain.select(
            "id_a", "id_b",
            F.col("_prev_phash").alias("ph_a"),
            F.col("phash").alias("ph_b"),
        )
    a, b = segs.alias("a"), segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
    )
    if chain is not None:
        cand = cand.unionByName(chain)
    return cand.distinct().withColumn(
        "distance", F.expr("bit_count(ph_a ^ ph_b)")
    ).where(F.col("distance") <= max_distance).select("id_a", "id_b", "distance")


def encode_wav_audio(width: int, height: int, channels: int, seed: int = 0) -> bytes:
    """Deterministic PCM16 WAV payload via the stdlib ``wave`` module —
    the media-table generator signature reuses (width*height) as the
    sample count so audio rows flow through the same plumbing."""
    import io
    import wave

    n = max(1, width * height)
    t = np.arange(n, dtype=np.float64)
    freq = 220.0 * (1 + (seed % 12) / 12.0)
    sig = (np.sin(2 * np.pi * freq * t / 16000.0) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(max(1, channels))
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.repeat(sig, max(1, channels)).tobytes())
    return buf.getvalue()


def decode_wav_audio(buf: bytes) -> np.ndarray:
    """WAV bytes → (n_frames, channels, 1) int-PCM array (shaped like an
    image so the shared feature extractor works unchanged)."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(buf)), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    dt = {1: "u1", 2: "<i2", 4: "<i4"}[sw]
    arr = np.frombuffer(frames, dtype=dt).astype("f8")
    if sw == 1:
        # 8-bit WAV PCM is unsigned with a 128 midpoint; recenter so
        # rms/zcr (signbit-based) see a zero-mean signal like the
        # signed widths do
        arr = arr - 128.0
    return arr.reshape(-1, nch)[:, :, None].transpose(0, 2, 1)


CODECS["wav"] = {"decode": decode_wav_audio, "encode": encode_wav_audio}


def audio_features(df: DataFrame, codec: str = "wav") -> DataFrame:
    """Per-clip audio descriptors: duration, RMS level, zero-crossing
    rate — the audio analogue of extract_features, Arrow-batched."""
    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    dec = CODECS[codec]["decode"]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "rms": [], "zcr": []}
            for row in pdf.to_dict("records"):
                a = dec(bytes(row["payload"]))[:, 0, 0]
                out["media_id"].append(int(row["media_id"]))
                out["n_samples"].append(len(a))
                out["rms"].append(float(np.sqrt(np.mean(a**2))) if len(a) else 0.0)
                out["zcr"].append(
                    float(np.mean(np.signbit(a[:-1]) != np.signbit(a[1:])))
                    if len(a) > 1 else 0.0
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        feats, schema="media_id bigint, n_samples bigint, rms double, zcr double"
    )


def audio_resample(
    df: DataFrame, target_rate: int, codec: str = "wav"
) -> DataFrame:
    """Sample-rate conversion for the audio column — the normalization
    step a training pipeline runs before featurization (every clip to
    ONE rate): per-channel linear interpolation, PCM16 WAV out,
    Arrow-batched over ``mapInPandas`` like :func:`resize_images`.
    Linear interpolation is the deterministic dependency-free baseline;
    a windowed-sinc kernel drops in per-clip without changing the
    plumbing. Exact on integer decimation grid points (``np.interp``
    hits source samples)."""
    import io
    import wave

    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    if target_rate <= 0:
        raise ValueError(f"target_rate {target_rate}")

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    sr, nch = w.getframerate(), w.getnchannels()
                    sw = w.getsampwidth()
                    raw = w.readframes(w.getnframes())
                dt = {1: "u1", 2: "<i2", 4: "<i4"}[sw]
                sig = (
                    np.frombuffer(raw, dtype=dt).astype("f8").reshape(-1, nch)
                )
                # normalize every bit depth to PCM16 full scale BEFORE
                # the int16 write: u8 is offset-binary (shift then gain
                # 256), i32 scales down by 2^16 — without this, 32-bit
                # input hard-clips to garbage and 8-bit comes out at
                # 1/256 amplitude
                if sw == 1:
                    sig = (sig - 128.0) * 256.0
                elif sw == 4:
                    sig = sig / 65536.0
                n = len(sig)
                m = max(1, int(round(n * target_rate / sr)))
                src = np.arange(n, dtype="f8")
                pos = np.minimum(
                    np.arange(m, dtype="f8") * (sr / target_rate),
                    max(0, n - 1),
                )
                res = np.empty((m, nch))
                for c in range(nch):
                    res[:, c] = np.interp(pos, src, sig[:, c])
                pcm = np.clip(np.round(res), -32768, 32767).astype("<i2")
                b = io.BytesIO()
                with wave.open(b, "wb") as wv:
                    wv.setnchannels(nch)
                    wv.setsampwidth(2)
                    wv.setframerate(target_rate)
                    wv.writeframes(pcm.tobytes())
                payloads.append(b.getvalue())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
                "sample_rate": target_rate,
            })

    return df.select("media_id", "payload").mapInPandas(
        rs, schema="media_id bigint, payload binary, sample_rate int"
    )


def audio_spectrogram(
    df: DataFrame, n_fft: int = 256, hop: int = 128
) -> DataFrame:
    """Per-clip spectral descriptors from a framed magnitude
    spectrogram: Hann-windowed numpy rFFT over ``n_fft``-sample frames
    at ``hop`` stride — the front half of any mel/feature pipeline,
    Arrow-batched (one clip's frames = one matmul-sized FFT batch).
    Emits frame count, dominant frequency (peak of the summed
    spectrum) and spectral centroid in Hz, using each WAV's own sample
    rate."""
    import io
    import wave

    from raquet_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(n_fft)
        freqs_unit = np.arange(n_fft // 2 + 1) / n_fft  # cycles/sample
        for pdf in batches:
            out = {"media_id": [], "n_frames": [], "peak_hz": [],
                   "centroid_hz": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    sr = w.getframerate()
                    nch = w.getnchannels()
                    sw = w.getsampwidth()
                    raw = w.readframes(w.getnframes())
                # same width handling as decode_wav_audio: 8-bit PCM is
                # unsigned around 128, 16/32-bit are signed LE
                dt = {1: "u1", 2: "<i2", 4: "<i4"}[sw]
                sig = np.frombuffer(raw, dtype=dt).astype("f8")
                if sw == 1:
                    sig = sig - 128.0
                sig = sig.reshape(-1, nch)[:, 0]  # first channel
                n_frames = max(0, 1 + (len(sig) - n_fft) // hop)
                if n_frames == 0:
                    frames = np.zeros((1, n_fft))
                    n_frames_out = 0
                else:
                    idx = (np.arange(n_frames)[:, None] * hop
                           + np.arange(n_fft)[None, :])
                    frames = sig[idx] * win
                    n_frames_out = n_frames
                mag = np.abs(np.fft.rfft(frames, axis=1))
                spectrum = mag.sum(axis=0)
                total = spectrum.sum()
                peak = float(freqs_unit[int(spectrum.argmax())] * sr)
                cent = float(
                    (freqs_unit * spectrum).sum() / total * sr
                ) if total > 0 else 0.0
                out["media_id"].append(int(mid))
                out["n_frames"].append(int(n_frames_out))
                out["peak_hz"].append(peak)
                out["centroid_hz"].append(cent)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        feats,
        "media_id bigint, n_frames bigint, peak_hz double, centroid_hz double",
    )
