"""CLI surface (mirrors reference raquet/cli.py commands)."""

from __future__ import annotations

import pytest

from raquet_spark.cli import main


@pytest.mark.slow
def test_cli_roundtrip(spark, tmp_path, capsys):
    raq = str(tmp_path / "r.parquet")
    assert main(["generate", raq, "--tiles", "2", "--block-size", "16",
                 "--stats"]) == 0
    assert main(["inspect", raq]) == 0
    out = capsys.readouterr().out
    assert '"num_tiles": 4' in out

    assert main(["validate", raq]) == 0
    assert "VALID" in capsys.readouterr().out

    assert main(["split-zoom", raq, str(tmp_path / "sz")]) == 0
    assert main(["partition", raq, str(tmp_path / "part")]) == 0
    assert main(["export", raq, str(tmp_path / "px"), "--lonlat"]) == 0

    px = spark.read.parquet(str(tmp_path / "px"))
    assert px.count() == 4 * 16 * 16
    assert {"gx", "gy", "band_1", "lon", "lat"} <= set(px.columns)


def test_cli_convert(spark, tmp_path, capsys):
    raq = str(tmp_path / "src.parquet")
    assert main(["generate", raq, "--tiles", "2", "--block-size", "16"]) == 0
    px_dir = str(tmp_path / "px")
    assert main(["export", raq, px_dir]) == 0
    out = str(tmp_path / "conv.parquet")
    assert main(["convert", px_dir, out, "--zoom", "6", "--block-size", "16",
                 "--stats"]) == 0
    capsys.readouterr()

    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata

    meta = read_raquet_metadata(spark, out)
    assert meta["tiling"]["num_blocks"] == 4
    back = read_raquet(spark, out)
    assert back.count() == 4
    assert "band_1_mean" in back.columns


def test_cli_pyramid_and_inspect_stats(spark, tmp_path, capsys):
    import json

    raq = str(tmp_path / "base.parquet")
    assert main(["generate", raq, "--tiles", "4", "--block-size", "16",
                 "--zoom", "6", "--stats"]) == 0
    pyr = str(tmp_path / "pyr.parquet")
    assert main(["pyramid", raq, pyr, "--min-zoom", "4",
                 "--resampling", "cubic"]) == 0
    capsys.readouterr()
    assert main(["inspect", pyr]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["tiles_per_zoom"] == {"4": 1, "5": 4, "6": 16}

    assert main(["inspect", raq, "--stats"]) == 0
    out2 = json.loads(capsys.readouterr().out)
    assert "band_1_min" in out2["global_stats"]

    assert main(["validate", pyr, "--json"]) == 0
    v = json.loads(capsys.readouterr().out)
    assert v["valid"] is True and v["num_blocks"] == 21


def test_cli_export_zoom_and_bands(spark, tmp_path, capsys):
    raq = str(tmp_path / "mb.parquet")
    assert main(["generate", raq, "--tiles", "2", "--block-size", "16",
                 "--zoom", "6", "--bands", "2", "--min-zoom", "5"]) == 0
    px_dir = str(tmp_path / "px")
    assert main(["export", raq, px_dir, "--zoom", "5",
                 "--select-bands", "band_2"]) == 0
    capsys.readouterr()
    px = spark.read.parquet(px_dir)
    assert px.count() == 16 * 16  # one overview tile
    assert set(px.columns) == {"gx", "gy", "band_2"}

    tif = str(tmp_path / "b2.tif")
    assert main(["export", raq, tif, "--select-bands", "band_2"]) == 0
    from raquet_spark.sources.geotiff import read_geotiff

    arr, _ = read_geotiff(tif)
    assert arr.shape == (32, 32, 1)


def test_cli_fetch_xyz(monkeypatch, spark, tmp_path, capsys):
    import numpy as np

    import raquet_spark.sources.remote as remote

    size = 8

    def fake_http(timeout=30.0):
        def get(url, params):
            z, x, y = (int(p) for p in url.split("://")[1].split("/"))
            return (np.full(size * size, x + y, dtype="<f4")).tobytes()

        return get

    monkeypatch.setattr(remote, "http_transport", fake_http)
    out = str(tmp_path / "fetched.parquet")
    assert main(["fetch", "fake://{z}/{x}/{y}", out,
                 "--bbox=-90,45,-46,60", "--zoom", "4",
                 "--block-size", str(size)]) == 0
    capsys.readouterr()
    from raquet_spark.sources.raquet import read_raquet

    assert read_raquet(spark, out).count() == 4


def test_cli_dem(spark, tmp_path, capsys):
    import numpy as np

    from raquet_spark.functions.bands import decode_block
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata

    raq = str(tmp_path / "dem_src.parquet")
    assert main(["generate", raq, "--tiles", "2", "--block-size", "16"]) == 0
    out = str(tmp_path / "slope.parquet")
    assert main(["dem", raq, out, "--op", "slope", "--cellsize", "1.0"]) == 0
    assert "slope(band_1)" in capsys.readouterr().out

    meta = read_raquet_metadata(spark, out)
    assert meta["bands"][0]["type"] == "float64"
    assert meta["bands"][0]["nodata"] == "NaN"
    rows = read_raquet(spark, out).collect()
    assert len(rows) == 4
    vals = np.concatenate(
        [decode_block(r["band_1"], "float64") for r in rows]
    )
    finite = vals[~np.isnan(vals)]
    assert len(finite) > 0 and np.isfinite(finite).all()


def test_cli_dedup_and_pack(spark, tmp_path, capsys):
    import pandas as pd

    words = lambda a, b: " ".join(f"w{i}" for i in range(a, b))  # noqa: E731
    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [words(0, 40), words(0, 40), words(100, 140),
                 "x0 x1 x2 " + words(5, 30)],
    })).write.parquet(docs)

    out_e = str(tmp_path / "exact.parquet")
    assert main(["dedup", docs, out_e, "--method", "exact"]) == 0
    assert "4 -> 3 docs" in capsys.readouterr().out  # doc 2 == doc 1

    out_s = str(tmp_path / "sub.parquet")
    assert main(["dedup", docs, out_s, "--method", "substring"]) == 0
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out_s).collect()}
    # doc 2 fully cut (empty -> dropped); doc 4's copied run removed
    assert set(got) == {1, 3, 4}
    assert got[4] == "x0 x1 x2"

    out_m = str(tmp_path / "mh.parquet")
    assert main(["dedup", docs, out_m, "--method", "minhash"]) == 0
    kept = {r["doc_id"] for r in spark.read.parquet(out_m).collect()}
    assert 1 in kept and 2 not in kept and 3 in kept

    out_p = str(tmp_path / "packed.parquet")
    assert main(["pack", docs, out_p, "--max-len", "50", "--shards", "2"]) == 0
    packed = spark.read.parquet(out_p).collect()
    assert len(packed) == 4
    assert {c for c in packed[0].asDict()} == {"doc_id", "shard", "bin", "n_tokens"}


def test_cli_quality_filter(spark, tmp_path, capsys):
    """quality: train on a labeled mirror-pair parquet, score + filter
    a corpus; predicted-keep docs are exactly the sentinel-marked
    positives."""
    import pandas as pd

    base = ["alpha beta gamma delta", "one two three four five",
            "lorem ipsum dolor sit amet", "red green blue yellow"]
    labeled = str(tmp_path / "labeled.parquet")
    spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(4)) + list(range(100, 104)),
        "text": [t + " qsentinelgood qsentinelgood" for t in base]
        + [t + " qsentinelbad qsentinelbad" for t in base],
        "y": [1.0] * 4 + [0.0] * 4,
    })).write.parquet(labeled)

    corpus = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": [
            "fresh words here qsentinelgood qsentinelgood qsentinelgood",
            "more clean text qsentinelgood qsentinelgood qsentinelgood",
            "junky junk qsentinelbad qsentinelbad qsentinelbad",
            "other junk qsentinelbad qsentinelbad qsentinelbad",
        ],
    })).write.parquet(corpus)

    out = str(tmp_path / "scored.parquet")
    assert main(["quality", corpus, out, "--labels", labeled,
                 "--iters", "6"]) == 0
    rows = {r["doc_id"]: r["label_pred"]
            for r in spark.read.parquet(out).collect()}
    assert rows == {10: 1, 11: 1, 12: 0, 13: 0}

    kept = str(tmp_path / "kept.parquet")
    assert main(["quality", corpus, kept, "--labels", labeled,
                 "--iters", "6", "--keep-only"]) == 0
    assert {r["doc_id"] for r in spark.read.parquet(kept).collect()} == {10, 11}


def test_cli_grib_info(tmp_path, capsys):
    """grib-info inventories an archive's selection keys (param /
    level / hour / member / threshold) without a Spark session — the
    discovery step before import-grib's --param/--member/--threshold."""
    import json as _json

    import numpy as np

    from raquet_spark.cli import main
    from raquet_spark.testing_grib2 import write_grib2

    gy, gx = np.mgrid[0:4, 0:6]
    data = ((gx + gy) % 7).astype("f8")
    path = str(tmp_path / "mix.grib2")
    write_grib2(
        path,
        [
            {"data": data, "forecast_time": 0, "param": (0, 0)},
            {"data": data, "forecast_time": 0, "param": (1, 8),
             "pdt": 9, "prob_lower_scale": 1, "prob_lower": 254},
            {"data": data, "forecast_time": 6, "param": (0, 0),
             "pdt": 1, "ens_member": 3, "ens_count": 10},
        ],
    )
    assert main(["grib-info", path]) == 0
    out = capsys.readouterr().out
    assert "3 message(s)" in out
    assert "threshold=25.4" in out
    assert "member=3/10" in out

    assert main(["grib-info", path, "--json"]) == 0
    rows = _json.loads(capsys.readouterr().out)
    assert len(rows) == 3
    assert rows[1]["prob_lower"] == 25.4
    assert rows[2]["ens_member"] == 3


def test_cli_grib_info_tolerant_mixed_archive(tmp_path, capsys):
    """ADVICE r12: grib-info must inventory a mixed archive — list the
    messages it can decode and the rest as 'unsupported: <reason>'
    lines — instead of aborting on the first typed gate; import paths
    keep fail-fast."""
    import json as _json
    import struct

    import numpy as np
    import pytest

    from raquet_spark.cli import main
    from raquet_spark.sources.grib2 import _sections, read_grib2_structure
    from raquet_spark.testing_grib2 import write_grib2

    gy, gx = np.mgrid[0:4, 0:6]
    data = ((gx + gy) % 7).astype("f8")
    good = str(tmp_path / "good.grib2")
    write_grib2(good, [{"data": data, "forecast_time": 0, "param": (0, 0)}])
    raw = bytearray(open(good, "rb").read())
    (msg_len,) = struct.unpack(">Q", bytes(raw[8:16]))
    s3, _ = _sections(raw, 0, msg_len)[3]
    struct.pack_into(">H", raw, s3 + 12, 90)  # GDT 3.90: space view
    mixed = str(tmp_path / "mixed.grib2")
    with open(mixed, "wb") as f:
        f.write(open(good, "rb").read() + bytes(raw))

    assert main(["grib-info", mixed]) == 0
    out = capsys.readouterr().out
    assert "2 message(s)" in out
    assert "unsupported: " in out and "3.90" in out
    assert "param=0,0" in out  # the decodable message still lists

    assert main(["grib-info", mixed, "--json"]) == 0
    rows = _json.loads(capsys.readouterr().out)
    assert len(rows) == 2
    assert "3.90" in rows[1]["unsupported"]

    # import path: unchanged fail-fast on the same file
    with pytest.raises(NotImplementedError, match="3.90"):
        read_grib2_structure(mixed)


def test_grib_info_truncated_archives(tmp_path, capsys):
    """ADVICE r13: tolerant mode must report a truncated tail —
    whether the cut lands inside a message body (declared length
    overruns the file) or inside section 0 itself (fewer than 16
    trailing bytes) — instead of crashing or silently dropping it;
    import paths keep fail-fast on both shapes."""
    import json as _json

    import numpy as np
    import pytest

    from raquet_spark.cli import main
    from raquet_spark.sources.grib2 import read_grib2_structure
    from raquet_spark.testing_grib2 import write_grib2

    gy, gx = np.mgrid[0:4, 0:6]
    data = ((gx + gy) % 7).astype("f8")
    good = str(tmp_path / "good.grib2")
    write_grib2(good, [{"data": data, "forecast_time": 0, "param": (0, 0)}])
    raw = open(good, "rb").read()

    # cut inside the second message's body: section 0 declares the
    # full length but the file ends early
    body_cut = str(tmp_path / "body_cut.grib2")
    with open(body_cut, "wb") as f:
        f.write(raw + raw[: len(raw) // 2])
    g = read_grib2_structure(body_cut, tolerant=True)
    assert len(g["messages"]) == 2
    tail = g["messages"][1]
    assert "truncated message" in tail["unsupported"]
    assert tail["offset"] == len(raw)
    assert tail["length"] == len(raw) // 2
    with pytest.raises(ValueError, match="truncated GRIB message"):
        read_grib2_structure(body_cut)

    # cut inside section 0 itself: < 16 trailing bytes, too short to
    # even carry a message length
    sec0_cut = str(tmp_path / "sec0_cut.grib2")
    with open(sec0_cut, "wb") as f:
        f.write(raw + raw[:9])
    g = read_grib2_structure(sec0_cut, tolerant=True)
    assert len(g["messages"]) == 2
    tail = g["messages"][1]
    assert "truncated section 0" in tail["unsupported"]
    assert tail["offset"] == len(raw) and tail["length"] == 9
    with pytest.raises(ValueError, match="truncated GRIB section 0"):
        read_grib2_structure(sec0_cut)

    # sweep EVERY cut offset inside the second message (review r14:
    # single-byte accesses on a cut-off body raise IndexError, which
    # the tolerant handler originally didn't catch — 63 of 76 GRIB1
    # cut points crashed the inventory); also the GRIB1 edition
    import numpy as np_

    from raquet_spark.testing_grib2 import write_grib1

    g1 = str(tmp_path / "g1.grib1")
    write_grib1(g1, [{"data": np_.arange(24.0).reshape(4, 6),
                      "forecast_time": 0, "param": 11}])
    for base in (raw, open(g1, "rb").read()):
        for cut in range(17, len(base), 7):
            pth = str(tmp_path / "sweep.grib")
            with open(pth, "wb") as f:
                f.write(base + base[:cut])
            g = read_grib2_structure(pth, tolerant=True)
            assert len(g["messages"]) == 2, cut
            assert "truncated" in g["messages"][1]["unsupported"], cut
            with pytest.raises(ValueError, match="truncated GRIB"):
                read_grib2_structure(pth)

    # the CLI lists both shapes, with byte ranges in --json so the
    # message is locatable in a large archive (ADVICE r13)
    assert main(["grib-info", body_cut]) == 0
    out = capsys.readouterr().out
    assert "2 message(s)" in out and "truncated message" in out
    assert main(["grib-info", body_cut, "--json"]) == 0
    rows = _json.loads(capsys.readouterr().out)
    assert rows[0]["offset"] == 0 and rows[0]["length"] == len(raw)
    assert rows[1]["offset"] == len(raw)
    assert "truncated message" in rows[1]["unsupported"]


@pytest.mark.slow
def test_cli_import_geotiff_reference_flags(spark, tmp_path, capsys):
    """Reference `convert raster` flag parity on import-geotiff (r14):
    --compression jpeg/webp (interleaved lossy per spec) and
    --band-layout interleaved keep stats columns and decode back;
    --target-size splits the output into byte-budgeted part files;
    --streaming and --workers are accepted compatibility no-ops."""
    import glob
    import os

    import numpy as np

    from raquet_spark.cli import main
    from raquet_spark.functions.bands import decode_block
    from raquet_spark.operators.layout import decode_lossy
    from raquet_spark.sources.raquet import read_raquet, read_raquet_metadata

    # uint8 source: generate -> export .tif -> import with flags
    # (a 256x256-px tif re-imported at --block-size 64 = 16 blocks)
    raq = str(tmp_path / "u8.parquet")
    assert main(["generate", raq, "--tiles", "4", "--block-size", "64",
                 "--zoom", "6", "--dtype", "uint8"]) == 0
    tif = str(tmp_path / "u8.tif")
    assert main(["export", raq, tif]) == 0
    capsys.readouterr()
    bs = ["--block-size", "64"]

    # webp (default LOSSLESS VP8L): pixels round-trip exactly
    webp_out = str(tmp_path / "webp.parquet")
    assert main(["import-geotiff", tif, webp_out, *bs,
                 "--compression", "webp",
                 "--streaming", "--workers", "4"]) == 0
    out = capsys.readouterr().out
    assert "--workers 4 accepted" in out
    meta = read_raquet_metadata(spark, webp_out)
    assert meta["compression"] == "webp"
    assert meta.get("band_layout") == "interleaved"
    rows = read_raquet(spark, webp_out).where("block > 0").collect()
    assert rows and "band_1_min" in rows[0].asDict()  # stats survived
    # exactness oracle: the same tif imported with the default gzip
    # path (identical warp) — lossless VP8L must match it byte-for-byte
    base_out = str(tmp_path / "base.parquet")
    assert main(["import-geotiff", tif, base_out, *bs]) == 0
    capsys.readouterr()
    src = {
        r["block"]: r for r in
        read_raquet(spark, base_out).where("block > 0").collect()
    }
    assert set(src) == {r["block"] for r in rows}
    for r in rows:
        got = decode_lossy(bytes(r["pixels"]), "webp", 1).reshape(-1)
        want = decode_block(src[r["block"]]["band_1"], "uint8").reshape(-1)
        np.testing.assert_array_equal(got, want)

    # jpeg at q100 with blocky content is NOT asserted pixel-exact here
    # (content is arbitrary); assert structure + stats only
    jpg_out = str(tmp_path / "jpg.parquet")
    assert main(["import-geotiff", tif, jpg_out, *bs,
                 "--compression", "jpeg",
                 "--compression-quality", "92"]) == 0
    capsys.readouterr()
    meta_j = read_raquet_metadata(spark, jpg_out)
    assert meta_j["compression"] == "jpeg"
    assert meta_j.get("compression_quality") == 92
    jrows = read_raquet(spark, jpg_out).where("block > 0").collect()
    assert len(jrows) == len(src)  # same warp as the base import
    assert all(
        decode_lossy(bytes(r["pixels"]), "jpeg", 1).size == 64 * 64
        for r in jrows
    )

    # interleaved lossless layout keeps exact pixels too
    il_out = str(tmp_path / "il.parquet")
    assert main(["import-geotiff", tif, il_out, *bs,
                 "--band-layout", "interleaved"]) == 0
    capsys.readouterr()
    meta_i = read_raquet_metadata(spark, il_out)
    assert meta_i.get("band_layout") == "interleaved"

    # --target-size: a small budget must split into multiple part files
    split_out = str(tmp_path / "split.parquet")
    assert main(["import-geotiff", tif, split_out, *bs,
                 "--target-size", "4000"]) == 0
    capsys.readouterr()
    parts = [p for p in glob.glob(split_out + "/part-*.parquet")
             if os.path.getsize(p) > 800]  # non-empty data parts
    assert len(parts) >= 2, parts
    # and the dataset still reads whole
    assert read_raquet(spark, split_out).where("block > 0").count() == len(src)


def test_cli_version(capsys):
    """--version prints the package version and exits 0 (reference
    test_cli.py::test_version parity)."""
    import pytest as _pytest

    from raquet_spark.cli import main

    with _pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert capsys.readouterr().out.startswith("raquet_spark 0.")
