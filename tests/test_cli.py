"""CLI surface (mirrors reference raquet/cli.py commands)."""

from __future__ import annotations

from raquet_spark.cli import main


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
