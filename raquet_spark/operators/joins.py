"""Join strategy utilities for skewed and repeated joins at scale.

Two levers the 100 TB plans need beyond AQE's defaults:

- ``salted_join``: explicit key salting for joins where one key is
  pathologically hot (ocean tiles vs city tiles, empty-string text,
  null-ish defaults). The hot side's rows get a uniform random salt in
  [0, n); the other side is replicated n ways — the hot key's rows land
  on n partitions instead of one straggler.
- ``write_bucketed`` / shuffle-free join: persist both sides bucketed
  and sorted by the join key; subsequent equi-joins read co-located
  buckets with NO exchange — the right layout for a dimension that is
  joined every day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 7,
) -> DataFrame:
    """Equi-join robust to heavy key skew on ``skewed``.

    ``skewed`` rows are assigned a random salt in [0, n_salts);
    ``other`` is exploded across every salt value, so the join key
    becomes (key, salt) and a single hot key spreads over ``n_salts``
    reducers. Result is identical to ``skewed.join(other, on, how)``
    (salt columns are internal). ``other`` is replicated n_salts× —
    use for small-to-medium right sides only."""
    keys = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = s.join(o, keys + ["_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    on: str | list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed AND sorted by the join key(s).

    Two tables bucketed the same way equi-join with zero Exchange in
    the plan (bucket pruning + co-located scan) — the pre-shuffle is
    paid once at write time instead of on every join."""
    keys = [on] if isinstance(on, str) else list(on)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys).sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables (see ``write_bucketed``)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
