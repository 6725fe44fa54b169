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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: str = "asof",
) -> DataFrame:
    """Backward as-of join: attach to each left row the right row with
    the largest ``right_time`` <= ``left_time`` for the same key
    (left-join semantics — unmatched left rows get NULL ``payload``).

    Spark has no ASOF JOIN; the naive formulation is an inequality join
    (BroadcastNestedLoop — quadratic). This is the scale shape instead:
    tag and UNION both sides, ONE shuffle keyed by ``on``, sort within
    partition by (time, side), and carry the last right payload forward
    with a running ``last(ignorenulls)`` window — O(n log n) per key
    group, no cross product anywhere. At 100 TB pair hot keys with
    ``salted_join``-style pre-splitting or AQE skew handling.

    ``right`` should be unique per (key, time) — pre-aggregate if not,
    otherwise which duplicate wins is tie-ordering-dependent. The right
    payload (every non-key, non-time column plus ``right_time``) lands
    in a single struct column named ``payload``.
    """
    from pyspark.sql.window import Window

    rcols = [c for c in right.columns if c not in (on, right_time)]
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.struct(F.col(right_time), *[F.col(c) for c in rcols]).alias(payload),
        F.lit(0).alias("_side"),
    )
    l = (
        left.withColumn("_k", F.col(on))
        .withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(1))
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(payload, F.last(payload, ignorenulls=True).over(w))
    return matched.where(F.col("_side") == 1).select(*left.columns, payload)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of point rows to interval rows with
    ``lo <= point <= hi`` — WITHOUT the BroadcastNestedLoop plan Spark
    produces for inequality joins (quadratic; falls over when neither
    side broadcasts).

    Scale shape: every interval is exploded to the coarse buckets of
    width ``bucket_width`` it overlaps; every point maps to its single
    bucket; the join becomes an EQUI-join on the bucket id (shuffle
    hash/SMJ — AQE-skew-handled) followed by the exact range refine.
    Cost is |intervals| × avg-buckets-per-interval replication, so pick
    ``bucket_width`` near the median interval length. Both inputs pass
    through unchanged otherwise; output has all point columns + all
    interval columns."""
    b = F.lit(float(bucket_width))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                F.floor(F.col(hi_col) / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn("_bucket", F.floor(F.col(point_col) / b).cast("long"))
    out = pt.join(iv, "_bucket").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return out.drop("_bucket")


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
