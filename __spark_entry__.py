"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial pipeline; ``queries()`` /
``oracle_sql()`` expose every oracle-checkable operator from
SURVEY.md §2 (implemented in raquet_spark/queries.py as dual-dialect
SQL templates plus Spark binary-pipeline queries with relational
oracles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: quadbin heatmap pyramid over sf0.001.

    Maps customers to synthetic lon/lat points, indexes them at zoom 8
    (pure Catalyst quadbin expressions), rolls the heatmap up to zoom 4
    ancestors, and attaches WGS84 tile bounds — the core RaQuet-style
    spatial aggregation path end to end.
    """
    from pyspark.sql import functions as F

    from raquet_spark.functions import quadbin as qb

    sf_dir = "/root/testdata/sf0.001"
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    lon = "(CAST(c_custkey % 720 AS DOUBLE) / 2.0 - 179.75)"
    lat = "(CAST((c_custkey * 7) % 340 AS DOUBLE) / 2.0 - 84.75)"
    pts = customer.withColumn("cell", qb.qb_point_to_cell(lon, lat, 8))

    rollup = (
        pts.withColumn("parent", qb.qb_cell_to_parent("cell", 4))
        .groupBy("parent")
        .agg(
            F.count("*").alias("n_customers"),
            F.countDistinct("cell").alias("n_cells"),
            F.sum("c_acctbal").alias("total_acctbal"),
        )
    )
    rollup = qb.with_tile(rollup, "parent")
    return rollup.select(
        "parent",
        "n_customers",
        "n_cells",
        "total_acctbal",
        F.expr(
            qb.bounds_from_tile_sql("qb_x", "qb_y", "qb_z", "spark")
        ).alias("bounds"),
    ).orderBy("parent")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from raquet_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from raquet_spark import queries as q

    return q.oracle_sql()
