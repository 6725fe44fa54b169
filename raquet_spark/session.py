"""SparkSession factory with scale-aware defaults.

Test/bench sessions run local[N]; the same configuration knobs are the
ones that matter on a 1000-executor cluster (AQE, adaptive skew joins,
Arrow batch size for pixel codecs, sane shuffle partitioning).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make ``raquet_spark`` importable on executors regardless of the
    consumer's working directory or PYTHONPATH, by shipping the package
    as a zip via ``addPyFile`` — the same mechanism used to deploy to a
    real cluster. Idempotent per application."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    import raquet_spark

    pkg_dir = os.path.dirname(os.path.abspath(raquet_spark.__file__))
    zpath = os.path.join(tempfile.mkdtemp(prefix="raquet_spark_pkg_"), "raquet_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join("raquet_spark", os.path.relpath(full, pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(app)


def get_spark(
    app_name: str = "raquet_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # SPARK_GRAFT_SHUFFLE_PARTITIONS: a cluster sizes shuffle width to
    # data volume (AQE only COALESCES below the initial number, it
    # never raises it) — the scale probes use this to keep per-task
    # state bounded at x256 synthetic volumes
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Pin the session zone so NTZ→TIMESTAMP casts (watermarks,
        # epoch_seconds) are deterministic and DST-free vs DuckDB epoch().
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.parquet.filterPushdown", "true")
        # 10 MB broadcast threshold (r11, measured at sf1): the old
        # 64 MB limit broadcast the 1.5M-row orders table, whose
        # SINGLE-THREADED hash build cost ~2 s per query run — q5 went
        # 2.9 s → 0.8 s once fact-fact joins shuffle and only true
        # dimensions broadcast. Also the right call on a 1000-executor
        # cluster: a 64 MB broadcast per executor is driver+network
        # pressure, while the dim tables this engine broadcasts
        # (region/nation/supplier/customer) stay well under 10 MB.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # prefer shuffled-hash over sort-merge when a side fits in a
        # task (Spark 3.2+ SHJ spills, so this is safe): skips two
        # sorts on every fact-fact join; AQE still re-plans per stats
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
