"""Plan-shaping helpers: keep CPU-heavy Python group stages wide.

AQE's partition coalescing costs a shuffle by its BYTES
(``spark.sql.adaptive.advisoryPartitionSizeInBytes``), which is the
right proxy for JVM relational work but the wrong one for
``applyInPandas`` raster stages: compressed tile blobs routinely
deflate 50-100x, so a stage whose real cost is Python pixel decode +
numpy kernels can be coalesced down to one or two tasks on a 32-core
machine (measured: the lanczos halo level build ran as ONE task,
0.9s of a 1.3s query). An explicit numbered repartition
(``REPARTITION_BY_NUM``) is exempt from AQE coalescing, and
``EnsureRequirements`` reuses its hash partitioning for the downstream
``groupBy`` — the plan still carries exactly ONE Exchange, it just
keeps the user-sized width.

At cluster scale the same helper is correct: ``spark.sql.shuffle
.partitions`` is the operator-sized knob deployments already tune, and
pixel-group stages keep that width instead of whatever byte-count AQE
sees after blob compression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin_group_width(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-partition ``df`` by ``keys`` at ``spark.sql.shuffle.partitions``
    width, pinned against AQE byte-based coalescing.

    Use immediately before ``groupBy(*keys).applyInPandas(...)`` on
    pixel/blob work: the numbered repartition becomes the ONLY exchange
    (the groupBy reuses it), and every core stays busy even when the
    shuffled bytes are tiny."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *keys)
