"""Plan-shaping helpers: size CPU-heavy Python group stages by WORK.

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
keeps the caller-sized width.

The width itself is sized by the stage's decoded-pixel volume, not a
blanket ``spark.sql.shuffle.partitions``: a blanket pin makes TINY
stages slower (a 16-tile lossy-codec group stage spread over 32 tasks
pays ~10-20 ms of Arrow/pandas per task for microseconds of work —
measured 1.6-1.7x on the sf0.1 lossy queries, and the deep levels of a
pyramid build have 64/16/4/1 parents). Callers pass the decoded pixel
count they are about to process (every raster operator can compute it
from metadata); one task per ~64k pixels keeps per-task numpy work in
the tens of milliseconds, far above per-task overhead, while capping
at the deployment-tuned ``spark.sql.shuffle.partitions``.

At cluster scale the same sizing is correct: width grows linearly with
raster pixels until the operator saturates the configured shuffle
width, and the work-based floor keeps task counts from exploding on
small inputs regardless of executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# one task per this many decoded pixels: a 256x256 tile of float64
# window-stack kernels runs ~10-30 ms of numpy — an order of magnitude
# above per-task Arrow/pandas overhead (~1-2 ms warm)
PIXELS_PER_TASK = 1 << 16


def pin_group_width(
    df: DataFrame, *keys: str, approx_pixels: int | None = None
) -> DataFrame:
    """Hash-partition ``df`` by ``keys`` at a width pinned against AQE
    byte-based coalescing, sized by ``approx_pixels`` when given.

    Use immediately before ``groupBy(*keys).applyInPandas(...)`` on
    pixel/blob work: the numbered repartition becomes the ONLY exchange
    (the groupBy reuses its hash partitioning), and the width tracks
    the Python-side work instead of the post-compression byte count.

    ``approx_pixels`` is the decoded pixel volume the stage will
    process (group count x pixels per group — an upper bound is fine);
    width = clamp(approx_pixels / PIXELS_PER_TASK, 1,
    spark.sql.shuffle.partitions). Without it, the full configured
    width is used (for stages whose volume is genuinely unknown)."""
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        # some deployments set a non-numeric value (e.g. "auto");
        # fall back to the cluster's default parallelism
        n = df.sparkSession.sparkContext.defaultParallelism
    if approx_pixels is not None:
        n = max(1, min(n, -(-int(approx_pixels) // PIXELS_PER_TASK)))
    if n <= 1:
        # one task of work: the groupBy's own exchange (AQE-coalesced
        # to ~1 task) is the same outcome without a second plan node,
        # and the plan keeps its hashpartitioning Exchange shape
        return df
    return df.repartition(n, *keys)
