"""Cluster-safe partition widths for CPU-bound Python stages.

Two failure modes bracket the width choice ahead of a mapInPandas /
Arrow stage whose cost is per-row CPU, not bytes:

- LOCALLY (small byte volumes), AQE's byte-based coalescing serializes
  the stage onto 1-2 partitions because the input is a few MB; an
  explicit ``repartition(n)`` is exempt from coalescing, so the stage
  actually uses the cores (measured, BENCH.md).
- AT CLUSTER SCALE, a 100 TB scan already arrives in far more
  partitions than ``defaultParallelism``; blindly repartitioning DOWN
  to it would shuffle the full payload AND under-parallelize the
  cluster. A wide input must pass through untouched.

``spark.onnxtr.pythonStageMinPartitions`` overrides the floor when a
deployment wants a different width (e.g. cores x an oversubscription
factor for stages with skewed per-row cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CONF_KEY = "spark.onnxtr.pythonStageMinPartitions"


def stage_width(df: DataFrame) -> int:
    """The configured minimum partition width for Python stages."""
    spark = df.sparkSession
    conf = spark.conf.get(CONF_KEY, None)
    return int(conf) if conf else spark.sparkContext.defaultParallelism


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure at least the configured width ahead of a Python stage.

    Without ``cols``: round-robin repartition to the width, skipped
    entirely when the input is already at least that wide (never narrow
    a big scan). With ``cols``: hash repartition on the keys — keyed
    redistribution decorrelates scan-order cost clusters (adjacent
    pages of one document have correlated cost; measured ~30% win over
    scan order, BENCH.md) — widened to the input's existing partition
    count so a wide scan is never narrowed either.
    """
    width = stage_width(df)
    current = df.rdd.getNumPartitions()
    if cols:
        return df.repartition(max(width, current), *cols)
    if current >= width:
        return df
    return df.repartition(width)
