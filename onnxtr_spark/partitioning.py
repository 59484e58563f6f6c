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


# Wide operators in the ANALYZED logical plan. When any is present,
# probing df.rdd.getNumPartitions() is NOT free: under AQE, converting
# to an RDD finalizes the adaptive plan, which EXECUTES every non-result
# query stage eagerly — a partition-count "peek" would run the join /
# shuffle right there at plan-build time (measured: the fused float
# benchmark tripled when media_pages probed its join). Probe only
# exchange-free plans (scans + narrow transforms), where .rdd is pure
# plan construction.
_WIDE_NODES = (
    "Join",
    "Aggregate",
    "Repartition",
    "RepartitionByExpression",
    "Window",
    "Deduplicate",
    "Distinct",
    "Sort",
    "Union",
)


def _probe_safe(df: DataFrame) -> bool:
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # non-JVM backend (e.g. connect): stay conservative
        return False
    return not any(node in plan for node in _WIDE_NODES)


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure at least the configured width ahead of a Python stage.

    Without ``cols``: round-robin repartition to the width — skipped
    entirely when an exchange-free input (the 100 TB scan case) is
    already at least that wide, so a big scan is never narrowed or
    needlessly shuffled. With ``cols``: hash repartition on the keys —
    keyed redistribution decorrelates scan-order cost clusters
    (adjacent pages of one document have correlated cost; measured
    ~30% win over scan order, BENCH.md) — widened to the input's
    partition count when that is probeable.

    Inputs whose plan already contains an exchange (join/agg/
    repartition upstream) keep the unconditional explicit repartition:
    their width follows spark.sql.shuffle.partitions, which a cluster
    deployment sizes anyway, and probing them would execute the plan
    (see _WIDE_NODES note). The conf knob overrides the floor in
    either case.
    """
    width = stage_width(df)
    if _probe_safe(df):
        current = df.rdd.getNumPartitions()
        if cols:
            return df.repartition(max(width, current), *cols)
        if current >= width:
            return df
        return df.repartition(width)
    return df.repartition(width, *cols) if cols else df.repartition(width)
