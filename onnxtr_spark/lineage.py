"""Checkpointed extraction with per-partition-group lineage and resume.

The north_rule requires the job to be resumable from checkpoint with
per-partition lineage + metrics. Strategy (SURVEY.md §7 step 7):

- documents are assigned to ``n_groups`` buckets by a deterministic hash
  of doc_id (``pmod(xxhash64(doc_id), n_groups)`` — at 10^12-doc scale
  these map 1:1 onto Iceberg partition groups / MERGE targets).
- each group is extracted and written independently:
  ``out/spans/group=<g>/`` via dynamic-partition overwrite (idempotent:
  re-running a group replaces exactly that group's files — the
  parquet-on-fs analog of Iceberg ``MERGE INTO`` on doc_id).
- after a group's output commits, one lineage row is appended to
  ``out/lineage/`` recording docs/pages/words/spans counts, wall time,
  and the run id. Lineage is written AFTER data, so a crash between the
  two at worst re-processes one group — never drops or duplicates rows
  (overwrite makes re-processing idempotent).
- resume: groups present in the lineage table are skipped.

A driver-side loop over groups (not ``collect()`` of data — only of the
already-done group ids) is the deliberate checkpoint grain: group count
is small and fixed (e.g. 256 at production scale), each group is a full
distributed job.

Delta from real Iceberg semantics (this sandbox has no Iceberg jars;
SURVEY §1.3/§4 promise ``MERGE INTO`` when they are available):

- **Atomic commit**: Iceberg commits a snapshot atomically; dynamic
  partition overwrite swaps a directory's files non-atomically, so a
  reader racing a writer can observe a partially-replaced group.
  Covered here by the write-data-THEN-lineage ordering: consumers that
  gate on the lineage table (the contract) never read a group whose
  overwrite hasn't finished, and a crash mid-overwrite leaves the group
  un-lineaged → fully re-processed on resume (idempotent replace,
  proven by tests/test_lineage_resume.py incl. a simulated concurrent
  partial write).
- **Writer isolation**: Iceberg's optimistic concurrency rejects one of
  two conflicting commits; the fs standin is last-writer-wins per file.
  The deployment contract is therefore ONE active driver per
  ``out_path`` (the usual scheduler lock); zombie-writer leftovers in a
  group directory are healed by the next overwrite of that group, and
  never surface through lineage-gated reads (test-pinned).
- **Snapshot reads / time travel**: not reproduced; ``read_spans``
  reads current files only.
"""

from __future__ import annotations

import time
import uuid

from pyspark import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onnxtr_spark.stages.pipeline import extract_spans

LINEAGE_SCHEMA = (
    "run_id string, group int, n_docs long, n_pages long, n_words long, n_spans long, "
    "wall_ms double, completed_at_unix double"
)

PARTITION_METRICS_SCHEMA = (
    "run_id string, group int, partition_id int, pages long, boxes long, words long, "
    "decode_ms double, wall_ms double"
)


class _ListAccum(AccumulatorParam):
    """AccumulatorParam collecting lists of tuples (executor -> driver
    side channel for per-partition metric rows)."""

    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


def metrics_accumulator(spark: SparkSession):
    """Fresh per-partition-metrics accumulator for the fused stage
    (stages/fused.detect_recognize_pages ``metrics_acc``): each task
    adds one (partition_id, pages, boxes, words, decode_ms, wall_ms)
    row — the north-star lineage metrics."""
    return spark.sparkContext.accumulator([], _ListAccum())


def _with_group(docs: DataFrame, n_groups: int) -> DataFrame:
    return docs.withColumn("group", F.pmod(F.xxhash64("doc_id"), F.lit(n_groups)).cast("int"))


def completed_groups(spark: SparkSession, out_path: str) -> set[int]:
    try:
        rows = spark.read.parquet(f"{out_path}/lineage").select("group").distinct().collect()
    except Exception:  # noqa: BLE001 — first run: no lineage yet
        return set()
    return {r["group"] for r in rows}


def run_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    out_path: str,
    n_groups: int = 8,
    fail_after: int | None = None,
    partition_metrics: bool = True,
    det_cfg=None,
) -> list[int]:
    """Extract all doc groups, skipping completed ones. Returns the list
    of groups processed this run. ``fail_after`` aborts after N groups
    (test hook simulating a mid-job crash). ``partition_metrics``
    appends per-partition rows (pages decoded, boxes detected, words
    recognized, decode latency, wall time) to
    ``out/partition_metrics/`` after each group commits."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    run_id = uuid.uuid4().hex[:12]
    done = completed_groups(spark, out_path)
    grouped = _with_group(docs, n_groups)
    processed: list[int] = []

    for g in range(n_groups):
        if g in done:
            continue
        t0 = time.time()
        gdocs = grouped.where(F.col("group") == g).drop("group")
        n_docs = gdocs.count()
        n_spans = 0
        n_pages = 0
        n_words = 0
        acc = metrics_accumulator(spark) if partition_metrics else None
        if n_docs:
            kw = {"det_cfg": det_cfg} if det_cfg is not None else {}
            flat = extract_spans(gdocs, media, metrics_acc=acc, **kw).withColumn("group", F.lit(g))
            flat.write.mode("overwrite").partitionBy("group").parquet(f"{out_path}/spans")
            written = spark.read.parquet(f"{out_path}/spans").where(F.col("group") == g)
            counts = written.agg(
                F.count("*").alias("spans"),
                # OCR'd word spans carry their source page's media_ref
                F.sum(F.when(F.col("media_ref") != "", 1).otherwise(0)).alias("words"),
            ).collect()[0]
            n_spans = int(counts["spans"])
            n_words = int(counts["words"] or 0)
            n_pages = (
                gdocs.select(F.explode("spans").alias("s"))
                .where(F.col("s.kind") == "media")
                .count()
            )
        if partition_metrics and acc is not None and acc.value:
            rows = [(run_id, g, *tup) for tup in acc.value]
            spark.createDataFrame(rows, schema=PARTITION_METRICS_SCHEMA).write.mode("append").parquet(
                f"{out_path}/partition_metrics"
            )
        lineage_row = spark.createDataFrame(
            [(run_id, g, n_docs, n_pages, n_words, n_spans, (time.time() - t0) * 1000.0, time.time())],
            schema=LINEAGE_SCHEMA,
        )
        lineage_row.write.mode("append").parquet(f"{out_path}/lineage")
        processed.append(g)
        if fail_after is not None and len(processed) >= fail_after:
            break
    return processed


def read_spans(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(f"{out_path}/spans").drop("group")
