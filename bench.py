"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "pages_ocr": N, "pages_per_sec": N}

Modes:
  python bench.py             # headline run on local[$SPARK_GRAFT_CPUS]
  python bench.py --scaling   # same OCR job at local[8] and local[32] on
                              # identical input; prints throughput at both
                              # plus scaling efficiency (the north_rule's
                              # two-cluster-size criterion, evidenced via
                              # parallelism levels — no real cluster here)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: the OCR flagship + one representative per operator family.
# dedup_token_jaccard is excluded: token-Jaccard on this corpus's 31-word
# vocabulary is intrinsically quadratic (~1M qualifying pairs at sf0.1);
# the subquadratic LSH path (dedup_minhash_bands) is the benchmarked one.
HEADLINE = [
    "ocr_extract_spans",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_nation_volume",
    "lineitem_top_per_order",
    "events_sessionize",
    "text_quality_score",
    "doc_fingerprint",
    "dedup_minhash_bands",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_near_pairs",
    "embedding_centroids",
]


def _run_query(spark, name, fn):
    t0 = time.time()
    n = fn(spark, SF_DIR).count()
    return time.time() - t0, n


def _count_pages(spark) -> int:
    from pyspark.sql import functions as F

    from onnxtr_spark.corpus import WORDS_PER_PAGE

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        docs.select(
            F.greatest(
                F.lit(1), F.ceil(F.size(F.split(F.trim("text"), r"\s+")) / WORDS_PER_PAGE)
            ).alias("p")
        )
        .agg(F.sum("p"))
        .collect()[0][0]
    )


def headline() -> None:
    import __spark_entry__ as entrymod
    from onnxtr_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS)
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    pages = _count_pages(spark)
    ocr_sec = None
    for name in HEADLINE:
        sec, _ = _run_query(spark, name, qs[name])
        timings[name] = round(sec, 3)
        if name == "ocr_extract_spans":
            ocr_sec = sec
    total = round(sum(timings.values()), 3)
    print(
        json.dumps({
            "metric": "headline_total_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            "cpus": CPUS,
            "pages_ocr": int(pages),
            "pages_per_sec": round(pages / ocr_sec, 2) if ocr_sec else None,
        })
    )
    spark.stop()


def scaling(levels=(8, 32)) -> None:
    """Run the OCR flagship at two parallelism levels on identical input."""
    import __spark_entry__ as entrymod
    from onnxtr_spark.session import get_spark

    results = {}
    pages = None
    for cpus in levels:
        spark = get_spark(f"bench-scale-{cpus}", cpus=cpus, shuffle_partitions=max(32, cpus))
        if pages is None:
            pages = _count_pages(spark)
        # warm-up pass amortizes JVM/worker startup out of the measurement
        entrymod.queries()["tpch_q1_pricing"](spark, SF_DIR).count()
        sec, _ = _run_query(spark, "ocr_extract_spans", entrymod.queries()["ocr_extract_spans"])
        results[cpus] = {"sec": round(sec, 3), "pages_per_sec": round(pages / sec, 2)}
        spark.stop()
    lo, hi = min(levels), max(levels)
    eff = (results[hi]["pages_per_sec"] / results[lo]["pages_per_sec"]) / (hi / lo)
    print(
        json.dumps({
            "metric": "ocr_scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "levels": {str(k): v for k, v in results.items()},
            "pages": int(pages),
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        })
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        headline()
