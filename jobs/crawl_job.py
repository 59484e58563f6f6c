"""spark-submit entry: crawl archives → curated, packed training data.

The whole repo's story arc as ONE job — the pipeline a 100 TB crawl
actually runs:

    spark-submit --master <cluster> \
        --py-files onnxtr_spark.zip \
        jobs/crawl_job.py \
        --warcs s3://bucket/crawl/ \
        --out   s3://bucket/training/ \
        [--ctx 1024] [--quality-min 0.5] [--langs en]

Input: a directory of ``*.warc.gz`` files (read with Spark's binaryFile
source — each archive is one row, so archive parse parallelism is the
file count; shard large crawls into many archives, exactly as Common
Crawl does) OR a parquet of (warc_key, warc binary) rows.

Stages (all existing operators, composed — nothing bespoke):
  1. WARC record framing + HTML boilerplate strip  (sources/warc.py)
  2. curation gates: exact-dedup, quality, lang-ID, repetition,
     decontamination, PII scrub                    (functions/curate.py)
  3. GPT sequence packing over the survivors       (functions/text.py)

Writes:
    <out>/docs     — curated docs (doc_id, text, lang, quality)
    <out>/audit    — every doc with its kept_by gate ('' = kept)
    <out>/funnel   — (stage, n_docs) per-gate counts
    <out>/packed   — (doc_id, shard, bin_in_shard, bin_offset, n_bpe_tokens)
    <out>/frontier — (--frontier) politeness schedule for the next crawl
                     round: PageRank-prioritized (fetch_round,
                     rank_in_round) slots, one fetch per host per round
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def docs_from_warcs(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, text) from a crawl directory: parse records, strip
    boilerplate JVM-side, derive doc_id from the record URI."""
    from onnxtr_spark.sources.html import html_main_text
    from onnxtr_spark.sources.warc import warc_pages

    if path.endswith(".parquet") or path.rstrip("/").endswith("_parquet"):
        warcs = spark.read.parquet(path)
    else:
        warcs = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.warc.gz")
            .load(path)
            .select(F.monotonically_increasing_id().alias("warc_key"), F.col("content").alias("warc"))
        )
    return warc_pages(warcs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        html_main_text(F.col("html")).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warcs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--quality-min", type=float, default=0.5)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--frontier", action="store_true",
                    help="also write the next-round politeness crawl schedule")
    args = ap.parse_args()

    from onnxtr_spark.functions.curate import curate, curation_funnel
    from onnxtr_spark.functions.text import pack_sequences
    from onnxtr_spark.session import get_spark

    spark = get_spark("crawl_job")
    docs = docs_from_warcs(spark, args.warcs)
    audited = curate(docs, quality_min=args.quality_min, langs=tuple(args.langs.split(",")))
    audited.write.mode("overwrite").parquet(f"{args.out}/audit")
    audited = spark.read.parquet(f"{args.out}/audit")
    kept = audited.where(F.col("kept_by") == "").drop("kept_by")
    kept.write.mode("overwrite").parquet(f"{args.out}/docs")
    curation_funnel(audited).write.mode("overwrite").parquet(f"{args.out}/funnel")
    pack_sequences(spark.read.parquet(f"{args.out}/docs"), ctx=args.ctx).write.mode(
        "overwrite"
    ).parquet(f"{args.out}/packed")
    for row in spark.read.parquet(f"{args.out}/funnel").orderBy("stage").collect():
        print(f"funnel {row.stage}: {row.n_docs}")
    n = spark.read.parquet(f"{args.out}/packed").count()
    print(f"packed {n} docs at ctx={args.ctx}")
    if args.frontier:
        from onnxtr_spark.functions.graph import frontier_schedule

        frontier_schedule(spark.read.parquet(f"{args.out}/docs")).write.mode(
            "overwrite"
        ).parquet(f"{args.out}/frontier")
        nf = spark.read.parquet(f"{args.out}/frontier").count()
        print(f"frontier {nf} urls scheduled")
    spark.stop()


if __name__ == "__main__":
    main()
