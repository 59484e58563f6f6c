"""spark-submit entry point for the training-data curation pipeline.

Usage (the sibling of jobs/extract_job.py for the corpus side):

    spark-submit --master <cluster> \
        --py-files onnxtr_spark.zip \
        jobs/curate_job.py \
        --docs s3://bucket/documents \
        --out  s3://bucket/curated \
        [--quality-min 0.5] [--langs english,french] [--ladder v1|v2|v3|v4]

``--ladder`` picks the gate battery: v1 (dedup/quality/lang/
repetition/decontamination/PII), v2 (+ Gopher rules + CCNet
perplexity tail), v3 (+ boilerplate dominance + DSIR selection),
v4 (+ ExactSubstr duplicated-substring dominance).

Writes:
    <out>/curated   — kept docs only: (doc_id, text PII-scrubbed, lang, quality)
    <out>/audit     — EVERY doc with its kept_by gate ('' = kept)
    <out>/funnel    — (stage, n_docs) per-gate counts (the lineage metrics)
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from onnxtr_spark.functions.curate import curate, curate_v2, curate_v3, curate_v4, curation_funnel
from onnxtr_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--quality-min", type=float, default=0.5)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--max-dup-word-frac", type=float, default=0.95)
    ap.add_argument("--max-top-bigram-char-frac", type=float, default=0.2)
    ap.add_argument("--contaminate-n", type=int, default=5)
    ap.add_argument("--ladder", choices=["v1", "v2", "v3", "v4"], default="v1")
    args = ap.parse_args()

    spark = get_spark("curate_job")
    docs = spark.read.parquet(args.docs)
    ladder = {"v1": curate, "v2": curate_v2, "v3": curate_v3, "v4": curate_v4}[args.ladder]
    audited = ladder(
        docs,
        quality_min=args.quality_min,
        langs=tuple(args.langs.split(",")),
        max_dup_word_frac=args.max_dup_word_frac,
        max_top_bigram_char_frac=args.max_top_bigram_char_frac,
        contaminate_n=args.contaminate_n,
    )
    # materialize the audit once; curated + funnel are cheap projections
    audited.write.mode("overwrite").parquet(f"{args.out}/audit")
    audited = spark.read.parquet(f"{args.out}/audit")
    audited.where(F.col("kept_by") == "").drop("kept_by").write.mode("overwrite").parquet(
        f"{args.out}/curated"
    )
    curation_funnel(audited).write.mode("overwrite").parquet(f"{args.out}/funnel")
    for row in spark.read.parquet(f"{args.out}/funnel").orderBy("stage").collect():
        print(f"funnel {row.stage}: {row.n_docs}")
    spark.stop()


if __name__ == "__main__":
    main()
