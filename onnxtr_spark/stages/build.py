"""Build stage: word predictions + pass-through text spans → final spans.

Pure-SQL re-expression of the reference's document assembly
(onnxtr/models/builder.py:214-355 and io/elements.py:411-429): the
nested Word/Line/Block/Page element tree dissolves into keys —
``(doc_id, src_offset, rank)`` fully determines output order, and the
per-page zip/alignment operator (models/predictor/base.py:186-202)
disappears entirely (SURVEY.md §2.8 B5/B6).

Everything here is JVM-side (whole-stage codegen): one union, one
window over doc_id, optional final groupBy for the nested export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPAN_COLS = ["doc_id", "offset", "kind", "text", "media_ref"]


def assemble_spans(docs: DataFrame, words: DataFrame) -> DataFrame:
    """Interleave pass-through text spans with OCR'd word spans.

    Returns flat rows (doc_id, offset, kind, text, media_ref) with
    offsets dense per doc in reading order: original span order first,
    then builder rank within each media span (FIXTURES.md §3).
    """
    text_spans = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "text")
        .select(
            "doc_id",
            F.col("s.offset").alias("src_offset"),
            F.lit(-1).alias("rank"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )
    word_spans = words.select(
        "doc_id",
        F.col("offset").alias("src_offset"),
        "rank",
        F.lit("text").alias("kind"),
        "text",
        "media_ref",
    )
    w = Window.partitionBy("doc_id").orderBy("src_offset", "rank")
    return (
        text_spans.unionByName(word_spans)
        .withColumn("offset", (F.row_number().over(w) - F.lit(1)).cast("int"))
        .select(*SPAN_COLS)
    )


def to_doc_spans(flat_spans: DataFrame) -> DataFrame:
    """Nest flat span rows back into the input-table shape
    (doc_id, spans array<struct<kind,text,media_ref,offset>>)."""
    return (
        flat_spans.groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("offset", "kind", "text", "media_ref"))),
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans")
        )
    )


def render_text(flat_spans: DataFrame) -> DataFrame:
    """S7 text-render sink: join span texts with spaces per doc
    (reference io/elements.py:171,427-429 joins words with ' ' and pages
    with newlines; flat spans here carry no line markers, so this is the
    word-level render)."""
    return (
        flat_spans.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("offset", "text"))), lambda s: s["text"]
                ),
                " ",
            ).alias("rendered")
        )
    )
