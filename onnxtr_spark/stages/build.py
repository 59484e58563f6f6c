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


def export_hocr(words: DataFrame, page_dims: DataFrame) -> DataFrame:
    """S8 hOCR XML sink (reference Page.export_as_xml,
    io/elements.py:300-402): per page, an XHTML document with
    ocr_page / ocr_line / ocrx_word divs carrying absolute-pixel
    bboxes and confidences.

    Pure-SQL string building: words grouped into lines by line_id,
    lines into the page body — no Python in the loop.
    ``page_dims``: (media_ref, height, width).
    """
    w = words.join(page_dims, "media_ref").select(
        "media_ref", "line_id", "rank", "text", "conf",
        F.floor(F.col("xmin") * F.col("width")).cast("int").alias("x0"),
        F.floor(F.col("ymin") * F.col("height")).cast("int").alias("y0"),
        F.ceil(F.col("xmax") * F.col("width")).cast("int").alias("x1"),
        F.ceil(F.col("ymax") * F.col("height")).cast("int").alias("y1"),
        "height", "width",
    )
    word_xml = w.withColumn(
        "word_xml",
        F.concat(
            F.lit('<span class="ocrx_word" title="bbox '),
            F.col("x0"), F.lit(" "), F.col("y0"), F.lit(" "), F.col("x1"), F.lit(" "), F.col("y1"),
            F.lit("; x_wconf "), F.round(F.col("conf") * 100).cast("int"),
            F.lit('">'), F.col("text"), F.lit("</span>"),
        ),
    )
    lines = (
        word_xml.groupBy("media_ref", "line_id", "height", "width")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(F.struct("rank", "word_xml"))), lambda s: s["word_xml"]),
                " ",
            ).alias("line_body"),
            F.min("rank").alias("line_rank"),
        )
        .withColumn(
            "line_xml",
            F.concat(F.lit('<span class="ocr_line">'), F.col("line_body"), F.lit("</span>")),
        )
    )
    return (
        lines.groupBy("media_ref", "height", "width")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(F.struct("line_rank", "line_xml"))), lambda s: s["line_xml"]),
                "",
            ).alias("body")
        )
        .select(
            "media_ref",
            F.concat(
                F.lit('<div class="ocr_page" title="bbox 0 0 '),
                F.col("width"), F.lit(" "), F.col("height"), F.lit('">'),
                F.col("body"), F.lit("</div>"),
            ).alias("hocr"),
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
