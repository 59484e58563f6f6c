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


HOCR_TITLE = "onnxtr_spark - XML export (hOCR)"
HOCR_SYSTEM = "onnxtr_spark 0.2"


def _xml_escape(col):
    """Escape XML text content the way ElementTree does for element
    text: & first, then < and > (the vocab includes all three; without
    this a word like "a<b" produces malformed hOCR)."""
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def _px(rel, dim):
    """Relative coord -> absolute pixel, int(round(...)) like the
    reference (io/elements.py:354 etc.; HALF_UP at the .5 boundary)."""
    return F.round(rel * dim).cast("int")


def export_hocr(words: DataFrame, page_dims: DataFrame) -> DataFrame:
    """S8 hOCR XML sink (reference Page.export_as_xml,
    io/elements.py:300-402): per page, a full hOCR XHTML document —
    html/head(title, content-type, ocr-system, ocr-capabilities) and
    body > div.ocr_page > div.ocr_carea > p.ocr_par > span.ocr_line >
    span.ocrx_word, with absolute-pixel bboxes, per-page 1-based
    block/line/word ids, and x_wconf confidences.

    Pure-SQL string building (whole-stage codegen; no Python in the
    loop): three grouped rollups word→line→block→page, each ordered by
    reading rank. ``page_dims``: (media_ref, height, width).
    """
    w = words.join(page_dims, "media_ref").select(
        "media_ref", "offset", "block_id", "line_id", "rank",
        _xml_escape(F.col("text")).alias("text"), "conf",
        "xmin", "ymin", "xmax", "ymax", "height", "width",
    )
    word_no = Window.partitionBy("media_ref").orderBy("rank")
    word_xml = w.withColumn("word_no", F.row_number().over(word_no)).withColumn(
        "word_xml",
        F.concat(
            F.lit('<span class="ocrx_word" id="word_'), F.col("word_no"),
            F.lit('" title="bbox '),
            _px(F.col("xmin"), F.col("width")), F.lit(" "),
            _px(F.col("ymin"), F.col("height")), F.lit(" "),
            _px(F.col("xmax"), F.col("width")), F.lit(" "),
            _px(F.col("ymax"), F.col("height")),
            F.lit("; x_wconf "), F.round(F.col("conf") * 100).cast("int"),
            F.lit('">'), F.col("text"), F.lit("</span>"),
        ),
    )
    lines = (
        word_xml.groupBy("media_ref", "offset", "block_id", "line_id", "height", "width")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(F.struct("rank", "word_xml"))), lambda s: s["word_xml"]),
                "",
            ).alias("line_body"),
            F.min("rank").alias("line_rank"),
            _px(F.min("xmin"), F.first("width")).alias("lx0"),
            _px(F.min("ymin"), F.first("height")).alias("ly0"),
            _px(F.max("xmax"), F.first("width")).alias("lx1"),
            _px(F.max("ymax"), F.first("height")).alias("ly1"),
        )
    )
    line_no = Window.partitionBy("media_ref").orderBy("line_rank")
    line_xml = lines.withColumn("line_no", F.row_number().over(line_no)).withColumn(
        "line_xml",
        F.concat(
            F.lit('<span class="ocr_line" id="line_'), F.col("line_no"),
            F.lit('" title="bbox '),
            F.col("lx0"), F.lit(" "), F.col("ly0"), F.lit(" "), F.col("lx1"), F.lit(" "), F.col("ly1"),
            F.lit("; baseline 0 0; x_size 0; x_descenders 0; x_ascenders 0\">"),
            F.col("line_body"), F.lit("</span>"),
        ),
    )
    blocks = (
        line_xml.groupBy("media_ref", "offset", "block_id", "height", "width")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(F.struct("line_rank", "line_xml"))), lambda s: s["line_xml"]),
                "",
            ).alias("block_body"),
            F.min("line_rank").alias("block_rank"),
            F.concat_ws(
                " ",
                F.min("lx0").cast("string"), F.min("ly0").cast("string"),
                F.max("lx1").cast("string"), F.max("ly1").cast("string"),
            ).alias("bbox"),
        )
    )
    block_no = Window.partitionBy("media_ref").orderBy("block_rank")
    block_xml = blocks.withColumn("block_no", F.row_number().over(block_no)).withColumn(
        "block_xml",
        F.concat(
            F.lit('<div class="ocr_carea" id="block_'), F.col("block_no"),
            F.lit('" title="bbox '), F.col("bbox"),
            F.lit('"><p class="ocr_par" id="par_'), F.col("block_no"),
            F.lit('" title="bbox '), F.col("bbox"), F.lit('">'),
            F.col("block_body"), F.lit("</p></div>"),
        ),
    )
    head = (
        '<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en"><head>'
        f"<title>{HOCR_TITLE}</title>"
        '<meta http-equiv="Content-Type" content="text/html; charset=utf-8" />'
        f'<meta name="ocr-system" content="{HOCR_SYSTEM}" />'
        '<meta name="ocr-capabilities" content="ocr_page ocr_carea ocr_par ocr_line ocrx_word" />'
        "</head><body>"
    )
    return (
        block_xml.groupBy("media_ref", "offset", "height", "width")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list(F.struct("block_rank", "block_xml"))), lambda s: s["block_xml"]),
                "",
            ).alias("body")
        )
        .select(
            "media_ref",
            F.concat(
                F.lit(head),
                F.lit('<div class="ocr_page" id="page_'), F.col("offset"),
                F.lit('" title="image; bbox 0 0 '),
                F.col("width"), F.lit(" "), F.col("height"), F.lit('; ppageno 0">'),
                F.col("body"), F.lit("</div></body></html>"),
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
