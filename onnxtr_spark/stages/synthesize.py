"""S9 synthesis sink stage: word rows → re-drawn page images.

The reference's Page.synthesize (io/elements.py:289-298) redraws a page
from its predictions. Spark shape: words are already keyed by
media_ref, so one JVM-side groupBy collects each page's words into an
array and a single ``mapInPandas`` draws pages (Arrow-batched; no
per-group applyInPandas overhead). Output matches the media-table
schema, so a synthesized corpus feeds straight back into the extraction
pipeline — the fixpoint property tested in tests/test_synthesize.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onnxtr_spark import imaging
from onnxtr_spark.stages.ingest import MEDIA_SCHEMA


def synthesize_pages(words: DataFrame, page_dims: DataFrame) -> DataFrame:
    """(media_ref, png, height, width) redrawn from word rows.

    ``words``: the fused/recognize stage output (media_ref, text,
    xmin, ymin, ...). ``page_dims``: (media_ref, height, width).
    """
    grouped = (
        words.groupBy("media_ref")
        .agg(F.collect_list(F.struct("text", "xmin", "ymin")).alias("ws"))
        .join(page_dims.select("media_ref", "height", "width"), "media_ref")
    )

    def draw(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for media_ref, ws, height, width in zip(
                pdf["media_ref"], pdf["ws"], pdf["height"], pdf["width"]
            ):
                triples = [(w["text"], float(w["xmin"]), float(w["ymin"])) for w in ws]
                img = imaging.synthesize_page(triples, int(height), int(width))
                rows.append({
                    "media_ref": media_ref,
                    "png": imaging.encode_image(img),
                    "height": int(height),
                    "width": int(width),
                })
            yield pd.DataFrame(rows, columns=["media_ref", "png", "height", "width"])

    return grouped.mapInPandas(draw, schema=MEDIA_SCHEMA)
