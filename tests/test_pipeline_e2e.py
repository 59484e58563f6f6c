"""End-to-end span-sequence equality (the north_rule invariant).

Per doc_id, the pipeline's output spans must equal the golden spans
(kind, text, media_ref, order) exactly — FIXTURES.md §3. The golden
spans come from the corpus generator's ground truth: the renderer and
the stub models are deterministic inverses, so any pipeline defect
(detection, cropping, split/merge, CTC, ordering, assembly) breaks
equality.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, IntegerType, StringType, StructField, StructType,
)

from onnxtr_spark.corpus import FIXTURE_TEXTS, build_corpus_pdfs, expected_spans
from onnxtr_spark.stages.build import render_text, to_doc_spans
from onnxtr_spark.stages.pipeline import extract_spans

DOCS_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("spans", ArrayType(StructType([
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]))),
])
MEDIA_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("png", BinaryType()),
    StructField("height", IntegerType()),
    StructField("width", IntegerType()),
])


@pytest.fixture(scope="module")
def corpus(spark):
    docs_pdf, media_pdf = build_corpus_pdfs(FIXTURE_TEXTS)
    docs = spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA)
    media = spark.createDataFrame(media_pdf, schema=MEDIA_SCHEMA)
    return docs, media


@pytest.fixture(scope="module")
def result_spans(corpus):
    docs, media = corpus
    return extract_spans(docs, media).toPandas()


def golden_flat() -> pd.DataFrame:
    rows = []
    for doc_id, text in FIXTURE_TEXTS:
        for s in expected_spans(doc_id, text):
            rows.append({"doc_id": doc_id, **s})
    return pd.DataFrame(rows)[["doc_id", "offset", "kind", "text", "media_ref"]]


def test_span_sequence_equality(result_spans):
    got = result_spans.sort_values(["doc_id", "offset"]).reset_index(drop=True)
    want = golden_flat().sort_values(["doc_id", "offset"]).reset_index(drop=True)
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(
        got[["doc_id", "offset", "kind", "text", "media_ref"]].astype(str).reset_index(drop=True),
        want.astype(str).reset_index(drop=True),
    )


def test_offsets_dense_per_doc(result_spans):
    for doc_id, grp in result_spans.groupby("doc_id"):
        offs = sorted(grp["offset"].tolist())
        assert offs == list(range(len(offs))), doc_id


def test_nested_export_shape(corpus, spark):
    docs, media = corpus
    nested = to_doc_spans(extract_spans(docs, media))
    assert [f.name for f in nested.schema["spans"].dataType.elementType.fields] == [
        "kind", "text", "media_ref", "offset",
    ]
    row = nested.where(F.col("doc_id") == "doc-0004").collect()[0]
    assert [s["text"] for s in row["spans"]] == ["doc:doc-0004", "single"]


def test_render_text_sink(corpus, spark):
    docs, media = corpus
    rendered = {r["doc_id"]: r["rendered"] for r in render_text(extract_spans(docs, media)).collect()}
    assert rendered["doc-0001"] == "doc:doc-0001 " + FIXTURE_TEXTS[0][1]
