"""Fused detect+recognize must be row-identical to the chained stages."""

from onnxtr_spark.corpus import FIXTURE_TEXTS, build_corpus_pdfs
from onnxtr_spark.stages.pipeline import extract_spans
from tests.test_pipeline_e2e import DOCS_SCHEMA, MEDIA_SCHEMA


def test_fused_equals_unfused(spark):
    docs_pdf, media_pdf = build_corpus_pdfs(FIXTURE_TEXTS[:3])
    docs = spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA)
    media = spark.createDataFrame(media_pdf, schema=MEDIA_SCHEMA)
    fused = extract_spans(docs, media, fused=True)
    chained = extract_spans(docs, media, fused=False)
    assert fused.exceptAll(chained).count() == 0
    assert chained.exceptAll(fused).count() == 0
