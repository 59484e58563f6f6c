"""loc_preds hooks (reference add_hook, models/predictor/base.py:204-210):
a box transform installed in DetectConfig runs inside the executor stage."""

import numpy as np
from pyspark.sql import functions as F

from onnxtr_spark.corpus import FIXTURE_TEXTS, build_corpus_pdfs
from onnxtr_spark.stages.detect import DetectConfig
from onnxtr_spark.stages.pipeline import extract_spans, media_pages
from onnxtr_spark.stages.fused import detect_recognize_pages
from tests.test_pipeline_e2e import DOCS_SCHEMA, MEDIA_SCHEMA


def test_hook_runs_in_stage(spark):
    # closures: cloudpickle serializes them by value, so the hook ships
    # to executors without the test module being importable there
    def drop_all_boxes(boxes: np.ndarray) -> np.ndarray:
        return boxes[:0]

    def keep_first_box(boxes: np.ndarray) -> np.ndarray:
        return boxes[:1]

    docs_pdf, media_pdf = build_corpus_pdfs(FIXTURE_TEXTS[:2])
    docs = spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA)
    media = spark.createDataFrame(media_pdf, schema=MEDIA_SCHEMA)

    base = extract_spans(docs, media)
    none = extract_spans(docs, media, det_cfg=DetectConfig(hooks=(drop_all_boxes,)))
    # with all boxes dropped only the pass-through header spans remain
    assert none.count() == 2
    assert base.count() > 2

    pages = media_pages(docs, media)
    one = detect_recognize_pages(pages, det_cfg=DetectConfig(hooks=(keep_first_box,)))
    per_page = one.groupBy("media_ref").count().collect()
    assert per_page and all(r["count"] == 1 for r in per_page)
