"""I5/G4 analog: pages stored rotated are classified and rectified
before detection; span output equals the straight-page golden."""

import numpy as np
import pandas as pd

from onnxtr_spark import imaging
from onnxtr_spark.corpus import FIXTURE_TEXTS, build_rotated_corpus_pdfs, rotation_for
from onnxtr_spark.stages.detect import DetectConfig
from onnxtr_spark.stages.pipeline import extract_spans
from tests.test_pipeline_e2e import DOCS_SCHEMA, MEDIA_SCHEMA, golden_flat


def test_orientation_classifier_stub():
    page = imaging.add_orientation_mark(imaging.render_page([["hello", "world"]]))
    for k in range(4):
        rotated = np.ascontiguousarray(np.rot90(page, k))
        assert imaging.detect_orientation(rotated) == k
    # unmarked page -> assumed straight
    assert imaging.detect_orientation(imaging.render_page([["x"]])) == 0


def test_rotated_corpus_span_equality(spark):
    docs_pdf, media_pdf = build_rotated_corpus_pdfs(FIXTURE_TEXTS)
    assert any(rotation_for(d, 0) for d, _ in FIXTURE_TEXTS)  # variant is non-trivial
    docs = spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA)
    media = spark.createDataFrame(media_pdf, schema=MEDIA_SCHEMA)
    got = (
        extract_spans(docs, media, det_cfg=DetectConfig(straighten_pages=True))
        .toPandas()
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )
    want = golden_flat().sort_values(["doc_id", "offset"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["doc_id", "offset", "kind", "text", "media_ref"]].astype(str), want.astype(str)
    )
