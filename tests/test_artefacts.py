"""Artefact detector (I6) + NMS (F6) tests — reference
contrib/artefacts.py:17-104 semantics with the deterministic stub."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from onnxtr_spark import imaging
from onnxtr_spark.corpus import FIXTURE_TEXTS, artefacts_for, build_corpus_pdfs
from onnxtr_spark.engine import ARTEFACT_LABELS, ArtefactEngine
from onnxtr_spark.kernels.nms import nms_boxes
from onnxtr_spark.stages.artefacts import detect_artefacts
from onnxtr_spark.stages.pipeline import extract_spans, media_pages
from tests.test_pipeline_e2e import DOCS_SCHEMA, MEDIA_SCHEMA, golden_flat


def test_nms_suppresses_overlaps_keeps_disjoint():
    boxes = np.array([
        [0, 0, 10, 10],    # best
        [1, 1, 11, 11],    # IoU ~0.68 with best -> suppressed
        [50, 50, 60, 60],  # disjoint -> kept
        [0, 0, 10, 10],    # below score threshold -> dropped
    ], dtype=float)
    scores = np.array([0.9, 0.8, 0.7, 0.3])
    keep = nms_boxes(boxes, scores, 0.5, 0.5)
    assert keep == [0, 2]


def test_nms_tie_breaks_by_index_and_boundary_iou():
    # equal scores: stable sort keeps the lower index first
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=float)
    keep = nms_boxes(boxes, np.array([0.8, 0.8]), 0.5, 0.5)
    assert keep == [0]
    # IoU exactly at threshold is NOT suppressed (strict >)
    half = np.array([[0, 0, 10, 10], [0, 0, 10, 5]], dtype=float)  # IoU = 0.5
    keep = nms_boxes(half, np.array([0.9, 0.8]), 0.1, 0.5)
    assert keep == [0, 1]
    assert nms_boxes(np.zeros((0, 4)), np.zeros(0), 0.5, 0.5) == []


def test_artefact_engine_contract():
    page = imaging.render_page([["hello", "world"]])
    arts = [(0, 8, 4, 64, 24), (2, 88, 4, 64, 24)]
    img = imaging.add_artefacts(page, arts)
    rows = ArtefactEngine().run_one(img)
    # 2 true + 2 duplicates + 1 low-conf background
    assert rows.shape == (5, 8)
    h, w = img.shape[:2]
    true0 = rows[0]
    assert true0[4] == pytest.approx(0.55)  # class 0 confidence
    # cx back-projected = artefact center
    assert true0[0] * w / 1024 == pytest.approx(8 + 32)
    assert true0[2] * w / 1024 == pytest.approx(64)


def test_artefacts_invisible_to_text_path(spark):
    """Pages with artefact blocks produce byte-identical span output
    (artefact pixel values sit above the detection cutoff)."""
    docs_pdf, media_pdf = build_corpus_pdfs(FIXTURE_TEXTS)
    rows = []
    for r in media_pdf.itertuples():
        img = imaging.decode_image(r.png)
        doc_id, page = r.media_ref[2:].rsplit("-", 1)
        img = imaging.add_artefacts(np.asarray(img), artefacts_for(doc_id, int(page)))
        rows.append({
            "media_ref": r.media_ref, "png": imaging.encode_image(img),
            "height": img.shape[0], "width": img.shape[1],
        })
    docs = spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA)
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    got = (
        extract_spans(docs, media).toPandas()
        .sort_values(["doc_id", "offset"]).reset_index(drop=True)
    )
    exp = golden_flat().sort_values(["doc_id", "offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns].astype(str), exp.astype(str))


def test_detect_artefacts_stage(spark):
    docs_pdf, media_pdf = build_corpus_pdfs(FIXTURE_TEXTS)
    rows = []
    for r in media_pdf.itertuples():
        img = imaging.decode_image(r.png)
        doc_id, page = r.media_ref[2:].rsplit("-", 1)
        img = imaging.add_artefacts(np.asarray(img), artefacts_for(doc_id, int(page)))
        rows.append({
            "media_ref": r.media_ref, "png": imaging.encode_image(img),
            "height": img.shape[0], "width": img.shape[1],
        })
    docs = spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA)
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    out = detect_artefacts(media_pages(docs, media)).toPandas()

    # expected: exactly the true artefacts survive (dups NMS'd, low-conf filtered)
    exp_count = 0
    for r in media_pdf.itertuples():
        doc_id, page = r.media_ref[2:].rsplit("-", 1)
        arts = artefacts_for(doc_id, int(page))
        exp_count += len(arts)
        got_page = out[out.media_ref == r.media_ref].sort_values("xmin")
        assert len(got_page) == len(arts)
        img_h, img_w = r.height, r.width
        for (cls, x0, y0, w_a, h_a), row in zip(arts, got_page.itertuples()):
            assert row.label == ARTEFACT_LABELS[cls]
            assert row.confidence == pytest.approx(0.55 + 0.1 * cls)
            # int-truncated roundtrip lands within 1 px of the drawn block
            assert abs(row.xmin - x0) <= 1 and abs(row.xmax - (x0 + w_a)) <= 1
            assert abs(row.ymin - y0) <= 1 and abs(row.ymax - (y0 + h_a)) <= 1
    assert len(out) == exp_count > 0
