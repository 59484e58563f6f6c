"""Property tests: builder invariants on random inputs (the reference's
test strategy category 2 — random inputs + invariant assertions), plus a
drift guard between the corpus generator and the OCR oracle SQL."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from onnxtr_spark.corpus import expected_spans
from onnxtr_spark.kernels.builder import resolve_lines, word_order


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 40), st.integers(0, 2**31 - 1))
def test_resolve_lines_is_partition(n, seed):
    rng = np.random.RandomState(seed)
    x0 = rng.rand(n) * 0.8
    y0 = rng.rand(n) * 0.8
    boxes = np.stack([x0, y0, x0 + 0.02 + rng.rand(n) * 0.15, y0 + 0.02 + rng.rand(n) * 0.05], axis=1)
    lines = resolve_lines(boxes)
    flat = [i for line in lines for i in line]
    assert sorted(flat) == list(range(n))  # every box exactly once
    for line in lines:  # within a line, sorted by xmin (resolve_sub_lines)
        xs = boxes[line, 0]
        assert (np.diff(xs) >= 0).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 30), st.integers(0, 2**31 - 1))
def test_word_order_is_permutation(n, seed):
    rng = np.random.RandomState(seed)
    x0 = rng.rand(n) * 0.8
    y0 = rng.rand(n) * 0.8
    boxes = np.stack([x0, y0, x0 + 0.05, y0 + 0.05], axis=1)
    rank, line_id = word_order(boxes)
    assert sorted(rank.tolist()) == list(range(n))
    # ranks within a line are contiguous
    for li in np.unique(line_id):
        rs = sorted(rank[line_id == li].tolist())
        assert rs == list(range(rs[0], rs[0] + len(rs)))


def test_corpus_expected_spans_match_oracle_sql():
    """Drift guard: corpus.expected_spans (the pytest golden) must equal
    the DuckDB OCR_SPANS_SQL derivation (the driver oracle) on arbitrary
    texts — they are two expressions of the same contract."""
    import __spark_entry__ as em

    rows = [
        (0, "alpha beta gamma"),
        (1, " ".join(f"w{i}" for i in range(75))),  # multi-page
        (2, "single"),
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = con.sql(em.OCR_SPANS_SQL).df().sort_values(["doc_id", "offset"]).reset_index(drop=True)
    want_rows = []
    for doc_id, text in rows:
        for s in expected_spans(str(doc_id), text):
            want_rows.append({"doc_id": str(doc_id), **s})
    want = (
        pd.DataFrame(want_rows)[["doc_id", "offset", "kind", "text", "media_ref"]]
        .sort_values(["doc_id", "offset"]).reset_index(drop=True)
    )
    got["offset"] = got["offset"].astype(int)
    pd.testing.assert_frame_equal(got[["doc_id", "offset", "kind", "text", "media_ref"]], want)
