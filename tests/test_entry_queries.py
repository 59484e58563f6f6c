"""Driver-contract queries vs their DuckDB oracles at sf0.001.

Replicates the driver's comparison (row count + sorted columns +
order-insensitive value equality) for every oracle-backed query in
__spark_entry__, using the same testdata the driver uses.
"""

import sys

import duckdb
import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# The OCR queries run the full image pipeline (~20 s each on local[4]);
# they're covered by test_pipeline_e2e + the sf0.01 driver gate, so the
# per-query oracle sweep here covers the cheap relational/text/vector ops.
SKIP_SLOW = {"ocr_extract_spans", "ocr_render_text", "ocr_detect_boxes", "media_page_stats"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype.kind == "f":
            out[c] = out[c].astype("float64").round(9)
        out[c] = out[c].astype(str)
    return cols, sorted(map(tuple, out.values.tolist()))


@pytest.mark.parametrize("name", [n for n in entrymod.oracle_sql() if n not in SKIP_SLOW])
def test_query_matches_oracle(spark, duck, name):
    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    want = duck.sql(entrymod.oracle_sql()[name]).df()
    gc, gv = _norm(got)
    wc, wv = _norm(want)
    assert gc == wc
    assert len(gv) == len(wv)
    assert gv == wv


def test_every_query_listed_or_justified():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every non-oracled query must be an image-typed op (documented)
    assert set(qs) - set(oracles) == {"media_page_stats"}


def test_near_dup_groups_chain(spark):
    """Connected components over near-dup pairs: a Jaccard CHAIN
    (doc i ~ doc i+1 at J=19/21, but i !~ i+2) must collapse into one
    group via log-round label propagation with pointer jumping."""
    import pandas as pd
    from pyspark.sql import functions as F

    from onnxtr_spark.functions.dedup import near_dup_groups

    rows = []
    for i in range(10):  # sliding 20-token windows: J(i,i+1)=19/21>=0.9
        rows.append({"doc_id": i, "text": " ".join(f"t{w}" for w in range(i, i + 20))})
    for i in range(3):  # isolated singletons
        rows.append({"doc_id": 100 + i, "text": f"alone{i} solitary{i} unique{i}"})
    docs = spark.createDataFrame(pd.DataFrame(rows))
    out = {r.doc_id: r.group_id for r in near_dup_groups(docs, 0.9).collect()}
    assert all(out[i] == 0 for i in range(10))
    assert all(out[100 + i] == 100 + i for i in range(3))


def test_kmeans_converges_on_separated_clusters(spark):
    """Lloyd rounds recover two well-separated cluster means (init
    vectors 0..k-1 straddle both clusters)."""
    import pandas as pd
    from onnxtr_spark.functions.similarity import kmeans_centroids

    rows = []
    for i in range(20):
        base = 0.0 if i % 2 == 0 else 10.0
        rows.append({"vec_id": i, "embedding": [base + 0.1 * (i % 5), base - 0.05 * (i % 3)]})
    emb = spark.createDataFrame(pd.DataFrame(rows))
    out = kmeans_centroids(emb, k=2, iters=3).collect()
    cents = {}
    for r in out:
        cents.setdefault(r.cell, {})[r.dim] = r.centroid
    c0, c1 = cents[0], cents[1]
    lows = sorted([c0[0], c1[0]])
    assert lows[0] < 1.0 and lows[1] > 9.0  # one centroid per cluster


def test_range_join_window_boundaries(spark, tmp_path):
    """Bucketed range join vs hand-computed truth on edge cases: a
    click exactly at the purchase timestamp (counted), exactly one
    hour before (NOT counted — window is open on the left), one
    microsecond inside the window but in the PREVIOUS hour bucket
    (counted via the second probe key), and another user's click
    (never counted)."""
    import datetime as dt

    from onnxtr_spark.queries.relational import events_range_join

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # event_id, ts, user_id, event_type, value, props
        (1, base, 10, "purchase", 1.0, ""),
        (2, base, 10, "click", 0.0, ""),  # same instant: counted
        (3, base - dt.timedelta(hours=1), 10, "click", 0.0, ""),  # exactly -1h: excluded
        (4, base - dt.timedelta(minutes=59, seconds=59, microseconds=999999), 10, "click", 0.0, ""),
        # ^ 1 us inside the window AND in the 11:00 bucket: needs probe key b-1
        (5, base - dt.timedelta(minutes=30), 99, "click", 0.0, ""),  # other user
        (6, base, 20, "purchase", 1.0, ""),  # no clicks at all -> 0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["event_id"]: r["clicks_1h"] for r in events_range_join(spark, d).collect()}
    assert out == {1: 2, 6: 0}


def test_substring_dup_coverage_intervals(spark):
    """ExactSubstr coverage on a constructed corpus: two docs share an
    80-char passage -> exactly the 41 fully-interior 40-grams are
    duplicated and their interval union is the 80 shared chars (not
    41*40); a unique doc and a too-short doc get zeros; two identical
    docs are covered end-to-end."""
    import hashlib

    from onnxtr_spark.functions.dedup import substring_dup_coverage

    def u(tag, n):  # deterministic unique gibberish, no repeated windows
        out = ""
        i = 0
        while len(out) < n:
            out += hashlib.md5(f"{tag}:{i}".encode()).hexdigest()
            i += 1
        return out[:n]

    shared = u("shared", 80)
    twin = u("twin", 60)
    rows = [
        (0, u("a", 50) + shared + u("a2", 50)),
        (1, u("b", 50) + shared + u("b2", 50)),
        (2, u("c", 120)),
        (3, u("d", 20)),
        (4, twin),
        (5, twin),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dup_coverage(docs, length=40).collect()}
    assert len(out) == 6
    for d in (0, 1):
        assert out[d]["n_grams"] == 141
        assert out[d]["n_dup_pos"] == 41  # windows fully inside the shared span
        assert out[d]["covered_chars"] == 80  # merged, not 41*40
        assert abs(out[d]["dup_frac"] - round(80 / 180, 4)) < 1e-9
    assert out[2]["n_grams"] == 81 and out[2]["covered_chars"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["n_dup_pos"] == 0
    for d in (4, 5):
        assert out[d]["n_dup_pos"] == 21 and out[d]["covered_chars"] == 60
        assert out[d]["dup_frac"] == 1.0


def test_substring_coverage_and_weighted_sample_empty_doc_edges(spark, tmp_path):
    """Edge parity on degenerate docs (absent from the driver corpus):
    an empty doc gets dup_frac 0.0 (not NULL/NaN) in BOTH engines, a
    zero-weight doc is excluded from the weighted sample in BOTH, and
    the chunked position generation is seamless across the 64Ki chunk
    boundary (a dup window straddling it is still found)."""
    import duckdb as ddb
    from pyspark.sql import functions as F

    from onnxtr_spark.functions.dedup import substring_dup_coverage, substring_dup_coverage_sql
    from onnxtr_spark.functions.selection import weighted_sample, weighted_sample_sql

    chunk = 1 << 16
    filler_a = "".join(chr(97 + (i * 7 + i // 26) % 26) for i in range(chunk - 20))
    shared = "Z" * 0  # built below: a 40-char window placed to straddle the boundary
    shared = "qwertyuiopasdfghjklzxcvbnm0123456789abcd"  # 40 chars
    big = filler_a + shared + filler_a[::-1]  # shared spans positions around the chunk edge
    rows = [
        (1, "", "en", "s"),
        (2, big, "en", "s"),
        (3, "prefix one " + shared + " suffix one padding words", "en", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r["doc_id"]: r for r in substring_dup_coverage(docs).collect()}
    assert got[1]["dup_frac"] == 0.0 and got[1]["n_grams"] == 0
    assert got[2]["n_dup_pos"] >= 1 and got[3]["n_dup_pos"] >= 1  # straddling window found

    # cross-engine parity incl. the empty doc
    d = str(tmp_path)
    docs.withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    con = ddb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    want = con.sql(substring_dup_coverage_sql()).df().sort_values("doc_id")
    got_df = substring_dup_coverage(docs).toPandas().sort_values("doc_id")
    assert got_df.reset_index(drop=True).equals(
        want[got_df.columns].reset_index(drop=True).astype(got_df.dtypes.to_dict())
    )

    # weighted sample: the empty (weight-0) doc never appears, engines agree
    docs_n = docs.withColumn("n_chars", F.length("text"))
    ws = weighted_sample(docs_n, k=5).toPandas()
    assert 1 not in set(ws["doc_id"])
    ws_want = con.sql(weighted_sample_sql(k=5)).df()
    assert sorted(ws["doc_id"]) == sorted(ws_want["doc_id"])


def test_substring_coverage_random_property(spark):
    """Property check on adversarially dense corpora: 120 random docs
    over a 2-letter alphabet (dup 8-grams everywhere, intervals merge
    constantly) + short docs below the window — the full Spark output
    must equal an independent pure-python brute force, doc by doc."""
    import math
    import random

    from onnxtr_spark.functions.dedup import substring_dup_coverage

    L = 8
    rng = random.Random(20260817)
    docs = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 120)))) for i in range(120)]

    from collections import Counter

    cnt = Counter()
    for _, t in docs:
        for i in range(len(t) - L + 1):
            cnt[t[i : i + L]] += 1
    expect = {}
    for d, t in docs:
        poss = [i for i in range(len(t) - L + 1) if cnt[t[i : i + L]] >= 2]
        covered = sum(
            L if j == len(poss) - 1 else min(poss[j + 1] - p, L) for j, p in enumerate(poss)
        )
        frac = math.floor(covered / max(len(t), 1) * 10000 + 0.5) / 10000 + 0.0
        expect[d] = (max(len(t) - L + 1, 0), len(poss), covered, frac)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_pos"], r["covered_chars"], r["dup_frac"])
        for r in substring_dup_coverage(df, length=L).collect()
    }
    assert got == expect
