"""Planted-input semantics for the round-5b pipeline ops: anchor-text
aggregation, cohort retention, incremental snapshot dedup, tf-idf
keywords. The cross-engine oracle equality runs in test_entry_queries;
these tests pin the SEMANTICS on inputs where the answer is known by
construction."""

import pandas as pd

from onnxtr_spark.functions import dedup as D
from onnxtr_spark.functions import graph as G
from onnxtr_spark.functions import text as T


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(start_id, start_id + len(texts))), "text": texts})
    )


# --- crawl_anchor_text -------------------------------------------------------


def test_anchor_text_counts_match_edge_list(spark):
    docs = _docs(spark, [f"w{i % 4} body" for i in range(120)])
    out = G.anchor_text(docs).toPandas().set_index("host")
    edges = G.synthesize_host_links(docs).toPandas()
    per = edges.groupby("dst").agg(n_links=("src", "size"), n_src_hosts=("src", "nunique"))
    assert sorted(out.index) == sorted(per.index)
    for h, row in per.iterrows():
        assert out.loc[h, "n_links"] == row["n_links"]
        assert out.loc[h, "n_src_hosts"] == row["n_src_hosts"]


def test_anchor_text_modal_term_and_tiebreak(spark):
    # every doc leads with the same token -> every host's modal anchor is it
    out = G.anchor_text(_docs(spark, ["zzz tail"] * 100)).toPandas()
    assert (out["top_anchor"] == "zzz").all()
    assert (out["top_anchor_n"] == out["n_links"]).all()
    # tie-break: all anchors distinct counts=1 -> lexicographically first wins
    docs2 = _docs(spark, [f"t{i:03d} x" for i in range(50)])
    out2 = G.anchor_text(docs2).toPandas()
    # doc i -> anchor f"t{i:03d}"; recompute modal-with-tiebreak in pandas
    import collections

    links = []
    for d in range(50):
        src = d % G.N_HOSTS
        for e in G._LINK_EXPRS:
            dst = eval(e.format(n=G.N_HOSTS))  # noqa: S307 — planted literal exprs
            if src != dst:
                links.append((dst, f"t{d:03d}"))
    want = {}
    for dst, grp in pd.DataFrame(links, columns=["dst", "a"]).groupby("dst"):
        c = collections.Counter(grp["a"])
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[dst] = best
    got = out2.set_index("host")
    for h, (term, n) in want.items():
        assert got.loc[h, "top_anchor"] == term
        assert got.loc[h, "top_anchor_n"] == n


# --- events_retention_cohorts ------------------------------------------------


def test_retention_offset_zero_is_full_cohort(spark, tmp_path):
    import datetime
    import os

    rows = []
    eid = 0
    # cohort A (week of 2026-01-05): users 0..9; 6 return next week, 3 in week 3
    for u in range(10):
        rows.append((eid, datetime.datetime(2026, 1, 6), u, "click", 1.0, "{}")); eid += 1
    for u in range(6):
        rows.append((eid, datetime.datetime(2026, 1, 13), u, "click", 1.0, "{}")); eid += 1
    for u in range(3):
        rows.append((eid, datetime.datetime(2026, 1, 21), u, "click", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    from onnxtr_spark.queries.relational import events_retention_cohorts

    out = events_retention_cohorts(spark, d).toPandas().sort_values("week_offset")
    assert len(out) == 3
    assert list(out["n_active"]) == [10, 6, 3]
    assert list(out["week_offset"]) == [0, 1, 2]
    assert list(out["retention"]) == [1.0, 0.6, 0.3]


# --- dedup_incremental -------------------------------------------------------


def test_incremental_dedup_drops_prior_hits_and_collapses_new(spark):
    texts = {
        0: "alpha beta",      # prior
        2: "gamma delta",     # prior
        1: "alpha  beta",     # new, ws-normalizes to prior doc 0 -> dropped
        3: "epsilon zeta",    # new, unique -> survives
        5: "eta theta",       # new dup pair with 7 -> one row, n=2
        7: "eta theta",
    }
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    out = D.incremental_dedup(docs).toPandas().set_index("canonical_doc_id")
    assert sorted(out.index) == [3, 5]
    assert out.loc[3, "n_dups_in_new"] == 1
    assert out.loc[5, "n_dups_in_new"] == 2


# --- docs_tfidf_keywords -----------------------------------------------------


def test_tfidf_rare_term_outranks_common_and_stopwords_excluded(spark):
    # 'needle' appears only in doc 0; 'common' in all 10 docs; stopword
    # 'the' everywhere. tf equal within doc 0 -> idf decides.
    docs = _docs(spark, ["the needle common zz"] + ["the common zz yy"] * 9)
    out = T.tfidf_keywords(docs).toPandas()
    d0 = out[out.doc_id == 0].sort_values("rk")
    assert list(d0["term"])[0] == "needle"
    assert "the" not in set(out["term"])
    assert (out.groupby("doc_id")["rk"].max() <= 3).all()
    # idf_micro for needle: (10 * SCALE) div 1; for common: div 10
    n0 = d0.set_index("term")
    assert n0.loc["needle", "tfidf_micro"] == 10 * T.TFIDF_SCALE
    assert n0.loc["common", "tfidf_micro"] == T.TFIDF_SCALE


def test_tfidf_tie_breaks_lexicographically(spark):
    docs = _docs(spark, ["bb aa cc dd"] * 4)  # all terms same tf and df
    out = T.tfidf_keywords(docs).toPandas()
    for _, g in out.groupby("doc_id"):
        assert list(g.sort_values("rk")["term"]) == ["aa", "bb", "cc"]


def test_incremental_bloom_equals_exact_path(spark):
    texts = {
        0: "alpha beta", 2: "gamma delta", 4: "alpha beta",   # prior (w/ internal dup)
        1: "alpha  beta", 3: "epsilon zeta", 5: "eta theta",
        7: "eta theta", 9: "gamma delta", 11: "unique eleven",
    }
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    a = D.incremental_dedup(docs).orderBy("text_hash").toPandas()
    b = D.incremental_dedup_bloom(docs).orderBy("text_hash").toPandas()
    assert a.equals(b)
    assert sorted(b["canonical_doc_id"]) == [3, 5, 11]


def test_incremental_bloom_exact_under_heavy_collisions(spark, monkeypatch):
    """With a 64-bit filter nearly every probe collides (false positives
    everywhere) — the verify join must still return the exact answer."""
    monkeypatch.setattr(D, "BLOOM_BITS", 64)
    texts = [f"doc number {i}" for i in range(60)] + ["doc number 0"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(61)), "text": texts})
    )
    a = D.incremental_dedup(docs).orderBy("text_hash").toPandas()
    b = D.incremental_dedup_bloom(docs).orderBy("text_hash").toPandas()
    assert a.equals(b)


def test_incremental_bloom_plan_shape(spark):
    """The filter side must reach the probe as a BROADCAST (the bloom
    relation is O(m/64) rows regardless of corpus size) and the exact
    anti-join must still be present for the candidate fraction."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = D.incremental_dedup_bloom(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


# --- embedding_knn_classify ---------------------------------------------------


def test_knn_classify_recovers_planted_clusters(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    # 4 well-separated clusters of 10; vec_id % 5 == 0 members are the
    # unlabeled queries and must inherit their cluster's label
    for c in range(4):
        center = np.zeros(8); center[c * 2] = 10.0
        for i in range(10):
            v = center + rng.normal(0, 0.05, 8)
            rows.append((c * 10 + i, [float(x) for x in v], c + 100))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    from onnxtr_spark.functions.similarity import knn_classify

    out = knn_classify(emb).toPandas().set_index("vec_id")
    assert len(out) == 8  # vec_ids 0,5,10,...,35
    for vid, row in out.iterrows():
        assert row["pred_label"] == (vid // 10) + 100
        assert row["n_votes"] == 5  # unanimous within the cluster


def test_knn_classify_vote_tiebreak_prefers_smaller_label(spark):
    # one query equidistant from two 2-member clusters + 1 far decoy:
    # k=5 -> votes 2:2:1, tie broken to the smaller label
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0], 0),      # query (label ignored)
        (1, [1.0, 0.0, 0.0, 0.0], 7), (2, [1.0, 0.0, 0.0, 0.0], 7),
        (3, [0.0, 1.0, 0.0, 0.0], 3), (4, [0.0, 1.0, 0.0, 0.0], 3),
        (6, [0.0, 0.0, 0.0, 1.0], 9),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    from onnxtr_spark.functions.similarity import knn_classify

    out = knn_classify(emb).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["pred_label"] == 3 and out.iloc[0]["n_votes"] == 2


# --- events_markov_transitions ------------------------------------------------


def test_markov_transitions_counts_and_rows_sum_to_one(spark, tmp_path):
    import datetime
    import os

    rows = []
    seq = ["view", "view", "cart", "view", "buy"]  # view->view, view->cart, cart->view, view->buy
    for i, et in enumerate(seq):
        rows.append((i, datetime.datetime(2026, 1, 1, 0, i), 1, et, 1.0, "{}"))
    # second user: buy -> view (crosses users must NOT pair)
    rows.append((10, datetime.datetime(2026, 1, 1), 2, "buy", 1.0, "{}"))
    rows.append((11, datetime.datetime(2026, 1, 2), 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    from onnxtr_spark.queries.relational import events_markov_transitions

    out = events_markov_transitions(spark, d).toPandas()
    m = {(r.event_type, r.next_type): (r.n, r.p) for r in out.itertuples()}
    assert m[("view", "view")][0] == 1 and m[("view", "cart")][0] == 1
    assert m[("view", "buy")][0] == 1 and m[("cart", "view")][0] == 1
    assert m[("buy", "view")][0] == 1  # user 2's pair; no cross-user pair
    assert abs(m[("view", "view")][1] - 0.3333) < 1e-9  # 1/3 row-normalized
    # each row of the matrix sums to ~1
    sums = out.groupby("event_type")["p"].sum()
    assert ((sums - 1.0).abs() < 0.001).all()


# --- events_cms_user_counts ---------------------------------------------------


def test_cms_overestimates_never_under_and_exact_when_sparse(spark, tmp_path):
    """Count-min invariant: est >= exact for every key; with far fewer
    keys than WIDTH and DEPTH=3 independent rows, a planted skew key's
    estimate is exact (no collision across all 3 rows)."""
    import datetime
    import os

    rows = []
    eid = 0
    for u in range(20):
        for _ in range(3 if u else 50):  # user 0 is the heavy hitter
            rows.append((eid, datetime.datetime(2026, 1, 1), u, "click", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    from onnxtr_spark.queries.relational import events_cms_user_counts

    out = events_cms_user_counts(spark, d).toPandas().set_index("user_id")
    assert (out["cms_est"] >= out["n_exact"]).all()
    assert out.loc[0, "n_exact"] == 50
    # 20 keys in 256 columns x 3 rows: collision across ALL rows is
    # (20/256)^3-unlikely per key; the planted corpus has none
    assert (out["cms_est"] == out["n_exact"]).all()


# --- text_normalize / docs_chunk_sliding / events_value_zscore --------------


def test_normalize_text_collapses_case_and_punct(spark):
    out = (
        T.normalize_text(
            _docs(spark, ["Hello,   WORLD!!", "hello world", "###", "plain text"])
        )
        .toPandas()
        .set_index("doc_id")
    )
    # casing/punctuation variants of the same words share a norm_hash
    assert out.loc[0, "norm_hash"] == out.loc[1, "norm_hash"]
    assert out.loc[0, "n_norm_tokens"] == 2 and out.loc[0, "n_norm_chars"] == 11
    # all-symbol doc normalizes to empty: 0 chars, 0 tokens, frac 1.0
    assert out.loc[2, "n_norm_chars"] == 0 and out.loc[2, "n_norm_tokens"] == 0
    assert out.loc[2, "removed_frac"] == 1.0
    assert out.loc[3, "removed_frac"] == 0.0


def test_chunk_sliding_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))  # 100 tokens
    out = (
        T.chunk_sliding(_docs(spark, [text]), win=64, stride=48)
        .toPandas()
        .sort_values("chunk_idx")
        .reset_index(drop=True)
    )
    assert list(out["start_tok"]) == [0, 48, 96]
    assert list(out["n_chunk_toks"]) == [64, 52, 4]
    assert list(out["chunk_idx"]) == [0, 1, 2]
    # identical token windows hash identically across docs
    out2 = T.chunk_sliding(_docs(spark, [text, text], start_id=10), win=64, stride=48).toPandas()
    h = out2.groupby("chunk_idx")["chunk_hash"].nunique()
    assert (h == 1).all()


def test_events_value_zscore_flags_planted_outlier(spark, tmp_path):
    import numpy as np

    from onnxtr_spark.queries import relational as R

    vals = [10.0] * 19 + [300.0]
    pdf = pd.DataFrame(
        {
            "event_id": range(20),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": [1] * 20,
            "event_type": ["click"] * 20,
            "value": vals,
            "props": ["{}"] * 20,
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = R.events_value_zscore(spark, str(tmp_path)).toPandas()
    # only the planted outlier clears |z| >= 2
    assert list(out["event_id"]) == [19] and list(out["value"]) == [300.0]
    c = np.array([round(v * 100) for v in vals], dtype=np.int64)
    z = (20 * c[19] - c.sum()) / np.sqrt(20 * (c * c).sum() - c.sum() ** 2)
    assert abs(out["z"].iloc[0] - np.floor(z * 10000 + 0.5) / 10000) < 1e-12


def test_normalize_dedup_collapses_variants_raw_dedup_misses(spark):
    docs = _docs(spark, ["Hello, World!", "hello   world", "HELLO WORLD", "other doc"])
    out = T.normalize_dedup(docs).toPandas()
    assert len(out) == 2  # 3 variants collapse; raw exact dedup keeps all 4
    grp = out[out["n_docs"] == 3]
    assert len(grp) == 1 and grp["canonical_doc_id"].iloc[0] == 0
    raw = D.exact_dedup(docs).toPandas()
    assert (raw["n_docs"] == 1).all()
    # joinable with normalize_text through the shared hash seed
    nt = T.normalize_text(docs).toPandas()
    assert set(out["norm_hash"]) == set(nt["norm_hash"])
