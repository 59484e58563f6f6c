"""Host-graph PageRank: conservation, hub dominance, determinism."""

import pandas as pd
from pyspark.sql import functions as F

from onnxtr_spark.functions import graph as G


def _docs(spark, n=200):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(n)), "text": ["x"] * n})
    )


def test_edges_have_no_self_loops_and_three_maps(spark):
    e = G.synthesize_host_links(_docs(spark)).toPandas()
    assert (e["src"] != e["dst"]).all()
    # 200 docs x 3 links minus dropped self-loops
    assert 500 < len(e) <= 600


def test_pagerank_mass_approximately_conserved(spark):
    pr = G.host_pagerank(_docs(spark)).toPandas()
    total = pr["pagerank_nano"].sum()
    # integer div truncation loses < (n_hosts + edges) units per round
    assert abs(total - G.PR_SCALE) < 10_000


def test_hub_hosts_outrank_the_tail(spark):
    pr = G.host_pagerank(_docs(spark)).toPandas().set_index("host")
    hubs = pr.loc[[h for h in range(10) if h in pr.index], "pagerank_nano"].mean()
    tail = pr.loc[[h for h in pr.index if h >= 10], "pagerank_nano"].mean()
    assert hubs > 2 * tail  # hosts 0..9 absorb the d % 10 link per doc


def test_pagerank_deterministic_across_partitionings(spark):
    docs = _docs(spark)
    a = G.host_pagerank(docs).orderBy("host").toPandas()
    b = G.host_pagerank(docs.repartition(17)).orderBy("host").toPandas()
    assert a.equals(b)  # integer arithmetic: no partition-order drift


def test_frontier_schedule_politeness_and_priority(spark):
    out = G.frontier_schedule(_docs(spark, 150)).toPandas()
    assert len(out) == 150
    # politeness: within any round, a host appears at most once
    per = out.groupby(["fetch_round", "host"]).size()
    assert (per == 1).all()
    # rounds per host are 1..k contiguous (a host's queue is sequential)
    for _, g in out.groupby("host"):
        assert sorted(g["fetch_round"]) == list(range(1, len(g) + 1))
    # priority: within round 1, rank order follows pagerank desc
    pr = G.host_pagerank(_docs(spark, 150)).toPandas().set_index("host")["pagerank_nano"]
    r1 = out[out.fetch_round == 1].sort_values("rank_in_round")
    ranks = [pr[h] for h in r1["host"]]
    assert all(a >= b for a, b in zip(ranks, ranks[1:]))


# --- HyperLogLog (lives with the other exact-integer sketch tests) ----------


def test_hll_estimates_within_error_and_merge_dominates(spark):
    from onnxtr_spark.queries.relational import events_hll_distinct

    out = events_hll_distinct(spark, "/root/testdata/sf0.001").toPandas().set_index("scope")
    # every estimate within ~3 sigma of HLL's 1.04/sqrt(256) = 6.5%
    rel_err = (out["hll_est"] - out["n_exact"]).abs() / out["n_exact"]
    assert (rel_err < 0.25).all(), rel_err.to_dict()
    # register-wise-max merge: the union estimate dominates every part
    parts = out.drop(index="__all__")
    assert out.loc["__all__", "hll_est"] >= parts["hll_est"].max() - 1e-9
    # and the union exact is below the sum (types share user-days)
    assert out.loc["__all__", "n_exact"] <= parts["n_exact"].sum()


def test_hll_small_range_linear_counting(spark):
    from onnxtr_spark.queries.relational import events_hll_distinct

    # 12 distinct user-days, far below 2.5*m: the m*ln(m/V) branch fires
    # and linear counting is near-exact at this occupancy
    import datetime

    rows = [(i, datetime.datetime(2026, 1, 1), i % 12, "click", 1.0, "{}")
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    df.createOrReplaceTempView("___hll_tmp")
    import os, tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = events_hll_distinct(spark, d).toPandas().set_index("scope")
    assert out.loc["click", "n_exact"] == 12
    assert abs(out.loc["click", "hll_est"] - 12) < 1.0


def test_theta_intersection_exact_when_sketch_holds_everything(spark):
    """A side with fewer distinct values than k is an EXACT sketch
    (theta = whole space), so the pairwise estimate degenerates to the
    true intersection count."""
    import datetime

    from onnxtr_spark.queries.relational import THETA_K, events_theta_intersection

    # 30 users on one day: types 'a' sees users 0..19, 'b' sees 10..29
    rows = []
    eid = 0
    for u in range(20):
        rows.append((eid, datetime.datetime(2026, 1, 1), u, "a", 1.0, "{}")); eid += 1
    for u in range(10, 30):
        rows.append((eid, datetime.datetime(2026, 1, 1), u, "b", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    import os, tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    assert 20 < THETA_K
    out = events_theta_intersection(spark, d).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_exact_inter"] == 10 and r["est_inter"] == 10.0
