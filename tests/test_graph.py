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
