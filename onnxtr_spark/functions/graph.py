"""Host-graph PageRank (crawl-prioritization ranking).

Crawl curation ranks domains by link authority — PageRank over the
host graph decides fetch priority and is a standard quality prior
(e.g. Common Crawl publishes host-level harmonic-centrality/PageRank
ranks). This is the canonical *iterative* distributed workload: K
rounds of (ranks ⋈ edges on src) → per-dst sum — exactly the shape
Spark's join/groupBy engine is built for.

Cross-engine exactness: ranks live in INTEGER NANO units (BIGINT).
Every operation is integer arithmetic — `div` for the per-edge
contribution split and the damping factor (85/100) — so Spark and
DuckDB agree bit-for-bit with NO rounding seam at any iteration (the
float recipe elsewhere in this repo rounds each round boundary; here
there is nothing to round). All quantities are non-negative, which
sidesteps the Spark-`div`-vs-DuckDB-`//` negative-operand sign
difference.

Scale shape: edges are partitioned once; each round is one equi-join
(ranks broadcast while the host set is small; shuffled by src when it
isn't) plus one map-side-combined groupBy(dst) — never a collect, and
the rank relation stays O(hosts), not O(edges). At 10^12 docs the
host graph is ~10^8 rows — still a broadcast-able side relation.

The link set is synthesized deterministically from doc_ids at the
host level (three out-links per doc via affine maps mod the host
count), the same planted-input pattern as ``urls.synthesize_raw_urls``
— the engine under test and the oracle derive the identical graph
from the documents table alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from onnxtr_spark.partitioning import spread
from onnxtr_spark.sources.warc import N_HOSTS

PR_ITERS = 5
PR_SCALE = 1_000_000_000  # nano units
# three out-links per doc: a uniform affine backbone (keeps the graph
# connected), a quadratic map (non-uniform in-degree), and a hub map
# (hosts 0..9 absorb 5x the links — real crawl graphs are heavy-tailed).
# Every map reduces d mod n FIRST: (d %% n)^2 == d^2 (mod n) with no
# int64 overflow at any doc_id (Spark wraps silently on overflow while
# DuckDB errors — the maps must never get near the seam).
_LINK_EXPRS = (
    "((d % {n}) * 7 + 11) % {n}",
    "((d % {n}) * (d % {n}) + 3) % {n}",
    "d % 10",
)


def synthesize_host_links(documents: DataFrame) -> DataFrame:
    """(src, dst) host-id edge list, multi-edges kept (link weight =
    link count, as a real crawl graph would); self-loops dropped on
    both engines."""
    rows = (
        spread(documents)
        .select(F.col("doc_id").cast("long").alias("d"))
        .select(
            F.expr(f"d % {N_HOSTS}").alias("src"),
            F.explode(
                F.array(*[F.expr(e.format(n=N_HOSTS)) for e in _LINK_EXPRS])
            ).alias("dst"),
        )
    )
    return rows.where(F.col("src") != F.col("dst"))


def host_pagerank(documents: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """PageRank over the synthesized host graph in exact integer nanos.

    init:  rank = SCALE div n            (n = hosts present in the graph)
    step:  contrib(edge) = rank(src) div out_deg(src)
           rank'(h) = (15 * SCALE) div (100 * n)
                      + (85 * sum contrib into h) div 100
    Output (host, pagerank_nano) — BIGINT, bit-identical cross-engine.
    """
    edges = synthesize_host_links(documents).localCheckpoint(eager=False)
    hosts = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    n = hosts.count()  # control-plane scalar (host count, not data volume)
    base = (15 * PR_SCALE) // (100 * n)
    ranks = hosts.select("host", F.lit(PR_SCALE // n).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            edges.join(F.broadcast(ranks.withColumnRenamed("host", "src")), "src")
            .join(F.broadcast(deg), "src")
            .select("dst", F.expr("rank div out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            hosts.join(contrib.withColumnRenamed("dst", "host"), "host", "left")
            .select(
                "host",
                (
                    F.lit(base) + F.expr("(85 * coalesce(inflow, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
        )
    return ranks.select(F.col("host").cast("long").alias("host"), F.col("rank").alias("pagerank_nano"))


def host_pagerank_sql(iters: int = PR_ITERS) -> str:
    """DuckDB oracle: the same graph and the same integer rounds,
    unrolled as CTE layers (the kmeans-oracle pattern)."""
    links = " UNION ALL ".join(
        f"SELECT d % {N_HOSTS} AS src, {e.format(n=N_HOSTS)} AS dst FROM docs"
        for e in _LINK_EXPRS
    )
    ctes = [
        "docs AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents)",
        f"edges AS MATERIALIZED (SELECT src, dst FROM ({links}) WHERE src <> dst)",
        "hosts AS MATERIALIZED (SELECT DISTINCT src AS host FROM edges "
        "UNION SELECT DISTINCT dst FROM edges)",
        "deg AS MATERIALIZED (SELECT src, count(*) AS out_deg FROM edges GROUP BY 1)",
        "n AS (SELECT count(*) AS n FROM hosts)",
        f"r0 AS (SELECT host, CAST({PR_SCALE} AS BIGINT) // n AS rank FROM hosts, n)",
    ]
    prev = "r0"
    for it in range(1, iters + 1):
        ctes.append(f"""c{it} AS (
  SELECT e.dst, sum(r.rank // g.out_deg) AS inflow
  FROM edges e JOIN {prev} r ON r.host = e.src JOIN deg g ON g.src = e.src
  GROUP BY 1
)""")
        ctes.append(f"""r{it} AS (
  SELECT h.host,
         (15 * CAST({PR_SCALE} AS BIGINT)) // (100 * n.n) + (85 * coalesce(c.inflow, CAST(0 AS BIGINT))) // 100 AS rank
  FROM hosts h CROSS JOIN n LEFT JOIN c{it} c ON c.dst = h.host
)""")
        prev = f"r{it}"
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT CAST(host AS BIGINT) AS host, CAST(rank AS BIGINT) AS pagerank_nano FROM {prev}
"""


def frontier_schedule(documents: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling: emit every pending
    URL with a (fetch_round, rank_in_round) slot such that no host is
    fetched twice in one round (politeness) and within a round hosts
    are served by PageRank authority (priority). The crawl layer's
    composition query: canonical URLs -> host PageRank -> schedule.

    fetch_round  = row_number over the host's own docs (by doc_id);
    rank_in_round = row_number within the round by (pagerank desc,
    host, doc_id). All-integer inputs -> bit-identical cross-engine.

    Scale shape: PageRank's rank relation is O(hosts) and broadcasts
    into the doc-level join; the per-host window is the politeness
    semantic itself (a host's queue IS sequential); the per-round
    window orders only #hosts rows per round. At 10^12 URLs a real
    frontier shards each host queue by range and assigns rounds
    arithmetically (offset + local row number) — same semantics, no
    global window; this exact form is the oracle-checkable contract.
    """
    d = spread(documents).select(F.col("doc_id").cast("long").alias("doc_id"))
    urls = d.select("doc_id", F.expr(f"doc_id % {N_HOSTS}").alias("host"))
    pr = host_pagerank(documents, iters)
    w_host = Window.partitionBy("host").orderBy("doc_id")
    w_round = Window.partitionBy("fetch_round").orderBy(
        F.desc("pagerank_nano"), F.asc("host"), F.asc("doc_id")
    )
    return (
        urls.join(F.broadcast(pr), "host")
        .withColumn("fetch_round", F.row_number().over(w_host))
        .withColumn("rank_in_round", F.row_number().over(w_round))
        .select("doc_id", "host", "fetch_round", "rank_in_round")
    )


def frontier_schedule_sql(iters: int = PR_ITERS) -> str:
    """DuckDB oracle: the PageRank CTE stack verbatim plus the same two
    windows."""
    return f"""
WITH pr AS MATERIALIZED (
  SELECT * FROM ({host_pagerank_sql(iters)})
), urls AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(doc_id AS BIGINT) % {N_HOSTS} AS host
  FROM documents
), rounds AS (
  SELECT u.doc_id, u.host, p.pagerank_nano,
         row_number() OVER (PARTITION BY u.host ORDER BY u.doc_id) AS fetch_round
  FROM urls u JOIN pr p ON p.host = u.host
)
SELECT doc_id, host, CAST(fetch_round AS BIGINT) AS fetch_round,
       CAST(row_number() OVER (PARTITION BY fetch_round
                               ORDER BY pagerank_nano DESC, host ASC, doc_id ASC) AS BIGINT)
       AS rank_in_round
FROM rounds
"""


def anchor_text(documents: DataFrame) -> DataFrame:
    """Per-target-host anchor-text aggregation: for every in-link, the
    linking page contributes its anchor term (modeled as the page's
    leading token — deterministic from the corpus, like the rest of
    the planted link graph); each target host gets its in-link count,
    distinct linking-host count, and modal anchor term. Anchor-text
    profiles are a standard crawl-side relevance/quality prior
    (search engines rank heavily on them).

    Scale shape: the edge fan-out is a narrow projection (3 rows per
    doc, no shuffle); the two aggregations are map-side combined
    groupBys keyed on host — O(hosts x terms) intermediate, tiny next
    to the corpus; the modal-term window runs over that aggregate,
    never over raw edges. Ties break lexicographically so the modal
    term is deterministic on both engines.
    """
    from onnxtr_spark.functions.text import tokens

    links = (
        spread(documents)
        .select(
            F.col("doc_id").cast("long").alias("d"),
            F.element_at(tokens(), 1).alias("anchor"),
        )
        .select(
            F.expr(f"d % {N_HOSTS}").alias("src"),
            F.explode(
                F.array(*[F.expr(e.format(n=N_HOSTS)) for e in _LINK_EXPRS])
            ).alias("dst"),
            "anchor",
        )
        .where(F.col("src") != F.col("dst"))
    )
    per_host = links.groupBy("dst").agg(
        F.count("*").cast("long").alias("n_links"),
        F.countDistinct("src").cast("long").alias("n_src_hosts"),
    )
    terms = links.groupBy("dst", "anchor").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("dst").orderBy(F.col("n").desc(), F.col("anchor").asc())
    top = (
        terms.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("dst", F.col("anchor").alias("top_anchor"), F.col("n").alias("top_anchor_n"))
    )
    return (
        per_host.join(top, "dst")
        .select(F.col("dst").cast("long").alias("host"), "n_links", "n_src_hosts", "top_anchor", "top_anchor_n")
    )


def anchor_text_sql() -> str:
    from onnxtr_spark.functions.text import _TOKENS_SQL

    dsts = " UNION ALL ".join(
        f"SELECT d % {N_HOSTS} AS src, {e.format(n=N_HOSTS)} AS dst, anchor FROM base"
        for e in _LINK_EXPRS
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id AS d, ({_TOKENS_SQL})[1] AS anchor FROM documents
), links AS MATERIALIZED (
  SELECT * FROM ({dsts}) WHERE src <> dst
), per_host AS (
  SELECT dst, count(*) AS n_links, count(DISTINCT src) AS n_src_hosts
  FROM links GROUP BY 1
), terms AS (
  SELECT dst, anchor, count(*) AS n FROM links GROUP BY 1, 2
), top AS (
  SELECT dst, anchor AS top_anchor, n AS top_anchor_n
  FROM (SELECT *, row_number() OVER (PARTITION BY dst ORDER BY n DESC, anchor ASC) AS rk
        FROM terms)
  WHERE rk = 1
)
SELECT p.dst AS host, n_links, n_src_hosts, top_anchor, top_anchor_n
FROM per_host p JOIN top t ON p.dst = t.dst
"""
