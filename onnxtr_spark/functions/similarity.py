"""Similarity search over the embeddings table (array<float> columns).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query set is broadcast (tiny), candidates stream map-side; the
  only shuffle is the final per-query top-k (a windowed rank over
  n_queries × n_vectors rows, pruned by AQE).
- ``lsh_buckets`` / ``lsh_near_pairs``: the scale path — sign-bit LSH
  over leading dimensions buckets vectors so candidate generation is an
  equi-join on bucket, never a cross join.
- ``label_centroids``: per-label mean vector via posexplode — the IVF
  coarse-quantizer training step (k-means assignment pass analog).

Dot products use ``zip_with`` + ``aggregate`` (JVM, no UDF), summing in
float64 in array order so the oracle can reproduce values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from onnxtr_spark.functions.hashing import round_half_up, round_half_up_sql

ROUND = 3  # similarity rounding — absorbs float32-vs-float64 engine drift


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(embeddings: DataFrame, n_queries: int = 8, k: int = 5) -> DataFrame:
    """Exact top-k neighbors by cosine for query vectors (vec_id < n_queries).

    Returns (query_id, neighbor_id, sim, rank); ties broken by neighbor_id.
    """
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    pairs = embeddings.crossJoin(F.broadcast(queries)).where(F.col("vec_id") != F.col("query_id"))
    sims = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        round_half_up(_dot(F.col("q"), F.col("embedding")) / (_norm(F.col("q")) * _norm(F.col("embedding"))), ROUND).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("query_id").cast("long"), F.col("neighbor_id").cast("long"), "sim", "rank")
    )


def cosine_topk_sql(n_queries: int = 8, k: int = 5) -> str:
    dot = "list_sum(list_transform(list_zip(q.embedding, e.embedding), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
    nq = "sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in q.embedding]))"
    ne = "sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in e.embedding]))"
    return f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {round_half_up_sql(f'{dot} / ({nq} * {ne})', ROUND)} AS sim
  FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < {n_queries}) q
  WHERE e.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {k}
"""


LSH_BITS = 4


def _bucket(col: Column, bits: int = LSH_BITS) -> Column:
    acc = F.lit(0)
    for i in range(bits):
        acc = acc + F.when(F.element_at(col, i + 1) >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return acc.cast("long")


def lsh_buckets(embeddings: DataFrame, bits: int = LSH_BITS) -> DataFrame:
    """Sign-bit LSH bucket histogram: (bucket, n_vecs)."""
    return (
        embeddings.select(_bucket(F.col("embedding"), bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_vecs"))
    )


def lsh_buckets_sql(bits: int = LSH_BITS) -> str:
    expr = " + ".join(f"CASE WHEN embedding[{i + 1}] >= 0 THEN {2**i} ELSE 0 END" for i in range(bits))
    return f"""
SELECT CAST({expr} AS BIGINT) AS bucket, count(*) AS n_vecs
FROM embeddings GROUP BY 1
"""


def lsh_near_pairs(embeddings: DataFrame, bits: int = LSH_BITS, threshold: float = 0.25) -> DataFrame:
    """Near-duplicate candidate pairs within LSH buckets, verified by
    exact cosine: (vec_a, vec_b, sim) with sim >= threshold."""
    withb = embeddings.select("vec_id", "embedding", _bucket(F.col("embedding"), bits).alias("bucket"))
    pairs = (
        withb.alias("a")
        .join(withb.alias("b"), "bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
    )
    return (
        pairs.select(
            F.col("a.vec_id").cast("long").alias("vec_a"),
            F.col("b.vec_id").cast("long").alias("vec_b"),
            round_half_up(
                _dot(F.col("a.embedding"), F.col("b.embedding"))
                / (_norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))),
                ROUND,
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def lsh_near_pairs_sql(bits: int = LSH_BITS, threshold: float = 0.25) -> str:
    expr = " + ".join(f"CASE WHEN embedding[{i + 1}] >= 0 THEN {2**i} ELSE 0 END" for i in range(bits))
    dot = "list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
    na = "sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in a.embedding]))"
    nb = "sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in b.embedding]))"
    return f"""
WITH withb AS (
  SELECT vec_id, embedding, CAST({expr} AS BIGINT) AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {round_half_up_sql(f'{dot} / ({na} * {nb})', ROUND)} AS sim
FROM withb a JOIN withb b USING (bucket)
WHERE a.vec_id < b.vec_id
  AND {round_half_up_sql(f'{dot} / ({na} * {nb})', ROUND)} >= {threshold}
"""


def ivf_topk(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5, nprobe: int = 3
) -> DataFrame:
    """IVF-style ANN: search only the ``nprobe`` nearest label-centroid
    cells per query instead of the whole collection.

    The label column stands in for a trained coarse quantizer (the
    k-means assignment an IVF index maintains); candidate generation is
    an equi-join on cell id — at 10^12 vectors the cell assignment is
    the table's partition key and each probe is a partition-pruned scan.
    Returns (query_id, neighbor_id, sim, rank) like ``cosine_topk`` —
    approximate: only neighbors inside probed cells are considered.
    """
    from pyspark.sql import Window

    cents = label_centroids(embeddings)
    # centroid vectors per label, ordered by dim (small: labels × dims)
    cent_vec = (
        cents.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "centroid"))).alias("cv"))
        .select("label", F.transform("cv", lambda s: s["centroid"]).alias("centroid_vec"))
    )
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    # nprobe nearest cells per query (labels are few -> broadcast both ways)
    qcell = (
        queries.crossJoin(F.broadcast(cent_vec))
        .select(
            "query_id", "q", "label",
            (_dot(F.col("q"), F.col("centroid_vec"))
             / (_norm(F.col("q")) * _norm(F.col("centroid_vec")))).alias("cell_sim"),
        )
    )
    wcell = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("label"))
    probed = qcell.withColumn("cr", F.row_number().over(wcell)).where(F.col("cr") <= nprobe).select(
        "query_id", "q", "label"
    )
    cands = embeddings.join(F.broadcast(probed), "label").where(F.col("vec_id") != F.col("query_id"))
    sims = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        round_half_up(
            _dot(F.col("q"), F.col("embedding")) / (_norm(F.col("q")) * _norm(F.col("embedding"))), ROUND
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("query_id").cast("long"), F.col("neighbor_id").cast("long"), "sim", "rank")
    )


def ivf_topk_sql(n_queries: int = 8, k: int = 5, nprobe: int = 3) -> str:
    dotc = "list_sum(list_transform(list_zip(q.embedding, c.centroid_vec), p -> p[1]::DOUBLE * p[2]))"
    nq = "sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in q.embedding]))"
    nc = "sqrt(list_sum([x * x for x in c.centroid_vec]))"
    dote = "list_sum(list_transform(list_zip(q.embedding, e.embedding), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
    ne = "sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in e.embedding]))"
    return f"""
WITH cents AS (
  SELECT label, list_transform(list_sort(list_zip(list(dim), list(centroid))), p -> p[2]) AS centroid_vec
  FROM (
    SELECT label, CAST(u.i - 1 AS BIGINT) AS dim,
           (floor(avg(embedding[u.i]::DOUBLE) * 10000 + 0.5) / 10000.0 + 0.0) AS centroid
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
    GROUP BY label, dim
  ) GROUP BY label
), probed AS (
  SELECT query_id, label FROM (
    SELECT q.vec_id AS query_id, c.label,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {dotc} / ({nq} * {nc}) DESC, c.label ASC) AS cr
    FROM (SELECT * FROM embeddings WHERE vec_id < {n_queries}) q, cents c
  ) WHERE cr <= {nprobe}
), sims AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         {round_half_up_sql(f'{dote} / ({nq} * {ne})', ROUND)} AS sim
  FROM probed p
  JOIN embeddings e ON e.label = p.label
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE e.vec_id != p.query_id
)
SELECT query_id, neighbor_id, sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label per-dimension centroid: (label, dim, centroid)."""
    return (
        embeddings.select(F.col("label").cast("long").alias("label"), F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(round_half_up(F.avg(F.col("v").cast("double")), 4).alias("centroid"))
        .select("label", F.col("dim").cast("long").alias("dim"), "centroid")
    )


LABEL_CENTROIDS_SQL = """
SELECT label, CAST(u.i - 1 AS BIGINT) AS dim, (floor(avg(embedding[u.i]::DOUBLE) * 10000 + 0.5) / 10000.0 + 0.0) AS centroid
FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
GROUP BY label, dim
"""
