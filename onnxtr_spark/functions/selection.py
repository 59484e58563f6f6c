"""Corpus-level data selection: boilerplate removal, importance
weighting, and duplicate-group representative selection.

These are the three selection steps a pre-training pipeline runs AFTER
the per-document scores and dup graphs exist:

- ``boilerplate_scrub`` — CCNet-style segment-frequency boilerplate
  removal (Wenzek et al. 2020 drop lines seen in many documents;
  RefinedWeb does the same at line granularity). Unlike
  ``text.passage_dedup`` (keep FIRST occurrence, drop later copies)
  this drops EVERY occurrence of a segment frequent across distinct
  documents — navigation chrome and license headers are noise in all
  their copies, including the first.
- ``dsir_weights`` — Data Selection via Importance Resampling (Xie et
  al. 2023): hashed n-gram bag features, importance weight
  log p_target(x) - log p_raw(x) under smoothed categorical models.
- ``keep_best`` — per near-dup group, keep the highest-quality member
  (the canonicalization policy real pipelines use; min-doc_id is only
  the default tie-break). Groups come from the SimHash hamming graph,
  quality from ``text.quality_score``.

Scale notes: every aggregate here is map-side combinable; the
boilerplate segment table and the DSIR feature table (≤ ``mod`` rows)
are broadcast back against the corpus, so nothing shuffles the full
text twice. ``keep_best`` inherits the O(log diameter) pointer-jumping
connected components from ``dedup.connected_components``. Weights sum
as integer micros so the result is bit-equal across engines (see
functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onnxtr_spark.functions.dedup import (
    SIMHASH_HAM_K,
    SIMHASH_NP_BITS,
    connected_components,
    simhash_near_pairs,
    simhash_near_pairs_sql,
)
from onnxtr_spark.functions.hashing import (
    hash64,
    hash64_sql,
    round_half_up,
    round_half_up_sql,
)
from onnxtr_spark.functions.text import (
    _TOKENS_SQL,
    QUALITY_SCORE_SQL,
    quality_score,
    tokens,
)

# --- boilerplate removal ---------------------------------------------------

BOILER_WIDTH = 10  # words per segment ("line" stand-in: corpus has no \n)
BOILER_MIN_DOCS = 3  # segment in >= this many DISTINCT docs -> boilerplate


def _segments(documents: DataFrame, width: int):
    """(doc_id, pos, seg) non-overlapping width-word segments — the
    same chunking as text.passage_dedup so the two operators describe
    the same units."""
    toks = tokens()
    n = F.size(toks)
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.lit(0), F.ceil(n / width).cast("int") - 1)),
                lambda p: F.concat_ws(" ", F.slice(toks, p * width + 1, width)),
            )
        ).alias("pos", "seg"),
    )


def boilerplate_scrub(
    documents: DataFrame, width: int = BOILER_WIDTH, min_docs: int = BOILER_MIN_DOCS
) -> DataFrame:
    """(doc_id, n_segs, n_boiler, kept_words, clean_hash): each doc
    with its corpus-frequent segments removed.

    Plan: one explode -> map-side-combined groupBy(seg hash) for the
    distinct-doc frequency -> the (small) boilerplate set joins back
    broadcast -> per-doc re-assembly in original segment order. The
    full text shuffles once (the per-doc reassembly); the frequency
    side carries only 60-bit hashes.
    """
    segs = _segments(documents, width).withColumn("h", F.md5("seg"))
    boiler = (
        segs.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("h", F.lit(True).alias("boiler"))
    )
    flagged = segs.join(F.broadcast(boiler), "h", "left").select(
        "doc_id", "pos", "seg", F.coalesce("boiler", F.lit(False)).alias("boiler")
    )
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(F.when(~F.col("boiler"), F.struct("pos", "seg")))
        ),
        lambda s: s["seg"],
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_segs"),
            F.sum(F.col("boiler").cast("long")).alias("n_boiler"),
            kept_sorted.alias("kept"),
        )
        .select(
            "doc_id",
            "n_segs",
            "n_boiler",
            F.coalesce(
                F.aggregate(
                    F.col("kept"),
                    F.lit(0).cast("long"),
                    lambda acc, s: acc + F.size(F.split(s, " ")),
                ),
                F.lit(0).cast("long"),
            ).alias("kept_words"),
            F.md5(F.concat_ws(" ", F.col("kept"))).alias("clean_hash"),
        )
    )


def boilerplate_scrub_sql(width: int = BOILER_WIDTH, min_docs: int = BOILER_MIN_DOCS) -> str:
    return f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_TOKENS_SQL} AS toks FROM documents
), segs AS (
  SELECT doc_id, p - 1 AS pos,
         array_to_string(toks[(p - 1) * {width} + 1 : (p - 1) * {width} + {width}], ' ') AS seg
  FROM base, UNNEST(generate_series(1, greatest(1, CAST(ceil(len(toks) / {width}.0) AS BIGINT)))) AS u(p)
), boiler AS (
  SELECT md5(seg) AS h FROM segs GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_docs}
), flagged AS (
  SELECT s.doc_id, s.pos, s.seg, b.h IS NOT NULL AS boiler
  FROM segs s LEFT JOIN boiler b ON md5(s.seg) = b.h
)
SELECT doc_id,
       count(*) AS n_segs,
       CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       CAST(coalesce(sum(CASE WHEN boiler THEN 0 ELSE len(string_split(seg, ' ')) END), 0)
            AS BIGINT) AS kept_words,
       md5(coalesce(array_to_string(list(seg ORDER BY pos) FILTER (WHERE NOT boiler), ' '), ''))
         AS clean_hash
FROM flagged
GROUP BY doc_id
"""


# --- DSIR importance weights ----------------------------------------------

DSIR_MOD = 4096  # hashed feature space size (Xie et al. use 10k buckets)
DSIR_TARGET_LANG = "en"


def dsir_weights(
    documents: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    mod: int = DSIR_MOD,
    top_denom: int = 4,
) -> DataFrame:
    """(doc_id, n_toks, weight_micros, keep): DSIR importance weight
    of each document toward the ``lang = target_lang`` slice; ``keep``
    marks the top 1/``top_denom`` by weight (DSIR resamples the highest
    importance weights, not a sign test — smoothing mass shifts all
    weights by a constant, so an absolute threshold is meaningless).

    Features are hashed word unigrams (hash64 % mod); the target and
    raw distributions are add-one-smoothed categorical models over the
    ``mod`` buckets. Per-feature log-ratio contributions round to
    integer micros BEFORE the per-doc sum, so the weight is an exact
    BIGINT in both engines (float summation order can never flip a
    result — same discipline as bm25_search), and the quartile is
    assigned by integer rank with doc_id tie-break (same discipline as
    ccnet_buckets).

    Plan: the exploded (doc, feature) stream is aggregated twice — once
    keyed on feature (builds BOTH models in one pass via a conditional
    sum; output ≤ mod rows) and once on (doc_id, feature) — both
    map-side combinable, so each shuffle moves counts, not tokens, and
    the scan+explode recompute down the two branches is narrow work
    (cheaper at 100 TB than persisting the exploded stream). The model
    table broadcast-joins back. The quartile rank is a global distributed
    sort — the price of EXACT selection; a cluster deployment swaps it
    for an approx-quantile weight threshold (two-pass, no global sort)
    and keeps this exact form as the oracle semantics.
    """
    words = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("lang") == target_lang).alias("is_target"),
        F.explode(tokens()).alias("w"),
    ).select("doc_id", "is_target", (hash64(F.col("w")) % mod).alias("f"))

    ft = words.groupBy("f").agg(
        F.count("*").cast("long").alias("cr"),
        F.sum(F.col("is_target").cast("long")).alias("ct"),
    )
    totals = ft.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    contrib = ft.crossJoin(F.broadcast(totals)).select(
        "f",
        round_half_up(
            (
                F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.lit(float(mod))))
                - F.log((F.col("cr") + F.lit(1.0)) / (F.col("nr") + F.lit(float(mod))))
            )
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("contrib"),
    )
    doc_feats = words.groupBy("doc_id", "f").agg(F.count("*").cast("long").alias("cnt"))
    from pyspark.sql import Window

    weighted = (
        doc_feats.join(F.broadcast(contrib), "f")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_toks"),
            F.sum(F.col("cnt") * F.col("contrib")).alias("weight_micros"),
        )
    )
    # rank by PER-TOKEN weight: the raw sum is length-dominated (every
    # token's smoothed log-ratio is shifted negative by the smaller
    # target mass), so ranking the sum selects short docs, not on-target
    # docs. One exact double division of two BIGINTs is bit-identical
    # in both engines, so the order (and the integer-rank cut) is too.
    w = Window.orderBy((F.col("weight_micros") / F.col("n_toks")).desc(), "doc_id")
    return (
        weighted.withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(Window.partitionBy()))
        .select(
            "doc_id",
            "n_toks",
            "weight_micros",
            (F.expr(f"({top_denom} * (rn - 1)) div cnt") == 0).alias("keep"),
        )
    )


def dsir_weights_sql(
    target_lang: str = DSIR_TARGET_LANG, mod: int = DSIR_MOD, top_denom: int = 4
) -> str:
    return f"""
WITH words AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang = '{target_lang}' AS is_target,
         {hash64_sql("w")} % {mod} AS f
  FROM documents, UNNEST({_TOKENS_SQL}) AS t(w)
), ft AS (
  SELECT f, count(*) AS cr, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
  FROM words GROUP BY f
), totals AS (
  SELECT sum(cr) AS nr, sum(ct) AS nt FROM ft
), contrib AS (
  SELECT f,
         CAST({round_half_up_sql(
             f"(ln((ct + 1.0) / (nt + {mod}.0)) - ln((cr + 1.0) / (nr + {mod}.0))) * 1e6", 0
         )} AS BIGINT) AS contrib
  FROM ft, totals
), doc_feats AS (
  SELECT doc_id, f, count(*) AS cnt FROM words GROUP BY doc_id, f
), weighted AS (
  SELECT d.doc_id,
         CAST(sum(d.cnt) AS BIGINT) AS n_toks,
         CAST(sum(d.cnt * c.contrib) AS BIGINT) AS weight_micros
  FROM doc_feats d JOIN contrib c USING (f)
  GROUP BY d.doc_id
)
SELECT doc_id, n_toks, weight_micros,
       ({top_denom} * (row_number() OVER (ORDER BY weight_micros / n_toks DESC, doc_id) - 1))
         // (count(*) OVER ()) = 0 AS keep
FROM weighted
"""


# --- duplicate-group representative selection ------------------------------


def keep_best(
    documents: DataFrame,
    bits: int = SIMHASH_NP_BITS,
    k: int = SIMHASH_HAM_K,
) -> DataFrame:
    """(group_id, rep_doc_id, group_size, rep_quality): the post-dedup
    corpus — one representative per SimHash near-dup component, chosen
    by highest quality_score (doc_id ascending breaks exact ties).

    Quality compares as integer ten-thousandths (quality_score already
    rounds half-up to 4 places), so the argmax is deterministic across
    engines; the argmax itself is one max(struct) aggregate — no
    window, no secondary sort.
    """
    pairs = simhash_near_pairs(documents, bits, k).select("doc_a", "doc_b")
    nodes = documents.select(F.col("doc_id").cast("long").alias("node")).distinct()
    cc = connected_components(nodes, pairs).select(
        F.col("node").alias("doc_id"), F.col("label").alias("group_id")
    )
    q = quality_score(documents).select(
        "doc_id",
        round_half_up(F.col("quality") * 10000, 0).cast("long").alias("qmic"),
    )
    return (
        cc.join(q, "doc_id")
        .groupBy("group_id")
        .agg(
            F.count("*").cast("long").alias("group_size"),
            F.max(F.struct(F.col("qmic"), (-F.col("doc_id")).alias("nd"))).alias("best"),
        )
        .select(
            "group_id",
            (-F.col("best.nd")).alias("rep_doc_id"),
            "group_size",
            (F.col("best.qmic") / 10000.0 + F.lit(0.0)).alias("rep_quality"),
        )
    )


def keep_best_sql(bits: int = SIMHASH_NP_BITS, k: int = SIMHASH_HAM_K) -> str:
    """Oracle: brute-force SimHash pairs (proves banding completeness
    again), recursive-CTE transitive closure, then the same integer
    argmax. CTEs materialize so DuckDB does not re-inline the
    quadratic pair scan into the recursion."""
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  {simhash_near_pairs_sql(bits, k)}
), edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(node, other) AS (
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.other
), cc AS MATERIALIZED (
  SELECT node AS doc_id, min(other) AS group_id FROM reach GROUP BY node
), q AS MATERIALIZED (
  SELECT doc_id, CAST({round_half_up_sql("quality * 10000", 0)} AS BIGINT) AS qmic
  FROM ({QUALITY_SCORE_SQL})
)
SELECT group_id,
       -(max(struct_pack(qmic := q.qmic, nd := -cc.doc_id)).nd) AS rep_doc_id,
       count(*) AS group_size,
       (max(struct_pack(qmic := q.qmic, nd := -cc.doc_id)).qmic / 10000.0 + 0.0) AS rep_quality
FROM cc JOIN q USING (doc_id)
GROUP BY group_id
"""


WSAMPLE_K = 100
WSAMPLE_SEED = 77
_WSPACE = float(2**60)  # hash64 is 60-bit; 2^60 is exactly representable


def weighted_sample(documents: DataFrame, k: int = WSAMPLE_K, seed: int = WSAMPLE_SEED) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis
    2006, A-ES): draw ``k`` documents with inclusion probability
    proportional to weight (here ``n_chars`` — longer documents carry
    more training tokens, the weighting real mixture samplers use).
    Each doc gets key u_i^(1/w_i) with u_i uniform; the k largest keys
    ARE a weighted sample without replacement — one pass, no
    sequential reservoir.

    Determinism: u_i = (hash64(doc_id)+1)/2^60 replaces the RNG, and
    ranking uses ln(u)/w (same order as u^(1/w), better conditioned)
    quantized half-up to integer micros with doc_id tie-break, so both
    engines select the identical set. Scale: the top-k is
    ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject (per-
    partition heap + driver merge of k·P rows), never a full sort; no
    shuffle of the corpus at any width.

    Zero-weight docs are excluded up front: A-ES gives them inclusion
    probability 0 anyway, and the guard keeps the engines aligned on
    an edge where their division semantics differ (Spark x/0 -> NULL,
    DuckDB -> -inf, whose BIGINT cast errors)."""
    u = (hash64(F.col("doc_id").cast("string"), seed) + F.lit(1)) / F.lit(_WSPACE)
    key = F.floor(F.log(u) / F.col("n_chars").cast("double") * 1e6 + F.lit(0.5)).cast("long")
    return (
        documents.where(F.col("n_chars") > 0)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("key_micros"),
        )
        .orderBy(F.col("key_micros").desc(), "doc_id")
        .limit(k)
    )


def weighted_sample_sql(k: int = WSAMPLE_K, seed: int = WSAMPLE_SEED) -> str:
    """Oracle: the definition verbatim — same hash, same ln/quantize,
    ORDER BY key DESC LIMIT k."""
    u = f"(({hash64_sql('CAST(doc_id AS VARCHAR)', seed)} + 1) / {_WSPACE!r})"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS weight,
       CAST(floor(ln({u}) / CAST(n_chars AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS key_micros
FROM documents
WHERE n_chars > 0
ORDER BY key_micros DESC, doc_id
LIMIT {k}
"""
