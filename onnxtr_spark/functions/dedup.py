"""Deduplication operators: exact, MinHash+LSH, SimHash, token Jaccard.

Spark-first shapes:

- exact: one hash-groupBy (map-side combine; the canonical-doc pick is
  a min aggregate, no window needed).
- MinHash: explode shingles once, aggregate K mins in a single groupBy
  (K agg exprs — one shuffle, not K); band keys derived by column math.
  LSH candidates come from a self-join on (band, band_key) — at scale
  the banded table is bucketed on band_key so the join is co-located.
- SimHash: explode tokens once, 16 conditional sums in one groupBy.
- token Jaccard: inverted-index self-join on token (never a cross
  join); |A∩B| from the join, |A| |B| broadcast back. Quadratic only
  in genuinely-similar pairs, which is the best any exact method does;
  MinHash-LSH above is the subquadratic approximation.

All JVM-side; md5-based hashing for cross-engine oracles (hashing.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onnxtr_spark.functions.hashing import hash64, hash64_sql
from onnxtr_spark.functions.text import _TOKENS_SQL, _shingles_sql, shingles, tokens

MINHASH_K = 8  # signature length
LSH_BANDS = 4  # bands of r = K/BANDS rows
def _norm_text():
    return F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
_NORM_SQL = "regexp_replace(trim(text), '\\s+', ' ', 'g')"


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup groups: (text_hash, n_docs, canonical_doc_id)."""
    return (
        documents.select(F.col("doc_id").cast("long").alias("doc_id"), F.md5(_norm_text()).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").cast("long").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
    )


EXACT_DEDUP_SQL = f"""
SELECT md5({_NORM_SQL}) AS text_hash,
       count(*) AS n_docs,
       min(doc_id) AS canonical_doc_id
FROM documents
GROUP BY 1
"""


# Multiplicative universal family for MinHash: one md5 per shingle
# (the cross-engine base hash), then sig_i = (A_i * (base mod P)) mod P
# with P prime < 2^31 and odd multipliers A_i — products stay < 2^62 so
# both engines compute identical overflow-free int64 arithmetic, and
# each seed gets an independent min (8x fewer md5 evaluations than
# hashing "seed:shingle" per seed).
MINHASH_P = 2_147_483_629  # largest prime < 2^31
MINHASH_A = (1_103_515_245, 69_069, 1_664_525, 22_695_477, 134_775_813, 214_013, 16_807, 48_271)


def minhash_signatures(documents: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """Per-doc MinHash signature: (doc_id, sig_0 .. sig_{k-1})."""
    sh = shingles(documents).withColumn("base", F.pmod(hash64(F.col("shingle"), 0), F.lit(MINHASH_P)))
    aggs = [
        F.min(F.pmod(F.col("base") * F.lit(MINHASH_A[seed]), F.lit(MINHASH_P))).alias(f"sig_{seed}")
        for seed in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_bands(documents: DataFrame, k: int = MINHASH_K, bands: int = LSH_BANDS) -> DataFrame:
    """LSH band keys: (doc_id, band, band_key) — the bucket-join keys."""
    r = k // bands
    sigs = minhash_signatures(documents, k)
    rows = [
        sigs.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("_", *[F.col(f"sig_{b * r + j}").cast("string") for j in range(r)])).alias("band_key"),
        )
        for b in range(bands)
    ]
    return reduce(DataFrame.unionByName, rows)


def _minhash_sigs_sql(k: int = MINHASH_K) -> str:
    base = f"(({hash64_sql('shingle', 0)}) % {MINHASH_P} + {MINHASH_P}) % {MINHASH_P}"
    cols = ",\n         ".join(
        f"min(({MINHASH_A[seed]} * base) % {MINHASH_P}) AS sig_{seed}" for seed in range(k)
    )
    return (
        f"SELECT doc_id,\n         {cols}\n"
        f"  FROM (SELECT doc_id, {base} AS base FROM ({_shingles_sql()}))\n  GROUP BY doc_id"
    )


def minhash_bands_sql(k: int = MINHASH_K, bands: int = LSH_BANDS) -> str:
    r = k // bands
    selects = []
    for b in range(bands):
        parts = " || '_' || ".join(f"CAST(sig_{b * r + j} AS VARCHAR)" for j in range(r))
        selects.append(f"SELECT doc_id, {b} AS band, md5({parts}) AS band_key FROM sigs")
    union = "\nUNION ALL\n".join(selects)
    return f"WITH sigs AS (\n  {_minhash_sigs_sql(k)}\n)\n{union}"


def lsh_candidate_pairs(documents: DataFrame) -> DataFrame:
    """Distinct candidate pairs sharing at least one LSH band bucket."""
    b = minhash_bands(documents)
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(right, ["band", "band_key"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def token_jaccard_pairs(documents: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs via inverted-index join:
    (doc_a, doc_b, jaccard) with jaccard >= threshold, rounded to 4."""
    documents = documents.repartition(documents.sparkSession.sparkContext.defaultParallelism)
    toks = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(F.array_distinct(tokens())).alias("tok")
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    inter = (
        toks.alias("a")
        .join(toks.alias("b"), "tok")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnsRenamed({"doc_id": "doc_a", "n": "na"})), "doc_a")
        .join(F.broadcast(sizes.withColumnsRenamed({"doc_id": "doc_b", "n": "nb"})), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def token_jaccard_pairs_sql(threshold: float = 0.9) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS tok FROM documents
), sizes AS (
  SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM toks a JOIN toks b USING (tok)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter::DOUBLE / (sa.n + sb.n - inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter::DOUBLE / (sa.n + sb.n - inter), 4) >= {threshold}
"""


SIMHASH_BITS = 16


def simhash(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over token frequencies: (doc_id, simhash)."""
    documents = documents.repartition(documents.sparkSession.sparkContext.defaultParallelism)
    toks = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(tokens()).alias("tok")
    ).withColumn("h", hash64(F.col("tok"), 7))
    aggs = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    doc_bits = toks.groupBy("doc_id").agg(*aggs)
    value = reduce(
        lambda acc, i: acc + F.when(F.col(f"b{i}") >= 0, F.lit(2**i)).otherwise(F.lit(0)),
        range(1, bits),
        F.when(F.col("b0") >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return doc_bits.select("doc_id", value.cast("long").alias("simhash"))


def simhash_sql(bits: int = SIMHASH_BITS) -> str:
    bit_aggs = ",\n         ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(bits)
    )
    value = " + ".join(f"CASE WHEN b{i} >= 0 THEN {2**i} ELSE 0 END" for i in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, {hash64_sql("tok", 7)} AS h
  FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents)
), doc_bits AS (
  SELECT doc_id,
         {bit_aggs}
  FROM toks GROUP BY doc_id
)
SELECT doc_id, CAST({value} AS BIGINT) AS simhash FROM doc_bits
"""
