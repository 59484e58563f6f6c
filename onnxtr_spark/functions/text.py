"""Text-analysis operators over the documents table.

Language-ID, quality scoring, token counting, and document
fingerprinting — the per-document scalar passes a training-data
pipeline runs before dedup/filtering. All JVM-side column algebra
(split/filter/aggregate over arrays); doubles are rounded at the edge
so Spark and DuckDB hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onnxtr_spark.functions.hashing import hash64, hash64_sql, round_half_up, round_half_up_sql

EN_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"

def tokens():
    """Lazy Column: whitespace-split tokens of trimmed text."""
    return F.split(F.trim(F.col("text")), r"\s+")
_TOKENS_SQL = "string_split_regex(trim(text), '\\s+')"


# BPE-ish pretokenizer (the GPT-2-family regex, RE2-safe subset: no
# lookaheads): contraction suffixes, letter runs, digit runs, punct runs
# — each optionally preceded by one space. Token COUNT approximates the
# subword budget a tokenizer would see far better than whitespace count.
BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"
BPE_RE_SQL = BPE_RE.replace("'", "''")  # escaped for the SQL literal


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token counts: (doc_id, n_tokens, n_distinct, n_chars,
    avg_token_len, n_bpe_tokens) — whitespace tokens plus the BPE-ish
    regex pretokenization count."""
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens()).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens())).cast("long").alias("n_distinct"),
        F.length(F.trim("text")).cast("long").alias("n_chars"),
        round_half_up(
            F.aggregate(tokens(), F.lit(0.0), lambda acc, t: acc + F.length(t)) / F.size(tokens()), 4
        ).alias("avg_token_len"),
        F.size(F.regexp_extract_all(F.trim("text"), F.lit(BPE_RE), F.lit(0))).cast("long").alias("n_bpe_tokens"),
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len({_TOKENS_SQL}) AS n_tokens,
       len(list_distinct({_TOKENS_SQL})) AS n_distinct,
       length(trim(text)) AS n_chars,
       {round_half_up_sql(f'list_sum([length(t)::DOUBLE for t in {_TOKENS_SQL}]) / len({_TOKENS_SQL})', 4)} AS avg_token_len,
       len(regexp_extract_all(trim(text), '{BPE_RE_SQL}')) AS n_bpe_tokens
FROM documents
"""


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic document quality in [0,1]: length, stopword and
    mean-token-length components (the usual pre-training filters)."""
    toks = tokens()
    n = F.size(toks).cast("double")
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))).cast("double") / n
    mean_len = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n
    score = (
        F.least(F.lit(1.0), n / 100.0) * 0.4
        + F.least(F.lit(1.0), stop_ratio * 5.0) * 0.3
        + F.least(F.lit(1.0), mean_len / 8.0) * 0.3
    )
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        round_half_up(stop_ratio, 4).alias("stopword_ratio"),
        round_half_up(score, 4).alias("quality"),
    )


QUALITY_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
), m AS (
  SELECT doc_id,
         len(toks)::DOUBLE AS n,
         len(list_filter(toks, t -> t IN {_STOP_SQL}))::DOUBLE / len(toks)::DOUBLE AS stop_ratio,
         list_sum([length(t)::DOUBLE for t in toks]) / len(toks)::DOUBLE AS mean_len
  FROM t
)
SELECT doc_id,
       {round_half_up_sql('stop_ratio', 4)} AS stopword_ratio,
       {round_half_up_sql('''least(1.0, n / 100.0) * 0.4
             + least(1.0, stop_ratio * 5.0) * 0.3
             + least(1.0, mean_len / 8.0) * 0.3''', 4)} AS quality
FROM m
"""


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-heuristic language ID (the reference's optional
    language-detect pass, onnxtr/models/_utils.py:193-209, re-expressed
    as a declarative n-gram/stopword heuristic)."""
    toks = tokens()
    ratio = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))).cast("double") / F.size(toks)
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias("pred_lang"),
    )


LANG_ID_SQL = f"""
SELECT doc_id,
       CASE WHEN len(list_filter({_TOKENS_SQL}, t -> t IN {_STOP_SQL}))::DOUBLE
                 / len({_TOKENS_SQL}) >= 0.05
            THEN 'en' ELSE 'unknown' END AS pred_lang
FROM documents
"""


def shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) rows: distinct k-word shingles; docs with fewer
    than k tokens contribute their whole normalized text.

    The input is spread across cores first: the documents table is a
    single parquet row-group, and shingle hashing is CPU-bound — without
    the repartition one task does all of it."""
    documents = documents.repartition(documents.sparkSession.sparkContext.defaultParallelism)
    toks = tokens()
    sh = F.when(
        F.size(toks) < k, F.array(F.array_join(toks, " "))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - k),
                lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
            )
        )
    )
    return documents.select(F.col("doc_id").cast("long").alias("doc_id"), F.explode(sh).alias("shingle"))


def _shingles_sql(k: int = 3) -> str:
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
    return f"""
  SELECT doc_id,
         unnest(CASE WHEN len(w) < {k} THEN [array_to_string(w, ' ')]
                     ELSE list_distinct([{parts} for i in range(1, len(w) - {k - 2})]) END) AS shingle
  FROM (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents)
"""


def fingerprint(documents: DataFrame) -> DataFrame:
    """Winnowing-style document fingerprint: min 3-gram shingle hash
    (rolling-hash fingerprinting, k-min sketch with k=1)."""
    return (
        shingles(documents)
        .groupBy("doc_id")
        .agg(F.min(hash64(F.col("shingle"), 0)).alias("fingerprint"))
    )


FINGERPRINT_SQL = f"""
SELECT doc_id, min({hash64_sql("shingle", 0)}) AS fingerprint
FROM ({_shingles_sql()})
GROUP BY doc_id
"""
