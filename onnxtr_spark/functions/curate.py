"""End-to-end corpus curation: the training-data pipeline as ONE
declarative plan.

Composes the individual operators (exact dedup, quality score, model
lang-ID, repetition filters, benchmark decontamination, PII scrub)
into the materialization a pre-training run actually consumes, plus a
per-stage funnel relation for lineage/metrics. Every stage is a
doc_id equi-join against a scalar-per-doc relation — no operator is
re-implemented here, and the composed plan stays one DAG Catalyst can
optimize across stage boundaries (shared scans, pushed filters).

Scale notes: each side relation is one map-side-combined aggregate or
pure column algebra over the same documents scan; the joins are
doc_id equi-joins AQE broadcasts while the survivor set is small and
shuffles when it is not. The funnel counts reuse the SAME curated
lineage (cached once) rather than re-running the pipeline per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onnxtr_spark.functions.dedup import exact_dedup
from onnxtr_spark.functions.text import (
    contamination,
    lang_id,
    pii_clean,
    quality_score,
    repetition_stats,
)

CURATE_DEFAULTS = {
    "quality_min": 0.5,
    "langs": ("en",),  # lang_id's ISO-ish short codes
    "max_dup_word_frac": 0.95,
    "max_top_bigram_char_frac": 0.2,
    # decontamination gram width: wider than the analysis default (3)
    # — as a drop gate, 3-gram collisions over a small shared
    # vocabulary would evict half the corpus; production uses 8-13
    "contaminate_n": 5,
    # Gopher floors calibrated to the synthetic corpus (docs are 10-100
    # words over a stopword-poor vocabulary; the published 50/2 floors
    # would keep nothing — see curate_v2's docstring)
    "gopher_min_words": 20,
    "gopher_min_stop_hits": 1,
}


def curate(
    documents: DataFrame,
    quality_min: float = CURATE_DEFAULTS["quality_min"],
    langs: tuple[str, ...] = CURATE_DEFAULTS["langs"],
    max_dup_word_frac: float = CURATE_DEFAULTS["max_dup_word_frac"],
    max_top_bigram_char_frac: float = CURATE_DEFAULTS["max_top_bigram_char_frac"],
    contaminate_n: int = CURATE_DEFAULTS["contaminate_n"],
) -> DataFrame:
    """Curated corpus: (doc_id, text, lang, quality, kept_by) where
    ``text`` is PII-scrubbed and ``kept_by`` records the first gate a
    dropped doc failed ('' = kept). Emitting DROPPED rows with their
    reason keeps the relation auditable — the writer filters
    ``kept_by = ''`` and the funnel aggregates the rest."""
    base = documents.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    canon = exact_dedup(documents).select(
        F.col("canonical_doc_id").alias("doc_id"), F.lit(True).alias("is_canonical")
    )
    q = quality_score(documents).select("doc_id", "quality")
    lg = lang_id(documents).select("doc_id", F.col("pred_lang").alias("lang"))
    rep = repetition_stats(documents)
    cont = contamination(documents, n=contaminate_n).select("doc_id", "contaminated")

    joined = (
        base.join(canon, "doc_id", "left")
        .join(q, "doc_id", "left")
        .join(lg, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(cont, "doc_id", "left")  # eval-slice docs have no row -> null
    )
    kept_by = (
        F.when(F.col("is_canonical").isNull(), F.lit("exact_dup"))
        .when(F.col("contaminated").isNull(), F.lit("eval_holdout"))
        .when(F.col("contaminated"), F.lit("contaminated"))
        .when(F.col("quality") < quality_min, F.lit("low_quality"))
        .when(~F.col("lang").isin(*langs), F.lit("wrong_lang"))
        .when(F.col("dup_word_frac") > max_dup_word_frac, F.lit("repetitive_words"))
        .when(F.col("top_bigram_char_frac") > max_top_bigram_char_frac, F.lit("repetitive_bigram"))
        .otherwise(F.lit(""))
    )
    return joined.select(
        "doc_id",
        pii_clean(F.col("text")).alias("text"),
        "lang",
        "quality",
        kept_by.alias("kept_by"),
    )


def curation_funnel(curated: DataFrame) -> DataFrame:
    """(stage, n_docs) funnel over the audited relation — one
    aggregation, no pipeline re-run."""
    return (
        curated.groupBy(
            F.when(F.col("kept_by") == "", F.lit("kept")).otherwise(F.col("kept_by")).alias("stage")
        )
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("stage")
    )


def curation_funnel_sql(
    quality_min: float = CURATE_DEFAULTS["quality_min"],
    langs: tuple[str, ...] = CURATE_DEFAULTS["langs"],
    max_dup_word_frac: float = CURATE_DEFAULTS["max_dup_word_frac"],
    max_top_bigram_char_frac: float = CURATE_DEFAULTS["max_top_bigram_char_frac"],
    contaminate_n: int = CURATE_DEFAULTS["contaminate_n"],
) -> str:
    """Composed oracle: every gate's own oracle SQL embedded as a
    derived table, the same left joins and CASE ladder — a green row
    proves the COMPOSITION, not just the parts (the training_mix
    pattern)."""
    from onnxtr_spark.functions.dedup import EXACT_DEDUP_SQL
    from onnxtr_spark.functions.text import (
        QUALITY_SCORE_SQL,
        contamination_sql,
        lang_id_sql,
        repetition_stats_sql,
    )

    lang_list = ", ".join(f"'{lg}'" for lg in langs)
    return f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
), canon AS (
  SELECT canonical_doc_id AS doc_id, TRUE AS is_canonical FROM ({EXACT_DEDUP_SQL})
), q AS (
  SELECT doc_id, quality FROM ({QUALITY_SCORE_SQL})
), lg AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, pred_lang AS lang FROM ({lang_id_sql()})
), rep AS (
  SELECT * FROM ({repetition_stats_sql()})
), cont AS (
  SELECT doc_id, contaminated FROM ({contamination_sql(contaminate_n)})
), j AS (
  SELECT base.doc_id, is_canonical, quality, lang, dup_word_frac,
         top_bigram_char_frac, contaminated
  FROM base
  LEFT JOIN canon USING (doc_id)
  LEFT JOIN q USING (doc_id)
  LEFT JOIN lg USING (doc_id)
  LEFT JOIN rep USING (doc_id)
  LEFT JOIN cont USING (doc_id)
), staged AS (
  SELECT CASE
    WHEN is_canonical IS NULL THEN 'exact_dup'
    WHEN contaminated IS NULL THEN 'eval_holdout'
    WHEN contaminated THEN 'contaminated'
    WHEN quality < {quality_min} THEN 'low_quality'
    WHEN lang NOT IN ({lang_list}) THEN 'wrong_lang'
    WHEN dup_word_frac > {max_dup_word_frac} THEN 'repetitive_words'
    WHEN top_bigram_char_frac > {max_top_bigram_char_frac} THEN 'repetitive_bigram'
    ELSE 'kept' END AS stage
  FROM j
)
SELECT stage, count(*) AS n_docs FROM staged GROUP BY 1 ORDER BY 1
"""


def curate_v2(
    documents: DataFrame,
    quality_min: float = CURATE_DEFAULTS["quality_min"],
    langs: tuple[str, ...] = CURATE_DEFAULTS["langs"],
    max_dup_word_frac: float = CURATE_DEFAULTS["max_dup_word_frac"],
    max_top_bigram_char_frac: float = CURATE_DEFAULTS["max_top_bigram_char_frac"],
    contaminate_n: int = CURATE_DEFAULTS["contaminate_n"],
    gopher_min_words: int = CURATE_DEFAULTS["gopher_min_words"],
    gopher_min_stop_hits: int = CURATE_DEFAULTS["gopher_min_stop_hits"],
) -> DataFrame:
    """The v1 gate ladder plus the round's published-filter gates:
    Gopher's rule battery (Rae et al. Table A1 conjunction) and CCNet's
    perplexity tail (the worst per-language NLL tertile) — applied
    AFTER every v1 gate so each funnel stage stays attributable to one
    filter. The Gopher word/stopword floors are CALIBRATED to the
    corpus (the published 50-word / 2-stopword values assume organic
    English; every real pipeline re-tunes them per corpus — at the
    defaults the synthetic corpus keeps zero docs, which is a
    mis-configured gate, not a filter). Same shape: two more doc_id
    equi-joins against scalar-per-doc relations, still one Catalyst
    DAG."""
    from onnxtr_spark.functions.text import ccnet_buckets, gopher_rules

    v1 = curate(
        documents,
        quality_min=quality_min,
        langs=langs,
        max_dup_word_frac=max_dup_word_frac,
        max_top_bigram_char_frac=max_top_bigram_char_frac,
        contaminate_n=contaminate_n,
    )
    gop = gopher_rules(
        documents, min_words=gopher_min_words, min_stop_hits=gopher_min_stop_hits
    ).select("doc_id", F.col("passes").alias("gopher_ok"))
    cc = ccnet_buckets(documents).select("doc_id", "bucket")
    kept_by = (
        F.when(F.col("kept_by") != "", F.col("kept_by"))
        .when(~F.col("gopher_ok"), F.lit("gopher_fail"))
        .when(F.col("bucket") == "tail", F.lit("ppl_tail"))
        .otherwise(F.lit(""))
    )
    return (
        v1.join(gop, "doc_id", "left")
        .join(cc, "doc_id", "left")
        .select("doc_id", "text", "lang", "quality", kept_by.alias("kept_by"))
    )


def curation_funnel_v2_sql(
    quality_min: float = CURATE_DEFAULTS["quality_min"],
    langs: tuple[str, ...] = CURATE_DEFAULTS["langs"],
    max_dup_word_frac: float = CURATE_DEFAULTS["max_dup_word_frac"],
    max_top_bigram_char_frac: float = CURATE_DEFAULTS["max_top_bigram_char_frac"],
    contaminate_n: int = CURATE_DEFAULTS["contaminate_n"],
    gopher_min_words: int = CURATE_DEFAULTS["gopher_min_words"],
    gopher_min_stop_hits: int = CURATE_DEFAULTS["gopher_min_stop_hits"],
) -> str:
    """Composed oracle for the v2 ladder — the v1 gates' SQL plus the
    Gopher and CCNet oracles embedded as derived tables."""
    from onnxtr_spark.functions.dedup import EXACT_DEDUP_SQL
    from onnxtr_spark.functions.text import (
        CCNET_BUCKETS_SQL,
        gopher_rules_sql,
        QUALITY_SCORE_SQL,
        contamination_sql,
        lang_id_sql,
        repetition_stats_sql,
    )

    lang_list = ", ".join(f"'{lg}'" for lg in langs)
    return f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
), canon AS (
  SELECT canonical_doc_id AS doc_id, TRUE AS is_canonical FROM ({EXACT_DEDUP_SQL})
), q AS (
  SELECT doc_id, quality FROM ({QUALITY_SCORE_SQL})
), lg AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, pred_lang AS lang FROM ({lang_id_sql()})
), rep AS (
  SELECT * FROM ({repetition_stats_sql()})
), cont AS (
  SELECT doc_id, contaminated FROM ({contamination_sql(contaminate_n)})
), gop AS (
  SELECT doc_id, passes AS gopher_ok FROM ({gopher_rules_sql(gopher_min_words, 100_000, gopher_min_stop_hits)})
), cc AS (
  SELECT doc_id, bucket FROM ({CCNET_BUCKETS_SQL})
), j AS (
  SELECT base.doc_id, is_canonical, quality, lang, dup_word_frac,
         top_bigram_char_frac, contaminated, gopher_ok, bucket
  FROM base
  LEFT JOIN canon USING (doc_id)
  LEFT JOIN q USING (doc_id)
  LEFT JOIN lg USING (doc_id)
  LEFT JOIN rep USING (doc_id)
  LEFT JOIN cont USING (doc_id)
  LEFT JOIN gop USING (doc_id)
  LEFT JOIN cc USING (doc_id)
), staged AS (
  SELECT CASE
    WHEN is_canonical IS NULL THEN 'exact_dup'
    WHEN contaminated IS NULL THEN 'eval_holdout'
    WHEN contaminated THEN 'contaminated'
    WHEN quality < {quality_min} THEN 'low_quality'
    WHEN lang NOT IN ({lang_list}) THEN 'wrong_lang'
    WHEN dup_word_frac > {max_dup_word_frac} THEN 'repetitive_words'
    WHEN top_bigram_char_frac > {max_top_bigram_char_frac} THEN 'repetitive_bigram'
    WHEN NOT gopher_ok THEN 'gopher_fail'
    WHEN bucket = 'tail' THEN 'ppl_tail'
    ELSE 'kept' END AS stage
  FROM j
)
SELECT stage, count(*) AS n_docs FROM staged GROUP BY 1 ORDER BY 1
"""


CURATE_V3_DEFAULTS = {
    # drop docs boilerplate-dominated after segment scrub (< half the
    # words survive) — the RefinedWeb "mostly chrome" page drop
    "min_kept_num": 1,
    "min_kept_den": 2,
    # DSIR selection keeps the top half by importance weight toward the
    # en slice (quartile default is for standalone analysis; as the
    # LAST ladder gate a 4x cut on already-curated docs over-prunes)
    "dsir_top_denom": 2,
}


def curate_v3(
    documents: DataFrame,
    min_kept_num: int = CURATE_V3_DEFAULTS["min_kept_num"],
    min_kept_den: int = CURATE_V3_DEFAULTS["min_kept_den"],
    dsir_top_denom: int = CURATE_V3_DEFAULTS["dsir_top_denom"],
    **v2_kwargs,
) -> DataFrame:
    """The v2 ladder plus the selection gates: boilerplate dominance
    (functions/selection.boilerplate_scrub — docs where corpus-frequent
    segments leave < min_kept_num/min_kept_den of the words) and DSIR
    importance selection (top 1/dsir_top_denom by weight toward the en
    slice). Both side relations are computed over the FULL corpus like
    every other gate — each stage stays attributable to exactly one
    filter and the whole ladder is still one Catalyst DAG of doc_id
    equi-joins."""
    from onnxtr_spark.functions.selection import boilerplate_scrub, dsir_weights
    from onnxtr_spark.functions.text import token_stats

    v2 = curate_v2(documents, **v2_kwargs)
    kept = boilerplate_scrub(documents).select("doc_id", "kept_words")
    ntok = token_stats(documents).select("doc_id", "n_tokens")
    ds = dsir_weights(documents, top_denom=dsir_top_denom).select(
        "doc_id", F.col("keep").alias("dsir_keep")
    )
    kept_by = (
        F.when(F.col("kept_by") != "", F.col("kept_by"))
        .when(
            F.col("kept_words") * min_kept_den < F.col("n_tokens") * min_kept_num,
            F.lit("boiler_heavy"),
        )
        .when(~F.col("dsir_keep"), F.lit("dsir_low"))
        .otherwise(F.lit(""))
    )
    return (
        v2.join(kept, "doc_id", "left")
        .join(ntok, "doc_id", "left")
        .join(ds, "doc_id", "left")
        .select("doc_id", "text", "lang", "quality", kept_by.alias("kept_by"))
    )


def curation_funnel_v3_sql(
    min_kept_num: int = CURATE_V3_DEFAULTS["min_kept_num"],
    min_kept_den: int = CURATE_V3_DEFAULTS["min_kept_den"],
    dsir_top_denom: int = CURATE_V3_DEFAULTS["dsir_top_denom"],
) -> str:
    """Composed oracle for the v3 ladder: the v2 funnel's staged CASE
    re-derived with the two selection gates appended (boilerplate and
    DSIR oracles embedded as derived tables)."""
    from onnxtr_spark.functions.selection import boilerplate_scrub_sql, dsir_weights_sql

    v2 = curation_funnel_v2_sql()
    # reuse v2's WITH chain up to `staged` but extend the join set: cut
    # at the staged CTE and rebuild it with the extra gates
    head, sep, _ = v2.partition("), staged AS (")
    assert sep, "v2 funnel SQL lost its '), staged AS (' marker — fix the splice"
    return f"""{head}), bsc AS (
  SELECT doc_id, kept_words FROM ({boilerplate_scrub_sql()})
), ntok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
), ds AS (
  SELECT doc_id, keep AS dsir_keep FROM ({dsir_weights_sql(top_denom=dsir_top_denom)})
), j3 AS (
  SELECT j.*, bsc.kept_words, ntok.n_tokens, ds.dsir_keep
  FROM j
  LEFT JOIN bsc USING (doc_id)
  LEFT JOIN ntok USING (doc_id)
  LEFT JOIN ds USING (doc_id)
), staged AS (
  SELECT CASE
    WHEN is_canonical IS NULL THEN 'exact_dup'
    WHEN contaminated IS NULL THEN 'eval_holdout'
    WHEN contaminated THEN 'contaminated'
    WHEN quality < {CURATE_DEFAULTS["quality_min"]} THEN 'low_quality'
    WHEN lang NOT IN ({", ".join(f"'{lg}'" for lg in CURATE_DEFAULTS["langs"])}) THEN 'wrong_lang'
    WHEN dup_word_frac > {CURATE_DEFAULTS["max_dup_word_frac"]} THEN 'repetitive_words'
    WHEN top_bigram_char_frac > {CURATE_DEFAULTS["max_top_bigram_char_frac"]} THEN 'repetitive_bigram'
    WHEN NOT gopher_ok THEN 'gopher_fail'
    WHEN bucket = 'tail' THEN 'ppl_tail'
    WHEN kept_words * {min_kept_den} < n_tokens * {min_kept_num} THEN 'boiler_heavy'
    WHEN NOT dsir_keep THEN 'dsir_low'
    ELSE 'kept' END AS stage
  FROM j3
)
SELECT stage, count(*) AS n_docs FROM staged GROUP BY 1 ORDER BY 1
"""


CURATE_V4_DEFAULTS = {
    # drop docs more than half of whose characters sit inside a
    # 40-char substring duplicated somewhere in the corpus — the
    # RefinedWeb duplicate-fraction drop at substring granularity.
    # Deliberately ALSO catches the canonical copy of an exact-dup
    # group (exact-dedup keeps one copy; a doc that is mostly verbatim
    # boilerplate is dropped even as the "original").
    "max_substr_dup_frac": 0.5,
}


def curate_v4(
    documents: DataFrame,
    max_substr_dup_frac: float = CURATE_V4_DEFAULTS["max_substr_dup_frac"],
    **v3_kwargs,
) -> DataFrame:
    """The v3 ladder plus the ExactSubstr gate: docs whose duplicated-
    substring coverage (dedup.substring_dup_coverage, Lee et al. 2021)
    exceeds ``max_substr_dup_frac`` are dropped as ``substr_heavy``.
    ``dup_frac`` compares as the 4-decimal half-up-rounded double both
    engines emit, so the gate is bit-deterministic. Still one Catalyst
    DAG of doc_id equi-joins; twelve attributable gates."""
    from onnxtr_spark.functions.dedup import substring_dup_coverage

    v3 = curate_v3(documents, **v3_kwargs)
    sc = substring_dup_coverage(documents).select("doc_id", "dup_frac")
    kept_by = (
        F.when(F.col("kept_by") != "", F.col("kept_by"))
        .when(F.col("dup_frac") > max_substr_dup_frac, F.lit("substr_heavy"))
        .otherwise(F.lit(""))
    )
    return (
        v3.join(sc, "doc_id", "left")
        .select("doc_id", "text", "lang", "quality", kept_by.alias("kept_by"))
    )


def curation_funnel_v4_sql(
    max_substr_dup_frac: float = CURATE_V4_DEFAULTS["max_substr_dup_frac"],
    **v3_kwargs,
) -> str:
    """Composed oracle for the v4 ladder: the v3 funnel's staged CASE
    with the ExactSubstr gate appended before 'kept' (the coverage
    oracle embedded as a derived table)."""
    from onnxtr_spark.functions.dedup import substring_dup_coverage_sql

    v3 = curation_funnel_v3_sql(**v3_kwargs)
    head, sep, tail = v3.partition("), staged AS (")
    assert sep, "v3 funnel SQL lost its '), staged AS (' marker — fix the splice"
    # v3's staged CASE reads FROM j3; splice the coverage join in and
    # widen the CASE with the new gate just before ELSE 'kept'
    case_block, sep, _ = tail.partition("FROM j3")
    assert sep, "v3 staged CASE no longer reads FROM j3 — fix the splice"
    kept_marker = "ELSE 'kept' END AS stage"
    assert kept_marker in case_block, "v3 staged CASE tail drifted — fix the splice"
    case_block = case_block.replace(
        kept_marker,
        f"WHEN dup_frac > {max_substr_dup_frac!r} THEN 'substr_heavy'\n    {kept_marker}",
    )
    return f"""{head}), ssc AS (
  SELECT doc_id, dup_frac FROM ({substring_dup_coverage_sql()})
), j4 AS (
  SELECT j3.*, ssc.dup_frac FROM j3 LEFT JOIN ssc USING (doc_id)
), staged AS (
  {case_block.strip()}
  FROM j4
)
SELECT stage, count(*) AS n_docs FROM staged GROUP BY 1 ORDER BY 1
"""
