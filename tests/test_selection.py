"""Unit semantics for functions/selection.py: boilerplate removal,
DSIR importance weights, and keep-best representative selection."""

import pytest
from pyspark.sql import functions as F

from onnxtr_spark.functions.selection import (
    boilerplate_scrub,
    dsir_weights,
    keep_best,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


BOILER = "nav home about contact login search help terms privacy copyright"


@pytest.fixture(scope="module")
def corpus(spark):
    # three docs share the 10-word BOILER segment at position 0; each
    # has distinct body segments after it
    rows = [
        (0, BOILER + " alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0"),
        (1, BOILER + " one two three four five six seven eight nine ten", "en", "s0"),
        (2, BOILER + " red green blue cyan magenta yellow black white grey pink", "fr", "s1"),
        (3, "unique text entirely its own words here nothing shared at all", "en", "s1"),
    ]
    return _docs(spark, rows)


def test_boilerplate_drops_every_occurrence(spark, corpus):
    out = {r["doc_id"]: r for r in boilerplate_scrub(corpus, width=10, min_docs=3).collect()}
    # the shared segment is boilerplate: dropped from ALL three docs,
    # including the first occurrence (contrast: passage_dedup keeps it)
    for d in (0, 1, 2):
        assert out[d]["n_segs"] == 2
        assert out[d]["n_boiler"] == 1
        assert out[d]["kept_words"] == 10
    assert out[3]["n_boiler"] == 0
    assert out[3]["kept_words"] == 11
    # kept text preserves original order => doc 3's hash is md5 of its own text
    import hashlib

    assert out[3]["clean_hash"] == hashlib.md5(
        "unique text entirely its own words here nothing shared at all".encode()
    ).hexdigest()


def test_boilerplate_all_boiler_doc_empties(spark):
    rows = [(i, BOILER, "en", "s") for i in range(4)]
    out = boilerplate_scrub(_docs(spark, rows), width=10, min_docs=3).collect()
    import hashlib

    empty = hashlib.md5(b"").hexdigest()
    for r in out:
        assert r["n_segs"] == 1 and r["n_boiler"] == 1
        assert r["kept_words"] == 0
        assert r["clean_hash"] == empty


def test_boilerplate_threshold_respects_distinct_docs(spark):
    # segment repeated TWICE in one doc counts as one distinct doc
    seg = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        (0, seg + " " + seg, "en", "s"),
        (1, "totally different body of ten words padding out the doc", "en", "s"),
    ]
    out = {r["doc_id"]: r for r in boilerplate_scrub(_docs(spark, rows), width=10, min_docs=2).collect()}
    assert out[0]["n_boiler"] == 0  # only 1 distinct doc -> not boilerplate


def test_dsir_top_quartile_and_determinism(spark):
    rows = [
        (i, ("english stopword heavy the and of to " if i % 2 == 0 else "mot francais ") * 5,
         "en" if i % 2 == 0 else "fr", "s")
        for i in range(8)
    ]
    out = dsir_weights(_docs(spark, rows), target_lang="en").collect()
    assert len(out) == 8
    kept = sorted(r["doc_id"] for r in out if r["keep"])
    assert len(kept) == 2  # top quartile of 8
    # en-feature docs carry the higher importance toward the en target
    assert all(d % 2 == 0 for d in kept)
    # run twice: integer-micros weights are bit-identical
    again = {r["doc_id"]: r["weight_micros"] for r in dsir_weights(_docs(spark, rows)).collect()}
    assert {r["doc_id"]: r["weight_micros"] for r in out} == again


def test_keep_best_picks_highest_quality(spark):
    # docs 0/1 identical text -> hamming 0 pair -> one group; quality
    # ties exactly, so min doc_id (0) must win; doc 2 is its own group
    shared = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, shared, "en", "s"),
        (1, shared, "en", "s"),
        (2, "small doc", "en", "s"),
    ]
    out = {r["group_id"]: r for r in keep_best(_docs(spark, rows)).collect()}
    g = out[0]
    assert g["group_size"] == 2 and g["rep_doc_id"] == 0
    assert out[2]["group_size"] == 1 and out[2]["rep_doc_id"] == 2
    # longer doc scores higher quality than the 2-word doc
    assert g["rep_quality"] > out[2]["rep_quality"]


def test_keep_best_quality_argmax_not_min_id(spark):
    # near-identical pair where the HIGHER doc_id has better quality:
    # doc 1 = doc 0 plus extra stopword-rich words (longer + more
    # stopwords => higher quality_score); simhash over word features
    # stays within hamming<=3 for a 1-word suffix change on 12 shared
    # words -- verify via the returned group rather than assuming
    base = "the quick brown fox jumps over the lazy dog and the cat sat on the mat"
    rows = [
        (0, base, "en", "s"),
        (1, base + " with the and of to that have been more words", "en", "s"),
    ]
    out = keep_best(_docs(spark, rows)).collect()
    if len(out) == 1:  # pair landed in one group: argmax must pick doc 1
        assert out[0]["rep_doc_id"] == 1 and out[0]["group_size"] == 2
    else:  # signature moved beyond the radius: both singleton groups
        assert sorted(r["rep_doc_id"] for r in out) == [0, 1]


def test_boilerplate_plan_broadcasts_segment_table(spark, corpus):
    plan = boilerplate_scrub(corpus)._jdf.queryExecution().toString()
    assert "broadcast" in plan.lower()


def test_curate_v3_boiler_gate_and_partition(spark):
    from onnxtr_spark.functions.curate import curate_v3, curation_funnel

    # 3 docs that are pure boilerplate (same 10-word segment) + quality
    # fillers; v3 must route the boiler docs through 'boiler_heavy'
    # unless an earlier gate claims them, and the funnel must partition
    # the corpus exactly
    filler = (
        "the quick brown fox jumps over the lazy dog and then the cat "
        "sat on the mat with all of its nine lives intact today "
        "while the sun was shining over the green hills far away "
        "and every word here is part of one long english sentence that "
        "keeps going to pass the quality length floor easily enough"
    )
    # ids avoid doc_id % 97 == 0 (the contamination eval holdout)
    rows = [(1 + i, BOILER, "en", "s") for i in range(3)] + [
        (10 + j, filler + f" tail{j}", "en", "s") for j in range(4)
    ]
    docs = _docs(spark, rows)
    audited = curate_v3(docs, gopher_min_words=5, gopher_min_stop_hits=1)
    stages = {r["stage"]: r["n_docs"] for r in curation_funnel(audited).collect()}
    assert sum(stages.values()) == len(rows)
    # the boiler docs fail SOME gate before reaching 'kept' — with the
    # shared-text corpus they are exact dups first, then boiler_heavy
    by_doc = {r["doc_id"]: r["kept_by"] for r in audited.collect()}
    assert by_doc[2] == "exact_dup" and by_doc[3] == "exact_dup"
    assert by_doc[1] in ("boiler_heavy", "low_quality")


def test_dsir_plan_broadcasts_model_and_no_cartesian(spark, corpus):
    plan = dsir_weights(corpus)._jdf.queryExecution().toString()
    low = plan.lower()
    assert "broadcast" in low  # contrib model table joins broadcast
    assert "cartesianproduct" not in low


def test_boilerplate_invariants_property(spark):
    # random corpora: segment accounting must always balance
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 35))), "en", "s")
        for i in range(30)
    ]
    docs = _docs(spark, rows)
    width = 7
    out = boilerplate_scrub(docs, width=width, min_docs=2).collect()
    words = {r[0]: len(r[1].split()) for r in rows}
    assert len(out) == len(rows)
    for r in out:
        n_words = words[r["doc_id"]]
        assert r["n_segs"] == max(1, -(-n_words // width))
        assert 0 <= r["n_boiler"] <= r["n_segs"]
        # kept_words + words inside boiler segments == total words
        assert r["kept_words"] <= n_words
        if r["n_boiler"] == 0:
            assert r["kept_words"] == n_words


def test_weighted_sample_semantics(spark):
    """A-ES invariants: exactly k rows, distinct docs, and the selected
    set IS the top-k of the full keyed ranking (recomputed brute-force
    over every doc, same hash/quantization)."""
    import math

    from onnxtr_spark.functions.hashing import hash64
    from onnxtr_spark.functions.selection import WSAMPLE_SEED, weighted_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    k = 20
    got = weighted_sample(docs, k=k).collect()
    assert len(got) == k
    assert len({r["doc_id"] for r in got}) == k

    # brute-force reference ranking in pure python
    all_rows = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("w"),
        hash64(F.col("doc_id").cast("string"), WSAMPLE_SEED).alias("h"),
    ).collect()
    keyed = sorted(
        (
            (-math.floor(math.log((r["h"] + 1) / float(2**60)) / r["w"] * 1e6 + 0.5), r["doc_id"])
            for r in all_rows
        ),
    )[:k]
    expect = {d for _, d in keyed}
    assert {r["doc_id"] for r in got} == expect
    # weights surfaced for downstream Horvitz-Thompson correction
    assert all(r["weight"] > 0 for r in got)


def test_weighted_sample_weight_monotonicity(spark):
    """With equal hashes impossible, heavier docs must win strictly
    more often: compare inclusion rate of the top-weight quartile vs
    the bottom quartile on the real corpus."""
    from onnxtr_spark.functions.selection import weighted_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    chosen = {r["doc_id"] for r in weighted_sample(docs, k=n // 2).collect()}
    rows = sorted(docs.select("doc_id", "n_chars").collect(), key=lambda r: r["n_chars"])
    q = len(rows) // 4
    lo = sum(1 for r in rows[:q] if r["doc_id"] in chosen) / q
    hi = sum(1 for r in rows[-q:] if r["doc_id"] in chosen) / q
    assert hi > lo


def test_curate_v4_substr_gate_and_partition(spark):
    """v4 routes a doc dominated by a corpus-duplicated passage through
    'substr_heavy' (even though unique tails make it escape exact-dedup)
    and the funnel still partitions the corpus exactly."""
    from onnxtr_spark.functions.curate import curate_v4, curation_funnel

    passage = (
        "the quick brown fox jumps over the lazy dog and then the cat "
        "sat on the mat with all of its nine lives intact today while "
        "the sun was shining over the green hills far away in peace"
    )
    rows = [
        (1, passage + " unique ending one", "en", "s"),
        (2, passage + " another ending two", "en", "s"),
        (10, "every word of this document is its own and it is long "
             "enough to pass the simple quality floor with some margin "
             "because it keeps adding fresh english words to the text", "en", "s"),
    ]
    docs = _docs(spark, rows)
    audited = curate_v4(docs, gopher_min_words=5, gopher_min_stop_hits=1)
    by_doc = {r["doc_id"]: r["kept_by"] for r in audited.collect()}
    # docs 1/2 share >90% of their characters verbatim but are NOT
    # byte-equal: exact-dedup keeps both, every earlier gate passes
    # them, and the ExactSubstr gate claims BOTH copies
    assert by_doc[1] == "substr_heavy" and by_doc[2] == "substr_heavy"
    assert by_doc[10] != "substr_heavy"
    stages = {r["stage"]: r["n_docs"] for r in curation_funnel(audited).collect()}
    assert sum(stages.values()) == len(rows)
