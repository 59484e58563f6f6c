"""Scale properties of the random-hyperplane LSH near-pair path.

Round-2 verdict finding #1: raw sign-bit codes were capped at 16 bits
by the embedding dimension, so candidate generation re-quadratized past
~8M vectors. These tests pin the fix:

- code width now scales with N far past 16 bits (simulated N ≫ 8M);
- oversize buckets are refined by population-sized extra sign bits, so
  the worst bucket's all-pairs work stays bounded even when one code
  value captures a disproportionate share of the collection;
- the Spark bucketing/splitting is reproduced exactly by an independent
  numpy model (integer-valued embeddings make every dot product exact,
  so the sign comparison is engine-independent by construction).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from onnxtr_spark.functions import similarity as sim


def test_ann_bits_scale_past_16():
    # 10^10 vectors: ceil(log2(1e10 / 128)) = 27 — the old cap (16) is gone
    assert sim._ann_bits(10**10) == 27
    assert sim._ann_bits(8_000_000) > 15
    # ceiling only binds at ~1.4e14 vectors
    assert sim._ann_bits(10**15) == sim.LSH_MAX_BITS == 40
    assert sim._ann_bits(100) == 4  # floor unchanged


def test_hyperplanes_deterministic_and_dim_free():
    a = sim._hyperplane(0, 23, 64)
    b = sim._hyperplane(0, 23, 64)
    assert a == b and len(a) == 64
    # widening the dimension extends the same prefix (Spark derives dim
    # from the data; the static oracle embeds dim=LSH_DIM literals)
    assert sim._hyperplane(0, 23, 8) == a[:8]
    # planes are distinct across (band, bit)
    assert sim._hyperplane(1, 23, 64) != a
    assert sim._hyperplane(0, 24, 64) != a
    assert all(abs(v) <= sim._PLANE_SCALE for v in a)


def test_split_mask_ladder_spark_matches_sql(spark):
    """The integer split ladder: mask = 2^e - 1 for the smallest e with
    bsz <= CAP·2^e, capped at LSH_EXTRA_BITS — identical in both engines."""
    import duckdb

    cap = sim.LSH_SPLIT_CAP
    sizes = [1, cap, cap + 1, 2 * cap, 2 * cap + 1, 4 * cap, 5 * cap, 10**9]
    expect = [0, 0, 1, 1, 3, 3, 7, 2**sim.LSH_EXTRA_BITS - 1]
    df = spark.createDataFrame(pd.DataFrame({"bsz": sizes}))
    got = {r["bsz"]: r["m"] for r in df.select("bsz", sim._split_mask(F.col("bsz")).alias("m")).collect()}
    assert [got[s] for s in sizes] == expect
    con = duckdb.connect()
    rows = con.sql(
        "SELECT bsz, " + sim._split_mask_sql("bsz") + " AS m FROM (SELECT unnest("
        + str(sizes) + ") AS bsz)"
    ).fetchall()
    assert [m for _, m in sorted(rows, key=lambda r: sizes.index(r[0]))] == expect


def test_oversize_buckets_refined_matches_numpy_model(spark, monkeypatch):
    """End-to-end splitting under a lowered cap: Spark's candidate pairs
    equal an independent numpy reconstruction, and every oversize bucket
    is actually broken up (post-split worst group < pre-split size)."""
    monkeypatch.setattr(sim, "LSH_SPLIT_CAP", 16)
    rng = np.random.default_rng(7)
    n, dim, bits = 400, 8, 4
    emb = rng.integers(-5, 6, size=(n, dim)).astype(float)  # integer-valued: exact dots
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [list(map(float, v)) for v in emb]})
    )
    # threshold=-1 keeps every candidate pair -> compares candidate GENERATION
    got = {(r.vec_a, r.vec_b) for r in sim.lsh_near_pairs(df, bits=bits, threshold=-1.0).collect()}

    # independent numpy model of the same bucketing/splitting
    def code(vecs, band, base, width):
        planes = np.array([sim._hyperplane(band, base + i, dim) for i in range(width)], dtype=float)
        signs = (vecs @ planes.T) >= 0
        return (signs * (1 << np.arange(width))).sum(axis=1)

    def mask_of(bsz):
        for e in range(sim.LSH_EXTRA_BITS, 0, -1):
            if bsz > 16 * 2 ** (e - 1):
                return 2**e - 1
        return 0

    expected = set()
    worst_pre, worst_post = 0, 0
    for band in range(sim.LSH_ANN_BANDS):
        bucket = code(emb, band, 0, bits)
        xcode = code(emb, band, sim.LSH_MAX_BITS, sim.LSH_EXTRA_BITS)
        for b in np.unique(bucket):
            members = np.nonzero(bucket == b)[0]
            worst_pre = max(worst_pre, len(members))
            sub = xcode[members].astype(int) & mask_of(len(members))
            for s in np.unique(sub):
                grp = members[sub == s]
                worst_post = max(worst_post, len(grp))
                for i in range(len(grp)):
                    for j in range(i + 1, len(grp)):
                        expected.add((int(grp[i]), int(grp[j])))
    assert got == expected
    # with bits=4 over 400 random vectors, buckets average ~25 ≫ cap 16:
    # splitting must have engaged and reduced the worst group
    assert worst_pre > 16
    assert worst_post < worst_pre


def test_bits_beyond_16_runs_and_keeps_duplicates(spark):
    """A 20-bit code (impossible under the old dim-capped scheme with
    64-dim vectors sliced across 2 bands) runs and still pairs exact
    duplicates — identical vectors share every hyperplane sign."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(25, 64))
    emb = np.vstack([base, base[:5]])  # vec 25+i duplicates vec i
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(30), "embedding": [list(map(float, v)) for v in emb]})
    )
    pairs = {(r.vec_a, r.vec_b) for r in sim.lsh_near_pairs(df, bits=20, threshold=0.999).collect()}
    assert {(i, 25 + i) for i in range(5)} <= pairs


@pytest.mark.parametrize("n,target", [(10**9, None), (10**12, None)])
def test_expected_bucket_population_bounded(n, target):
    """At any N, 2^bits ≥ N / (2·LSH_TARGET_BUCKET) until the 40-bit
    ceiling (~1.4e14 vectors) — the expected bucket under balanced bits
    stays ≤ 2·LSH_TARGET_BUCKET, so within-bucket all-pairs work per
    vector is O(LSH_TARGET_BUCKET), independent of N."""
    bits = sim._ann_bits(n)
    assert n / 2**bits <= 2 * sim.LSH_TARGET_BUCKET


def test_bucket_sizes_partial_aggregated_no_window(spark):
    """Round-3 verdict finding #2: bucket population must come from a
    partial-aggregated groupBy count, never a window over the raw
    (band, bucket) rows — a window gathers a skewed bucket (10^9
    identical vectors) into ONE task before the oversize refinement can
    split it. Assert the physical plan has NO Window operator and no
    sort over the raw code rows; the only (band, bucket) aggregation is
    a HashAggregate (map-side partial + final)."""
    rng = np.random.default_rng(3)
    emb = rng.integers(-5, 6, size=(64, 8)).astype(float)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(64), "embedding": [list(map(float, v)) for v in emb]})
    )
    plan = sim.lsh_near_pairs(df, bits=4)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_lsh_near_pairs_empty_table(spark):
    """N=0: first(size(embedding)) is NULL — must return an empty
    (vec_a, vec_b, sim) frame, not raise (round-3 advice)."""
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = sim.lsh_near_pairs(df)
    assert out.columns == ["vec_a", "vec_b", "sim"]
    assert out.count() == 0


def test_lsh_near_pairs_recall_vs_bruteforce(spark):
    """Quality evidence for the hyperplane family: recall of true
    high-similarity pairs against a numpy brute-force ground truth.
    Theory: a pair at angle θ collides in one b-bit band with
    probability (1−θ/π)^b; bands OR. For sim ≥ 0.95 (θ ≤ 18°),
    b=4, 2 bands → ≥ 1−(1−0.9^4)²  ≈ 0.88 expected; exact duplicates
    are always recovered. Deterministic seed → pinned lower bound."""
    rng = np.random.default_rng(42)
    base = rng.normal(size=(300, 32))
    # plant 60 true near-duplicates: small perturbations of base rows
    planted = base[:60] + rng.normal(scale=0.05, size=(60, 32))
    emb = np.vstack([base, planted])
    n = len(emb)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [list(map(float, v)) for v in emb]})
    )
    got = {(r.vec_a, r.vec_b) for r in sim.lsh_near_pairs(df, bits=4, threshold=0.9).collect()}

    norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = norm @ norm.T
    truth = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if np.floor(sims[i, j] * 1000 + 0.5) / 1000 >= 0.9
    }
    assert truth, "fixture must contain true near-dup pairs"
    found = len(got & truth)
    recall = found / len(truth)
    assert recall >= 0.8, f"recall {recall:.2f} over {len(truth)} true pairs"
    # no false accepts: every emitted pair really is >= threshold
    assert got <= truth


# --- SemDeDup ---------------------------------------------------------------


def _semdedup_fixture(spark):
    """16 integer-valued vectors in 2 obvious clusters (x-axis-ish vs
    y-axis-ish) with planted near-copies; integer coords make every
    dot/norm engine-exact."""
    rows = []
    for i in range(8):  # cluster around (10, jitter): ids 0..7
        rows.append((i, 0, [10.0, float(i % 3)]))
    for i in range(8, 16):  # cluster around (jitter, 10): ids 8..15
        rows.append((i, 1, [float(i % 3), 10.0]))
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")


def test_semdedup_min_id_always_kept_per_cell(spark):
    out = sim.semdedup(_semdedup_fixture(spark), k=2, iters=1, threshold=0.9).toPandas()
    assert len(out) == 16
    for _, grp in out.groupby("cell"):
        first = grp.loc[grp["vec_id"].idxmin()]
        assert first["max_prior_sim"] == -1.0 and bool(first["kept"])


def test_semdedup_drops_exact_copies_keeps_distinct(spark):
    df = _semdedup_fixture(spark)
    out = sim.semdedup(df, k=2, iters=1, threshold=0.999).toPandas().set_index("vec_id")
    # ids 0 and 3 and 6 share embedding [10,0]: lowest (0) kept, 3 & 6 dropped
    assert bool(out.loc[0, "kept"]) and not bool(out.loc[3, "kept"]) and not bool(out.loc[6, "kept"])
    # id 1 ([10,1]) is not an exact copy of any lower id: cos < 0.999 -> kept
    assert bool(out.loc[1, "kept"])


def test_semdedup_quadratic_confined_to_cells(spark):
    """The pairwise stage joins on cell, so a cosine-identical vector in
    the OTHER cell must never cause a drop. k-means assigns by L2 while
    the dedup rule uses cosine, so colinear vectors of very different
    MAGNITUDE are guaranteed to split across cells (seeds 0=[1,0] and
    1=[100,0]) while every cross-cell cosine is exactly 1.0."""
    rows = [
        (0, 0, [1.0, 0.0]), (1, 1, [100.0, 0.0]),
        (2, 0, [1.1, 0.0]), (3, 1, [99.0, 0.0]),
        (4, 0, [0.9, 0.0]), (5, 1, [101.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = sim.semdedup(df, k=2, iters=1, threshold=0.999).toPandas().set_index("vec_id")
    # the construction really did split the colinear set across 2 cells
    assert out.loc[0, "cell"] != out.loc[1, "cell"]
    assert set(out["cell"]) == {out.loc[0, "cell"], out.loc[1, "cell"]}
    # each cell keeps its min-id member even though vectors in the other
    # cell have cosine 1.0 to it (cross-cell pairs must not count)...
    assert bool(out.loc[0, "kept"]) and bool(out.loc[1, "kept"])
    # ...and a leak of cross-cell pairs would also flip vec 1's
    # max_prior_sim from -1.0 (no lower id in ITS cell) to 1.0
    assert out.loc[1, "max_prior_sim"] == -1.0
    # within-cell duplicates are still dropped
    assert not bool(out.loc[2, "kept"]) and not bool(out.loc[3, "kept"])
