"""Deduplication operators: exact, MinHash+LSH, SimHash, token Jaccard.

Spark-first shapes:

- exact: one hash-groupBy (map-side combine; the canonical-doc pick is
  a min aggregate, no window needed).
- MinHash: explode shingles once, aggregate K mins in a single groupBy
  (K agg exprs — one shuffle, not K); band keys derived by column math.
  LSH candidates come from a self-join on (band, band_key) — at scale
  the banded table is bucketed on band_key so the join is co-located.
- SimHash: explode tokens once, 16 conditional sums in one groupBy.
- token Jaccard: prefix-filtered inverted-index self-join (exact at
  the threshold, SSJoin-style): only each doc's ⌊(1-t)·|X|⌋+1
  rarest-by-global-DF tokens are indexed, so high-DF stopwords never
  fan out d²; intersections are verified per candidate pair via
  array_intersect. MinHash-LSH above is the subquadratic
  approximation when even the candidate set must shrink.

All JVM-side; md5-based hashing for cross-engine oracles (hashing.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from onnxtr_spark.functions.hashing import hash64, hash64_sql
from onnxtr_spark.functions.text import _TOKENS_SQL, _shingles_sql, shingles, tokens
from onnxtr_spark.partitioning import spread

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


def prefix_tokens(documents: DataFrame, threshold: float) -> DataFrame:
    """Prefix-filtered inverted-index tokens: (doc_id, tok, n).

    Exact prefix filtering (SSJoin/PPJoin family): order each doc's
    distinct tokens by GLOBAL document frequency ascending (rarest
    first, ties by token string — a total order), and index only the
    first ``|X| - ceil(t·|X|) + 1`` tokens. Two docs with Jaccard ≥ t
    share ≥ ceil(t·max(|A|,|B|)) tokens, so their prefixes must
    intersect — no qualifying pair is lost. A stopword like "the" sits
    LAST in every ordering and is indexed only by docs that are almost
    entirely stopwords, so the d² blowup on high-DF tokens is gone:
    the index size per doc is ≤ ⌊(1-t)·|X|⌋+1 (10% + 1 at t=0.9).
    """
    toks = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(F.array_distinct(tokens())).alias("tok")
    )
    df_counts = toks.groupBy("tok").agg(F.count("*").alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy("df", "tok")
    wn = Window.partitionBy("doc_id")
    # ceil(t·n) in exact arithmetic: t quantized to 4 decimals so the
    # double division num·n/10⁴ is either an exact integer or ≥ 1e-4
    # from one — naive ceil(0.9·10) is 10 in IEEE and would over-shrink
    # the prefix, silently dropping boundary pairs with J exactly = t.
    num = int(round(threshold * 10000))
    alpha = F.ceil((F.lit(num) * F.col("n")).cast("double") / F.lit(10000.0))
    return (
        toks.join(df_counts, "tok")
        .withColumn("pos", F.row_number().over(wdoc))
        .withColumn("n", F.count("*").over(wn).cast("long"))
        .where(F.col("pos") <= F.col("n") - alpha + 1)
        .select("doc_id", "tok", "n")
    )


def token_jaccard_pairs(documents: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs: (doc_a, doc_b, jaccard)
    with jaccard >= threshold, rounded to 4.

    Candidate generation is a self-join on the PREFIX index only (see
    ``prefix_tokens`` — bounded per-doc fanout, exact at the
    threshold); the exact |A∩B| is then computed per candidate pair
    from per-doc sorted token arrays (``array_intersect``), so the
    verify cost is per candidate, never per shared-token occurrence.
    Output is identical to the unbounded inverted-index formulation —
    the DuckDB oracle is unchanged."""
    documents = spread(documents)
    toks = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(F.array_distinct(tokens())).alias("tok")
    )
    prefix = prefix_tokens(documents, threshold)
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        # exact size bound implied by the final test (inter <= min,
        # uni >= max => 10^4*min >= num*max): prunes candidates BEFORE
        # the distinct+verify without losing any qualifying pair
        .where(
            F.lit(10000) * F.least("na", "nb") >= F.lit(int(round(threshold * 10000))) * F.greatest("na", "nb")
        )
        .distinct()
    )
    docsets = toks.groupBy("doc_id").agg(F.sort_array(F.collect_list("tok")).alias("toks"))
    from onnxtr_spark.functions.hashing import round_half_up

    # Threshold filter in exact integer arithmetic (10⁴·inter ≥ num·union):
    # the prefix filter guarantees candidates only for TRUE jaccard ≥ t,
    # so filtering on the ROUNDED value would admit pairs in [t-5e-5, t)
    # that the prefix index may legitimately have dropped — an oracle
    # mismatch waiting to happen. Rounding is display-only, half-up in
    # both engines.
    num = int(round(threshold * 10000))
    return (
        cands.join(docsets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("toks", "ta"), "doc_a")
        .join(docsets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("toks", "tb"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("ta", "tb")).cast("long"))
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .where(F.lit(10000) * F.col("inter") >= F.lit(num) * F.col("uni"))
        .select("doc_a", "doc_b", round_half_up(F.col("inter") / F.col("uni"), 4).alias("jaccard"))
    )


def token_jaccard_pairs_sql(threshold: float = 0.9) -> str:
    from onnxtr_spark.functions.hashing import round_half_up_sql

    num = int(round(threshold * 10000))
    jac = round_half_up_sql("inter::DOUBLE / (sa.n + sb.n - inter)", 4)
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
       {jac} AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 10000 * inter >= {num} * (sa.n + sb.n - inter)
"""


SIMHASH_BITS = 16


def simhash(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over token frequencies: (doc_id, simhash)."""
    documents = spread(documents)
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


def near_dup_groups(documents: DataFrame, threshold: float = 0.9, max_iters: int = 20) -> DataFrame:
    """Canonical near-dup GROUP assignment: (doc_id, group_id) for every
    document, where group_id is the minimum doc_id of its connected
    component in the verified near-dup graph (token Jaccard >= t pairs
    from the prefix-filtered SSJoin above).

    This is the step that actually deduplicates a corpus — pairs alone
    don't say which copies to keep. Connected components run as
    iterative hash-min label propagation with POINTER JUMPING
    (label(v) <- min(label(v), labels of neighbors, label(label(v)))):
    the jump halves label-chain depth each round, so convergence is
    O(log diameter) rounds, not O(diameter) — the property that makes
    this viable on web-scale duplicate chains. Each round is two
    equi-joins + one groupBy; the driver-side loop checks a single
    convergence count per round (control-plane scalar, like IVF
    centroid training) and localCheckpoints the label table so the
    plan/lineage does not grow with iterations.
    """
    pairs = token_jaccard_pairs(documents, threshold).select("doc_a", "doc_b")
    nodes = documents.select(F.col("doc_id").cast("long").alias("node")).distinct()
    return connected_components(nodes, pairs, max_iters).select(
        F.col("node").alias("doc_id"), F.col("label").alias("group_id")
    )


def connected_components(nodes: DataFrame, pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """(node, label) with label = min node id of the connected
    component — the reusable core of near_dup_groups (hash-min label
    propagation with pointer jumping; see that docstring for the
    O(log diameter) argument). ``pairs`` is any (doc_a, doc_b) edge
    relation; it is materialized once before the loop."""
    # materialize the edge list ONCE — every round's neighbor-min join
    # re-reads it, and without the checkpoint each iteration would
    # re-run the entire candidate pipeline from the raw input
    edges = (
        pairs.unionByName(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .withColumnsRenamed({"doc_a": "node", "doc_b": "peer"})
        .localCheckpoint()
    )

    labels = nodes.withColumn("label", F.col("node")).localCheckpoint()
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.peer == labels.node)
            .groupBy(edges.node.alias("n"))
            .agg(F.min("label").alias("nmin"))
        )
        jumped = labels.alias("l").join(
            labels.select(F.col("node").alias("jn"), F.col("label").alias("jlabel")),
            F.col("l.label") == F.col("jn"),
        ).select(F.col("l.node").alias("node"), F.col("jlabel").alias("plabel"))
        # carry the previous label through the checkpoint so convergence
        # is a cheap filter-count on the materialized frame, not another
        # full old-vs-new equi-join per round
        stepped = (
            labels.join(neighbor_min, labels.node == F.col("n"), "left")
            .join(jumped.withColumnsRenamed({"node": "jnode"}), labels.node == F.col("jnode"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nmin"), F.col("label")),
                    F.coalesce(F.col("plabel"), F.col("label")),
                ).alias("new_label"),
                F.col("label").alias("old_label"),
            )
            .localCheckpoint()
        )
        changed = stepped.where(F.col("new_label") != F.col("old_label")).count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels


def near_dup_groups_sql(threshold: float = 0.9) -> str:
    """DuckDB oracle: transitive closure via recursive CTE, then the
    min reachable node per doc (fine at oracle scale; the Spark side is
    the log-round algorithm that survives web scale)."""
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  {token_jaccard_pairs_sql(threshold)}
), edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(node, other) AS (
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.other
)
SELECT node AS doc_id, min(other) AS group_id FROM reach GROUP BY node
"""


SIMHASH_HAM_K = 3  # near-dup hamming radius
SIMHASH_NP_BITS = 32  # near-pair sigs are wider than the per-doc 16-bit export
# (probed at sf0.01: 16-bit/k=3 passes 27% of ALL pairs — no discrimination;
# 32-bit/k=3 passes 0.85%, real near-dups only)


def simhash_near_pairs(
    documents: DataFrame, bits: int = SIMHASH_NP_BITS, k: int = SIMHASH_HAM_K
) -> DataFrame:
    """Sub-quadratic SimHash near-dup pairs: (doc_a, doc_b, hamming)
    with hamming(sig_a, sig_b) ≤ k.

    Pigeonhole banding: the signature splits into k+1 disjoint bit
    bands — any pair within hamming k differs in at most k bands, so
    it agrees EXACTLY on at least one. Candidate generation is a
    band-key equi-join (shuffle keyed on (band, masked-sig), never
    all-pairs), candidates dedup before the single bit_count verify.
    The DuckDB oracle is the brute-force quadratic definition — a green
    row proves the banding loses no pair. At 10^12 docs the quadratic
    form is impossible and THIS is the shape that survives; duplicate-
    heavy band keys split exactly like the LSH buckets (same key
    discipline as minhash_bands)."""
    sigs = simhash(documents, bits)
    nb = k + 1
    w = bits // nb
    bands = []
    for b in range(nb):
        lo = b * w
        width = bits - lo if b == nb - 1 else w
        mask = ((1 << width) - 1) << lo
        bands.append(
            F.struct(F.lit(b).alias("band"), F.col("simhash").bitwiseAND(F.lit(mask)).alias("key"))
        )
    withb = sigs.select(
        "doc_id", "simhash", F.explode(F.array(*bands)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cands = (
        withb.alias("a")
        .join(withb.alias("b"), ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long"))
        .where(F.col("hamming") <= k)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_near_pairs_sql(bits: int = SIMHASH_NP_BITS, k: int = SIMHASH_HAM_K) -> str:
    """Brute-force quadratic definition — intentionally a DIFFERENT
    algorithm than the banded Spark path, so the oracle checks the
    banding's completeness, not just arithmetic."""
    return f"""
WITH sigs AS ({simhash_sql(bits)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {k}
"""


NGRAM_N = 5  # character n-gram width for ngram_jaccard_pairs
NGRAM_THRESHOLD = 0.8


def _char_ngrams(n: int, norm=None):
    """Distinct character n-grams of the whitespace-normalized text.

    Pass ``norm`` as a pre-materialized column when calling in a hot
    path: expressions referenced inside a ``transform`` lambda are
    re-evaluated PER ELEMENT, so leaving the default regexp normalizer
    inline runs the regex once per gram position (~|text| times per
    doc) instead of once per doc."""
    if norm is None:
        norm = _norm_text()
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(norm) - n + 1)),
            lambda i: F.substring(norm, i, n),
        )
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = NGRAM_N, threshold: float = NGRAM_THRESHOLD
) -> DataFrame:
    """Exact CHARACTER-n-gram Jaccard near-dup pairs:
    (doc_a, doc_b, jaccard ≥ threshold, rounded to 4) — the
    word-robust sibling of ``token_jaccard_pairs`` (n-grams survive
    word-boundary edits and agglutinative text where token sets
    don't). Same SSJoin discipline: global-DF-ascending prefix index
    (≤ ⌊(1-t)·|X|⌋+1 grams per doc — no qualifying pair lost, no d²
    blowup on frequent grams), candidate equi-join on prefix grams
    only, exact array_intersect verify per candidate pair.

    Cost shape for scale: grams are xxhash64'd to int64 BEFORE any
    shuffle (equality joins and set intersection only, so hashing
    preserves exactness up to 64-bit collisions; the oracle, a
    different engine, hashes with its own function — hashes never
    cross engines or reach the output). The hashed doc→gram-set
    relation is materialized once (localCheckpoint) and feeds the DF
    count, the prefix index, and both verify sides; the per-doc
    global-DF prefix is an ``array_sort``+``slice`` over collected
    (df, gram) structs — no row_number window re-sorting every gram
    occurrence. The threshold filter is exact integer arithmetic
    (10⁴·inter ≥ num·union with num = round(t·10⁴)) so no pair at the
    boundary is lost to display rounding in either engine."""
    from onnxtr_spark.functions.hashing import round_half_up

    num = int(round(threshold * 10000))  # exact-ceil quantization (see prefix_tokens)
    docsets = (
        spread(documents)
        .select(F.col("doc_id").cast("long").alias("doc_id"), _norm_text().alias("norm"))
        .select(
            "doc_id",
            F.array_sort(
                F.transform(_char_ngrams(n, F.col("norm")), lambda g: F.xxhash64(g))
            ).alias("gs"),
        )
        .withColumn("ng", F.size("gs").cast("long"))
        .localCheckpoint(eager=False)
    )
    grams = docsets.select("doc_id", "ng", F.explode("gs").alias("g"))
    df_counts = grams.groupBy("g").agg(F.count("*").alias("df"))
    alpha = F.ceil((F.lit(num) * F.col("ng")).cast("double") / F.lit(10000.0))
    plen = (F.col("ng") - alpha + 1).cast("int")
    prefix = (
        grams.join(df_counts, "g")
        .groupBy("doc_id", "ng")
        .agg(F.array_sort(F.collect_list(F.struct("df", "g"))).alias("dg"))
        .select("doc_id", "ng", F.explode(F.slice("dg", F.lit(1), plen)).alias("s"))
        .select("doc_id", F.col("s.g").alias("g"), "ng")
    )
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "g")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.ng").alias("na"), F.col("b.ng").alias("nb"),
        )
        # exact size bound implied by the final test (inter <= min,
        # uni >= max => 10^4*min >= num*max): prunes candidates BEFORE
        # the distinct+verify without losing any qualifying pair
        .where(F.lit(10000) * F.least("na", "nb") >= F.lit(num) * F.greatest("na", "nb"))
        .distinct()
    )
    return (
        cands.join(docsets.select(F.col("doc_id").alias("doc_a"), F.col("gs").alias("ga")), "doc_a")
        .join(docsets.select(F.col("doc_id").alias("doc_b"), F.col("gs").alias("gb")), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")).cast("long"))
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .where(F.lit(10000) * F.col("inter") >= F.lit(num) * F.col("uni"))
        .select("doc_a", "doc_b", round_half_up(F.col("inter") / F.col("uni"), 4).alias("jaccard"))
    )


def ngram_jaccard_pairs_sql(n: int = NGRAM_N, threshold: float = NGRAM_THRESHOLD) -> str:
    """Brute-force quadratic definition (a different algorithm than the
    prefix-filtered Spark path — the green row proves filter exactness).
    Grams are hashed to int64 (DuckDB's own hash(); never crosses
    engines) and pairs are pre-filtered by the exact size bound
    min(na,nb) ≥ t·max(na,nb) — both standard exact filters, so the
    oracle stays a full pairwise definition while list_intersect runs
    on int lists over far fewer pairs."""
    from onnxtr_spark.functions.hashing import round_half_up_sql

    num = int(round(threshold * 10000))
    jac = round_half_up_sql("inter::DOUBLE / uni", 4)
    return f"""
WITH g AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_transform(list_distinct([substring(norm, i, {n})
                        for i in range(1, greatest(1, length(norm) - {n} + 1) + 1)]),
                        s -> hash(s)) AS gs
  FROM (SELECT doc_id, {_NORM_SQL} AS norm FROM documents)
), sized AS (
  SELECT doc_id, gs, len(gs) AS ng FROM g
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.gs, b.gs)) AS inter,
         a.ng + b.ng - len(list_intersect(a.gs, b.gs)) AS uni
  FROM sized a JOIN sized b
    ON a.doc_id < b.doc_id
   AND 10000 * a.ng >= {num} * b.ng
   AND 10000 * b.ng >= {num} * a.ng
)
SELECT doc_a, doc_b, {jac} AS jaccard
FROM pairs
WHERE 10000 * inter >= {num} * uni
"""


# --- directional containment (partial-copy / quote detection) ---------------

CONTAIN_THRESHOLD = 0.9


def containment_pairs(
    documents: DataFrame, threshold: float = CONTAIN_THRESHOLD, k: int = 3
) -> DataFrame:
    """Directional shingle-set containment: (doc_a, doc_b, containment)
    with |A∩B|/|A| >= threshold over distinct k-word shingles — doc_a's
    content is (mostly) inside doc_b. The asymmetric complement of
    Jaccard: catches a short doc quoted or embedded in a long one,
    which symmetric Jaccard misses because the union is dominated by
    the long side. Word shingles (not tokens) are the unit — token
    containment is vacuous on small vocabularies.

    Exactness with a bounded index: a pair with C(A→B) ≥ t shares
    ≥ ceil(t·|A|) shingles, so A's prefix (its |A|-ceil(t·|A|)+1
    rarest-by-global-DF shingles) must hit SOME shingle of B. Only the
    CONTAINED side is prefix-pruned; the container side indexes all
    distinct shingles, and per-key fanout stays bounded because a
    boilerplate shingle enters a prefix only for docs that are almost
    entirely boilerplate. Shingles shuffle as int64 hashes (same
    md5-derived hash in the oracle, so any collision is shared and the
    row stays hash-exact). Threshold test in exact integer arithmetic
    (10⁴·inter ≥ num·|A|); rounding is display-only."""
    sh = shingles(documents, k).select(
        F.col("doc_id").cast("long").alias("doc_id"), hash64(F.col("shingle"), 29).alias("h")
    )
    dfc = sh.groupBy("h").agg(F.count("*").alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy("df", "h")
    wn = Window.partitionBy("doc_id")
    num = int(round(threshold * 10000))
    alpha = F.ceil((F.lit(num) * F.col("n")).cast("double") / F.lit(10000.0))
    prefix = (
        sh.join(dfc, "h")
        .withColumn("pos", F.row_number().over(wdoc))
        .withColumn("n", F.count("*").over(wn).cast("long"))
        .where(F.col("pos") <= F.col("n") - alpha + 1)
        .select("doc_id", "h", "n")
    )
    cands = (
        prefix.alias("a")
        .join(sh.alias("b"), "h")
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
        )
        .distinct()
    )
    docsets = sh.groupBy("doc_id").agg(F.sort_array(F.collect_list("h")).alias("hs"))
    from onnxtr_spark.functions.hashing import round_half_up

    return (
        cands.join(docsets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("hs", "ha"), "doc_a")
        .join(docsets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("hs", "hb"), "doc_b")
        # directional size bound implied by the final test (inter <= |B|,
        # so num*na <= 10^4*inter requires num*na <= 10^4*|B|): skips the
        # array_intersect for container sides too small to qualify
        .where(F.lit(10000) * F.size("hb") >= F.lit(num) * F.col("na"))
        .withColumn("inter", F.size(F.array_intersect("ha", "hb")).cast("long"))
        .where(F.lit(10000) * F.col("inter") >= F.lit(num) * F.col("na"))
        .select("doc_a", "doc_b", round_half_up(F.col("inter") / F.col("na"), 4).alias("containment"))
    )


def containment_pairs_sql(threshold: float = CONTAIN_THRESHOLD, k: int = 3) -> str:
    from onnxtr_spark.functions.hashing import round_half_up_sql

    num = int(round(threshold * 10000))
    cont = round_half_up_sql("inter::DOUBLE / sa.n", 4)
    return f"""
WITH sh AS (
  SELECT doc_id, {hash64_sql('shingle', 29)} AS h
  FROM ({_shingles_sql(k)})
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b USING (h)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, {cont} AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
WHERE 10000 * inter >= {num} * sa.n
"""


SUBSTR_L = 40  # ExactSubstr window width, characters
_SUBSTR_CHUNK = 1 << 16  # position-generation chunk: bounds per-row array size


def substring_dup_coverage(documents: DataFrame, length: int = SUBSTR_L) -> DataFrame:
    """ExactSubstr duplicated-substring coverage (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, how many character positions sit inside a
    ``length``-char substring that occurs at least twice ANYWHERE in
    the corpus (other docs or a repeat within the same doc). This is
    the substring-granular member of the dedup family — it catches
    verbatim passage reuse that set-level Jaccard/MinHash dilute and
    winnowing only samples. Emits (doc_id, n_grams, n_dup_pos,
    covered_chars, dup_frac); ``covered_chars`` merges overlapping
    duplicated windows exactly (union of intervals, not
    n_dup_pos·length).

    Lee et al. build a monolithic suffix array; the Spark-scale
    re-expression is windowed hashing — every position's
    ``length``-gram is xxhash64'd BEFORE any shuffle (the suffix
    array's "find repeats" reduces to equality on fixed-width windows,
    so only 8-byte hashes move; raw text never shuffles), one
    map-side-combined count finds repeated windows, a semi-join marks
    their positions, and interval union is a per-doc bounded window
    (lead over positions: each consecutive pair contributes
    min(gap, length)). The position table is materialized once and
    feeds both the count and the join back; the duplicated-hash set is
    small and broadcasts back (AQE), and the per-doc groupBy reuses
    the window's doc_id partitioning — one exchange per key, checked
    with .explain. The oracle groups RAW substrings — a different
    algorithm, so a green row proves the hashed path loses nothing at
    oracle scale. At corpus scale a 64-bit collision can only mark
    EXTRA positions as duplicated (never miss one) — birthday bound
    ~p²/2⁶⁵ for p positions, material past ~10¹⁰ positions; as a drop
    gate that errs toward removing a document whose hash collided, and
    a deployment needing certainty groups on (h, gram) for the ≥2
    verification at the cost of shuffling the colliding grams' text.

    Cost honesty at corpus scale: every position ships an 8-byte hash,
    so the repeat-count shuffle moves ~8x the corpus bytes. That is
    the exact form; at petabyte scale run the sampled pre-filter first
    (``winnow_fingerprints`` — winnowing guarantees windows at or
    above the guarantee length still collide) to shortlist candidate
    docs, then run this operator exactly on the shortlist."""
    pos = (
        spread(documents)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.length("text").alias("n"),
            F.col("text"),
        )
        .select(
            "doc_id",
            "n",
            # two-level position generation: one huge document must not
            # materialize its whole position array in a single row, so
            # explode chunk STARTS first (n/64Ki elements), then the
            # bounded within-chunk range — peak per-row array is 64Ki
            # regardless of document size
            F.explode(
                F.when(
                    F.col("n") >= length,
                    F.sequence(F.lit(1), F.col("n") - length + 1, F.lit(_SUBSTR_CHUNK)),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("cs"),
            F.col("text"),
        )
        .select(
            "doc_id",
            "n",
            F.explode(
                F.sequence(
                    F.col("cs"),
                    F.least(F.col("cs") + (_SUBSTR_CHUNK - 1), F.col("n") - length + 1),
                )
            ).alias("pos"),
            F.col("text"),
        )
        .select("doc_id", "n", "pos", F.xxhash64(F.expr(f"substring(text, pos, {length})")).alias("h"))
        .localCheckpoint(eager=False)
    )
    dup = pos.groupBy("h").agg(F.count("*").alias("cnt")).where(F.col("cnt") >= 2).select("h")
    w = Window.partitionBy("doc_id").orderBy("pos")
    marked = (
        pos.join(dup, "h")
        .select("doc_id", "pos")
        .withColumn("nxt", F.lead("pos").over(w))
    )
    cov = marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dup_pos"),
        F.sum(
            F.when(F.col("nxt").isNull(), F.lit(length)).otherwise(
                F.least(F.col("nxt") - F.col("pos"), F.lit(length))
            )
        )
        .cast("long")
        .alias("covered_chars"),
    )
    from onnxtr_spark.functions.hashing import round_half_up

    base = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").alias("n"),
        F.greatest(F.length("text") - length + 1, F.lit(0)).cast("long").alias("n_grams"),
    )
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_dup_pos", F.lit(0)).cast("long").alias("n_dup_pos"),
        F.coalesce("covered_chars", F.lit(0)).cast("long").alias("covered_chars"),
        round_half_up(
            F.coalesce("covered_chars", F.lit(0)).cast("double")
            / F.greatest(F.col("n"), F.lit(1)).cast("double"),
            4,
        ).alias("dup_frac"),  # greatest(n,1): empty doc -> 0.0 in BOTH engines (x/0 is NULL in Spark, NaN in DuckDB)
    )


def substring_dup_coverage_sql(length: int = SUBSTR_L) -> str:
    """Oracle: the definition over raw substrings (no hashing), same
    interval-union arithmetic."""
    from onnxtr_spark.functions.hashing import round_half_up_sql

    frac = round_half_up_sql(
        "COALESCE(covered_chars, 0)::DOUBLE / greatest(length(d.text), 1)::DOUBLE", 4
    )
    return f"""
WITH pos AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, i AS pos, substring(text, i, {length}) AS g
  FROM documents, UNNEST(generate_series(1, length(text) - {length} + 1)) AS u(i)
  WHERE length(text) >= {length}
), dup AS MATERIALIZED (
  SELECT g FROM pos GROUP BY g HAVING count(*) >= 2
), marked AS MATERIALIZED (
  SELECT p.doc_id, p.pos,
         lead(p.pos) OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS nxt
  FROM pos p JOIN dup USING (g)
), cov AS MATERIALIZED (
  SELECT doc_id, count(*) AS n_dup_pos,
         CAST(sum(CASE WHEN nxt IS NULL THEN {length}
                       ELSE least(nxt - pos, {length}) END) AS BIGINT) AS covered_chars
  FROM marked GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(greatest(length(d.text) - {length} + 1, 0) AS BIGINT) AS n_grams,
       COALESCE(n_dup_pos, 0) AS n_dup_pos,
       COALESCE(covered_chars, 0) AS covered_chars,
       {frac} AS dup_frac
FROM documents d LEFT JOIN cov ON cov.doc_id = CAST(d.doc_id AS BIGINT)
"""


def incremental_dedup(documents: DataFrame) -> DataFrame:
    """Incremental (cross-snapshot) dedup: the new crawl snapshot is
    deduplicated against the prior snapshot's content hashes, then
    exact-deduped within itself — the shape every recurring-crawl
    pipeline runs (CC snapshot N vs snapshots < N).

    The two snapshots are modeled deterministically from the corpus:
    even doc_ids = prior snapshot, odd = new. Survivors are new docs
    whose md5(normalized text) never appeared in the prior snapshot,
    collapsed to one canonical row per hash.

    Scale shape: the prior side reduces to DISTINCT hashes before the
    LEFT ANTI join — at 10^12 docs that's still O(corpus) but it is
    (a) one column wide, (b) hash-partitioned identically to the probe
    side, so AQE picks broadcast when small and a co-partitioned SMJ
    anti-join when not. The production variant replaces the exact
    anti-join with a bloom-filter pushdown (fpp-bounded) and keeps
    this join only for the bloom's false-positive candidates.
    """
    hashed = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(_norm_text()).alias("text_hash"),
    )
    prior = hashed.where(F.col("doc_id") % 2 == 0).select("text_hash").distinct()
    new = hashed.where(F.col("doc_id") % 2 == 1)
    return (
        new.join(prior, "text_hash", "left_anti")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").cast("long").alias("n_dups_in_new"),
        )
    )


INCREMENTAL_DEDUP_SQL = f"""
WITH hashed AS (
  SELECT doc_id, md5({_NORM_SQL}) AS text_hash FROM documents
), prior AS (
  SELECT DISTINCT text_hash FROM hashed WHERE doc_id % 2 = 0
)
SELECT text_hash, min(doc_id) AS canonical_doc_id, count(*) AS n_dups_in_new
FROM hashed
WHERE doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM prior p WHERE p.text_hash = hashed.text_hash)
GROUP BY 1
"""


BLOOM_BITS = 1 << 16  # 65536 bits = 1024 int64 words (sized for fpp<1% at ~5k prior keys)
BLOOM_K = 2           # independent probe hashes


def incremental_dedup_bloom(documents: DataFrame) -> DataFrame:
    """``incremental_dedup`` with its production scale path made real:
    the prior snapshot is summarized into a distributed Bloom filter
    (bit-OR aggregated int64 words), every new doc probes the broadcast
    filter, and ONLY the maybe-duplicate candidates pay the exact
    anti-join. Same answer by construction — Bloom filters have no
    false negatives, and every positive is verified — so this query
    shares ``INCREMENTAL_DEDUP_SQL`` as its oracle: the green row
    proves the filter+verify decomposition loses nothing.

    Scale shape: the filter build is one map-side-combined
    groupBy(word) over the prior snapshot — at 10^12 docs the filter
    relation is m/64 rows (size set by the target fpp, NOT by the
    corpus), broadcast once; the probe is a narrow broadcast join; and
    the exact anti-join's probe side shrinks from |new| to the
    candidate fraction (true dups + fpp). The bloom words never leave
    the JVM and use no driver-side state.
    """
    hashed = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(_norm_text()).alias("text_hash"),
    )
    prior = hashed.where(F.col("doc_id") % 2 == 0).select("text_hash").distinct()
    new = hashed.where(F.col("doc_id") % 2 == 1)
    # size the filter to the PRIOR SNAPSHOT (advice r5): a fixed 2^16
    # bits saturates past ~5k keys and the query silently degenerates
    # into the plain anti-join. One count() of the one-column distinct
    # prior is a control-plane scalar (the same discipline as the Lloyd
    # centroid collect); ~16 bits/key with k=2 probes keeps fpp ~1.6%
    # at any snapshot size. Filter sizing never changes the answer —
    # positives are exactly verified, negatives are exact by
    # construction.
    n_prior = prior.count()
    bloom_bits = max(BLOOM_BITS, 1 << (16 * max(n_prior, 1)).bit_length())

    def probes(df: DataFrame) -> DataFrame:
        # k independent bit positions from seeded xxhash64 (Spark-side
        # only — the oracle never simulates the filter, it defines the
        # exact answer the filter+verify path must reproduce)
        return df.select(
            df["*"],
            F.explode(
                F.array(*[
                    F.pmod(F.xxhash64(F.col("text_hash"), F.lit(seed)), F.lit(bloom_bits))
                    for seed in range(BLOOM_K)
                ])
            ).alias("bit"),
        ).select(
            df["*"],
            (F.col("bit") / 64).cast("long").alias("word"),
            # shiftleft with a COLUMN count needs the SQL form (the
            # python wrapper only takes a literal numBits)
            F.expr("shiftleft(1L, cast(bit % 64 as int))").alias("mask"),
        )

    bloom = probes(prior).groupBy("word").agg(F.bit_or("mask").alias("bits"))
    hits = (
        probes(new)
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "doc_id", "text_hash",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).alias("hit"),
        )
        .groupBy("doc_id", "text_hash")
        .agg(F.min("hit").alias("maybe_dup"))  # all k bits set => candidate
    )
    clean = hits.where(~F.col("maybe_dup"))  # bloom miss: provably not in prior
    verified = (
        hits.where(F.col("maybe_dup"))
        .join(prior, "text_hash", "left_anti")  # candidates: exact check
    )
    return (
        clean.select("doc_id", "text_hash")
        .unionByName(verified.select("doc_id", "text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").cast("long").alias("n_dups_in_new"),
        )
    )
