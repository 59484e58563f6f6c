"""Evaluation-metric operators: the reference's quality-measurement pass
as first-class queries (reference scripts/evaluate.py:20,92-95 drives
``LocalizationConfusion`` / ``TextMatch`` / ``OCRMetric`` from docTR's
public metrics module over (ground-truth, predicted) box+label pairs;
the semantics below are re-derived from that public implementation).

Spark-first shapes:

- ``text_match`` is pure JVM column algebra (four string-equality
  flavors summed in one aggregation — no Python anywhere).
- ``localization_confusion`` / ``ocr_metric`` need the Hungarian
  assignment over the per-page IoU matrix (scipy
  ``linear_sum_assignment`` in docTR) — inherently per-page sequential,
  so they run in ``applyInPandas`` over (doc_id, page) groups (bounded
  cardinality: one page's boxes), followed by a single global
  aggregation. At 10^12 docs the matrix work stays embarrassingly
  parallel per page; only counters are shuffled.

Cross-engine determinism: per-pair IoUs are converted to integer
micro-units (floor(iou*1e6 + 0.5)) BEFORE summation so the global sum
is exact integer arithmetic in both engines; ratios divide identical
integers (see functions/hashing.py rationale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from onnxtr_spark.corpus import WORDS_PER_PAGE
from onnxtr_spark.partitioning import spread

IOU_THRESH = 0.5  # reference scripts/evaluate.py --iou default

# Accent fold (the anyascii/unidecode step of docTR's string_match),
# restricted to the french vocab's accent set — identical translate()
# tables on both engines.
_ACCENTS = "éèêëàâùûüîïôçÉÈÊËÀÂÙÛÜÎÏÔÇ"
_FOLDED = "eeeeaauuuiiocEEEEAAUUUIIOC"


def _fold(col: Column) -> Column:
    return F.translate(col, _ACCENTS, _FOLDED)


def _fold_sql(expr: str) -> str:
    return f"translate({expr}, '{_ACCENTS}', '{_FOLDED}')"


# ---------------------------------------------------------------------------
# TextMatch (docTR string_match: raw / caseless / unidecode / unicase)
# ---------------------------------------------------------------------------

def text_match(pairs: DataFrame) -> DataFrame:
    """Aggregate the four match flavors over (gt, pred) word pairs.

    Input: columns ``gt``, ``pred`` (strings). Output: one row
    (raw, caseless, unidecode, unicase, total) — counts as ratios over
    total, plus the total pair count. Pure whole-stage-codegen SQL.
    """
    def rate(cond: Column) -> Column:
        return F.sum(cond.cast("long"))

    agg = pairs.agg(
        rate(F.col("gt") == F.col("pred")).alias("n_raw"),
        rate(F.lower("gt") == F.lower("pred")).alias("n_caseless"),
        rate(_fold(F.col("gt")) == _fold(F.col("pred"))).alias("n_unidecode"),
        rate(F.lower(_fold(F.col("gt"))) == F.lower(_fold(F.col("pred")))).alias("n_unicase"),
        F.count("*").alias("total"),
    )
    t = F.col("total").cast("double")
    return agg.select(
        (F.col("n_raw") / t).alias("raw"),
        (F.col("n_caseless") / t).alias("caseless"),
        (F.col("n_unidecode") / t).alias("unidecode"),
        (F.col("n_unicase") / t).alias("unicase"),
        F.col("total").cast("long").alias("total"),
    )


def text_match_sql(pairs_cte: str) -> str:
    """DuckDB mirror over a CTE named ``pairs(gt, pred)``."""
    return f"""
WITH {pairs_cte}
SELECT sum(CASE WHEN gt = pred THEN 1 ELSE 0 END) / count(*)::DOUBLE AS raw,
       sum(CASE WHEN lower(gt) = lower(pred) THEN 1 ELSE 0 END) / count(*)::DOUBLE AS caseless,
       sum(CASE WHEN {_fold_sql('gt')} = {_fold_sql('pred')} THEN 1 ELSE 0 END) / count(*)::DOUBLE AS unidecode,
       sum(CASE WHEN lower({_fold_sql('gt')}) = lower({_fold_sql('pred')}) THEN 1 ELSE 0 END) / count(*)::DOUBLE AS unicase,
       count(*)::BIGINT AS total
FROM pairs
"""


# ---------------------------------------------------------------------------
# Hungarian assignment (scipy linear_sum_assignment analog, minimization)
# ---------------------------------------------------------------------------

def linear_sum_assignment_min(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact min-cost assignment (O(n^3) shortest-augmenting-path
    Hungarian with potentials). Rectangular input is zero-padded square;
    dummy pairs are filtered from the returned indices. Matches
    scipy.optimize.linear_sum_assignment's contract for our use (cost =
    -IoU; any optimal assignment yields the same matched-IoU multiset on
    generic inputs)."""
    r, c = cost.shape
    n = max(r, c)
    sq = np.zeros((n, n), dtype=np.float64)
    sq[:r, :c] = cost
    INF = float("inf")
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)  # p[j] = row assigned to col j (1-based)
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            cur_row = sq[i0 - 1]
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cur_row[j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    rows, cols = [], []
    for j in range(1, n + 1):
        if p[j] and p[j] <= r and j <= c:
            rows.append(p[j] - 1)
            cols.append(j - 1)
    return np.asarray(rows, dtype=np.int64), np.asarray(cols, dtype=np.int64)


def _assign_max_iou(iou: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Optimal max-total-IoU assignment via sparsity decomposition:
    connected components of the positive-IoU bipartite graph are solved
    independently — page matrices are near-block-diagonal (a box only
    overlaps its local neighborhood), so most components are 1×1 and
    match directly; larger ones run the O(n³) Hungarian on their
    submatrix. Zero-IoU pairs never need matching: every downstream
    counter consumes only matches with iou ≥ thresh > 0, and a
    zero-weight pair contributes nothing to the optimal total. Cuts the
    per-page cost from O((G+P)³) to O(nnz) + Σ component³."""
    n_g, n_p = iou.shape
    gi, pi = np.nonzero(iou > 0)
    parent = list(range(n_g + n_p))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for g, p in zip(gi.tolist(), pi.tolist()):
        ra, rb = find(g), find(n_g + p)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, tuple[list[int], list[int]]] = {}
    for g in sorted(set(gi.tolist())):
        comps.setdefault(find(g), ([], []))[0].append(g)
    for p in sorted(set(pi.tolist())):
        comps.setdefault(find(n_g + p), ([], []))[1].append(p)
    rows: list[int] = []
    cols: list[int] = []
    for r_idx, c_idx in comps.values():
        if len(r_idx) == 1 and len(c_idx) == 1:
            rows.append(r_idx[0])
            cols.append(c_idx[0])
        elif r_idx and c_idx:
            ri, ci = linear_sum_assignment_min(-iou[np.ix_(r_idx, c_idx)])
            rows.extend(r_idx[i] for i in ri)
            cols.extend(c_idx[j] for j in ci)
    return np.asarray(rows, dtype=np.int64), np.asarray(cols, dtype=np.int64)


def box_iou_matrix(gts: np.ndarray, preds: np.ndarray) -> np.ndarray:
    """(G, P) IoU matrix for straight relative boxes [x0, y0, x1, y1]."""
    if gts.shape[0] == 0 or preds.shape[0] == 0:
        return np.zeros((gts.shape[0], preds.shape[0]))
    x0 = np.maximum(gts[:, None, 0], preds[None, :, 0])
    y0 = np.maximum(gts[:, None, 1], preds[None, :, 1])
    x1 = np.minimum(gts[:, None, 2], preds[None, :, 2])
    y1 = np.minimum(gts[:, None, 3], preds[None, :, 3])
    inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
    a_g = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    a_p = (preds[:, 2] - preds[:, 0]) * (preds[:, 3] - preds[:, 1])
    union = a_g[:, None] + a_p[None, :] - inter
    out = np.zeros_like(inter)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def _iou_micro(x: float) -> int:
    return int(np.floor(x * 1_000_000 + 0.5))


_PAGE_STATS_SCHEMA = (
    "matches long, num_gts long, num_preds long, tot_iou_micro long, "
    "raw long, caseless long, unidecode long, unicase long"
)

_FOLD_TABLE = str.maketrans(_ACCENTS, _FOLDED)


def page_confusion(
    gts: np.ndarray,
    prs: np.ndarray,
    gt_words,
    pr_words,
    iou_thresh: float,
) -> tuple[int, int, int, int, int, int, int, int]:
    """One page's confusion counters: (matches, num_gts, num_preds,
    tot_iou_micro, raw, caseless, unidecode, unicase). Text counters
    stay 0 when word arrays are None."""
    iou = box_iou_matrix(gts, prs)
    # docTR LocalizationConfusion: tot_iou = per-pred best IoU, summed
    tot_micro = sum(_iou_micro(x) for x in (iou.max(axis=0) if iou.size else ()))
    matches = 0
    n_raw = n_caseless = n_unidecode = n_unicase = 0
    if iou.size:
        ri, ci = _assign_max_iou(iou)
        kept = iou[ri, ci] >= iou_thresh if ri.size else np.zeros(0, dtype=bool)
        matches = int(kept.sum())
        if gt_words is not None:
            for g_i, p_i in zip(ri[kept], ci[kept]):
                g, p = str(gt_words[g_i]), str(pr_words[p_i])
                fg, fp = g.translate(_FOLD_TABLE), p.translate(_FOLD_TABLE)
                n_raw += g == p
                n_caseless += g.lower() == p.lower()
                n_unidecode += fg == fp
                n_unicase += fg.lower() == fp.lower()
    return matches, len(gts), len(prs), int(tot_micro), n_raw, n_caseless, n_unidecode, n_unicase


def _confusion_partials(boxes: DataFrame, iou_thresh: float, with_text: bool) -> DataFrame:
    """Per-PARTITION partial counter rows (the map-side combine): one
    explicit hash repartition on (doc_id, page), a JVM groupBy (reusing
    that partitioning — no second exchange) packs each page into a
    single compact row of flattened per-side coord arrays, and one
    mapInPandas sums page counters across its whole partition. The
    global aggregation sees one tiny counter row per partition — at
    10^12 docs the post-stage shuffle is counters only."""
    is_gt = F.col("side") == "gt"
    aggs = [
        F.flatten(F.collect_list(F.when(is_gt, F.array("xmin", "ymin", "xmax", "ymax")))).alias("gt_flat"),
        F.flatten(F.collect_list(F.when(~is_gt, F.array("xmin", "ymin", "xmax", "ymax")))).alias("pr_flat"),
    ]
    if with_text:
        # coalesce NULL text to "" INSIDE the when(): collect_list skips
        # nulls, so a null-text row would drop from the word list while
        # its coords survive in the flat arrays — shifting every later
        # word↔box pairing on the page
        aggs += [
            F.collect_list(F.when(is_gt, F.coalesce(F.col("text"), F.lit("")))).alias("gt_words"),
            F.collect_list(F.when(~is_gt, F.coalesce(F.col("text"), F.lit("")))).alias("pr_words"),
        ]
    # ONE explicit shuffle: hash-repartition the tall rows by page key
    # (AQE-exempt — matching is CPU-bound per PAGE, and byte-based
    # coalescing would serialize the Python stage, the trap documented
    # at stages/pipeline.media_pages); the groupBy reuses that
    # partitioning, so no second exchange. collect_list drops the
    # when()-nulls, giving per-side arrays in one pass; flattened coord
    # arrays mean Arrow ships ONE compact row per page (the session's
    # small maxRecordsPerBatch made tall-row transfer the bottleneck:
    # measured 2.1s of a 5.7s wall for a no-op stage at sf0.1).
    grouped = (
        spread(boxes, "doc_id", "page")
        .groupBy("doc_id", "page")
        .agg(*aggs)
    )

    def run(batches):
        acc = np.zeros(8, dtype=np.int64)
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                gts = np.asarray(row.gt_flat, dtype=np.float64).reshape(-1, 4)
                prs = np.asarray(row.pr_flat, dtype=np.float64).reshape(-1, 4)
                gw = row.gt_words if with_text else None
                pw = row.pr_words if with_text else None
                acc += np.array(page_confusion(gts, prs, gw, pw, iou_thresh), dtype=np.int64)
        yield pd.DataFrame(
            [acc.tolist()],
            columns=["matches", "num_gts", "num_preds", "tot_iou_micro", "raw", "caseless", "unidecode", "unicase"],
        )

    return grouped.mapInPandas(run, _PAGE_STATS_SCHEMA)


def localization_confusion(boxes: DataFrame, iou_thresh: float = IOU_THRESH) -> DataFrame:
    """docTR-style LocalizationConfusion over a tall box table
    (doc_id, page, side in {'gt','pred'}, xmin..ymax): Hungarian-matched
    IoU >= thresh counts per page, aggregated globally to one row
    (matches, num_gts, num_preds, recall, precision, mean_iou)."""
    per_page = _confusion_partials(boxes, iou_thresh, with_text=False)
    agg = per_page.agg(
        F.sum("matches").alias("m"),
        F.sum("num_gts").alias("g"),
        F.sum("num_preds").alias("p"),
        F.sum("tot_iou_micro").alias("ti"),
    )
    return agg.select(
        F.col("m").cast("long").alias("matches"),
        F.col("g").cast("long").alias("num_gts"),
        F.col("p").cast("long").alias("num_preds"),
        (F.col("m") / F.col("g").cast("double")).alias("recall"),
        (F.col("m") / F.col("p").cast("double")).alias("precision"),
        (F.col("ti") / F.lit(1e6) / F.col("p").cast("double")).alias("mean_iou"),
    )


def ocr_metric(boxes: DataFrame, iou_thresh: float = IOU_THRESH) -> DataFrame:
    """docTR-style OCRMetric: Hungarian IoU matching, then the four
    string-match flavors on matched pairs. Input adds a ``text`` column;
    output one row with loc counts + per-flavor recall/precision."""
    per_page = _confusion_partials(boxes, iou_thresh, with_text=True)
    agg = per_page.agg(
        F.sum("matches").alias("m"),
        F.sum("num_gts").alias("g"),
        F.sum("num_preds").alias("p"),
        F.sum("tot_iou_micro").alias("ti"),
        F.sum("raw").alias("nr"),
        F.sum("caseless").alias("nc"),
        F.sum("unidecode").alias("nd"),
        F.sum("unicase").alias("nu"),
    )
    g, p = F.col("g").cast("double"), F.col("p").cast("double")
    return agg.select(
        F.col("m").cast("long").alias("loc_matches"),
        F.col("g").cast("long").alias("num_gts"),
        F.col("p").cast("long").alias("num_preds"),
        (F.col("nr") / g).alias("recall_raw"),
        (F.col("nu") / g).alias("recall_unicase"),
        (F.col("nr") / p).alias("precision_raw"),
        (F.col("nu") / p).alias("precision_unicase"),
        (F.col("ti") / F.lit(1e6) / p).alias("mean_iou"),
    )


# ---------------------------------------------------------------------------
# Deterministic (gt, pred) derivations from the documents table.
#
# Geometry is NOT SQL-derivable from pipeline output (detection boxes
# live in image space), so the evaluation corpus is a synthetic grid:
# word i of a doc sits at a grid cell computed from i alone, and the
# "predicted" side applies deterministic perturbations (shift, drop,
# spurious box, text degradations). Cross-box IoUs are zero by
# construction (cell gaps exceed the max shift), so the Hungarian
# assignment the Spark side runs is independently checkable by the
# diagonal-only SQL below.
# ---------------------------------------------------------------------------

GRID_COLS = 5
GRID_X0, GRID_DX, GRID_W = 0.05, 0.18, 0.15
GRID_Y0, GRID_DY, GRID_H = 0.05, 0.15, 0.10
# Shift rules: base jitter -0.01..0.01; every 19th word gets an extra
# +0.04 x shift, pushing some pairs below the 0.5 IoU threshold (the
# matcher must actually reject them, not just count survivors).
SHIFT_DX = "((((i % 3) - 1) / 100.0) + (CASE WHEN i % 19 = 0 THEN 0.04 ELSE 0.0 END))"
SHIFT_DY = "(((i % 5) - 2) / 200.0)"  # -0.01 .. 0.01
DROP_MOD = 13  # every 13th word has no predicted box (recall < 1)
SPURIOUS_MOD = 17  # every 17th word adds an unmatched spurious box
SPUR_BOX = (0.94, 0.91, 0.99, 0.99)  # overlaps nothing on the grid


def _word_index(documents: DataFrame) -> DataFrame:
    """(doc_id, page, i, word): 1-based global word index per doc."""
    return (
        documents.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "word"),
        )
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("i"),
            F.floor(F.col("pos") / WORDS_PER_PAGE).cast("int").alias("page"),
            "word",
        )
    )


def _grid_exprs(i: Column) -> tuple[Column, Column, Column, Column]:
    col = ((i - 1) % WORDS_PER_PAGE) % GRID_COLS
    row = F.floor(((i - 1) % WORDS_PER_PAGE) / GRID_COLS)
    x0 = F.lit(GRID_X0) + col.cast("double") * F.lit(GRID_DX)
    y0 = F.lit(GRID_Y0) + row.cast("double") * F.lit(GRID_DY)
    return x0, y0, x0 + F.lit(GRID_W), y0 + F.lit(GRID_H)


def eval_boxes_from_documents(documents: DataFrame) -> DataFrame:
    """Tall (doc_id, page, side, text, xmin..ymax) evaluation table."""
    w = _word_index(documents)
    i = F.col("i")
    gx0, gy0, gx1, gy1 = _grid_exprs(i)
    gt = w.select(
        "doc_id", "page", F.lit("gt").alias("side"), F.col("word").alias("text"),
        gx0.alias("xmin"), gy0.alias("ymin"), gx1.alias("xmax"), gy1.alias("ymax"),
    )
    dx = ((i % 3) - 1).cast("double") / 100.0 + F.when(i % 19 == 0, F.lit(0.04)).otherwise(F.lit(0.0))
    dy = ((i % 5) - 2).cast("double") / 200.0
    pred = w.where(i % DROP_MOD != 0).select(
        "doc_id",
        "page",
        F.lit("pred").alias("side"),
        degraded_word(i, F.col("word")).alias("text"),
        (gx0 + dx).alias("xmin"),
        (gy0 + dy).alias("ymin"),
        (gx1 + dx).alias("xmax"),
        (gy1 + dy).alias("ymax"),
    )
    spur = w.where(i % SPURIOUS_MOD == 0).select(
        "doc_id", "page", F.lit("pred").alias("side"), F.lit("~").alias("text"),
        F.lit(SPUR_BOX[0]).alias("xmin"), F.lit(SPUR_BOX[1]).alias("ymin"),
        F.lit(SPUR_BOX[2]).alias("xmax"), F.lit(SPUR_BOX[3]).alias("ymax"),
    )
    return gt.unionByName(pred).unionByName(spur)


def degraded_word(i: Column, word: Column) -> Column:
    """Deterministic text degradations (exclusive chain): every 11th
    word gets a trailing 'x' (breaks every flavor), else every 3rd is
    uppercased (breaks raw + unidecode), else every 7th swaps e->é
    (accent fold recovers it: breaks raw + caseless only)."""
    return (
        F.when(i % 11 == 0, F.concat(word, F.lit("x")))
        .when(i % 3 == 0, F.upper(word))
        .when(i % 7 == 0, F.regexp_replace(word, "e", "é"))
        .otherwise(word)
    )


DEGRADED_WORD_SQL = """
CASE WHEN i % 11 = 0 THEN word || 'x'
     WHEN i % 3 = 0 THEN upper(word)
     WHEN i % 7 = 0 THEN replace(word, 'e', 'é')
     ELSE word END
"""

_WORDS_CTE = """
w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, u.i AS i, words[u.i] AS word
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents) d,
       UNNEST(generate_series(1, len(d.words))) AS u(i)
)
"""

TEXT_MATCH_PAIRS_CTE = (
    _WORDS_CTE + f", pairs AS (SELECT word AS gt, {DEGRADED_WORD_SQL} AS pred FROM w)"
)


def localization_confusion_sql(iou_thresh: float = IOU_THRESH) -> str:
    """Diagonal-only oracle: on the synthetic grid, cross IoUs are zero
    and each surviving pred overlaps exactly its own gt, so the
    Hungarian assignment's matched multiset equals the diagonal."""
    return f"""
WITH {_WORDS_CTE.strip()},
survivors AS (
  SELECT i,
         ({GRID_W} - abs({SHIFT_DX})) * ({GRID_H} - abs({SHIFT_DY})) AS inter
  FROM w WHERE i % {DROP_MOD} != 0
),
iou AS (
  SELECT CAST(floor(inter / (2 * {GRID_W} * {GRID_H} - inter) * 1000000 + 0.5) AS BIGINT) AS iou_micro,
         inter / (2 * {GRID_W} * {GRID_H} - inter) AS iou
  FROM survivors
),
counts AS (
  SELECT (SELECT count(*) FROM w) AS num_gts,
         (SELECT count(*) FROM survivors) + (SELECT count(*) FROM w WHERE i % {SPURIOUS_MOD} = 0) AS num_preds,
         (SELECT count(*) FROM iou WHERE iou >= {iou_thresh}) AS matches,
         (SELECT sum(iou_micro) FROM iou) AS tot_iou_micro
)
SELECT CAST(matches AS BIGINT) AS matches,
       CAST(num_gts AS BIGINT) AS num_gts,
       CAST(num_preds AS BIGINT) AS num_preds,
       matches / num_gts::DOUBLE AS recall,
       matches / num_preds::DOUBLE AS precision,
       tot_iou_micro / 1000000.0 / num_preds::DOUBLE AS mean_iou
FROM counts
"""


def ocr_metric_sql(iou_thresh: float = IOU_THRESH) -> str:
    fold_gt = _fold_sql("word")
    fold_pred = _fold_sql("pred")
    return f"""
WITH {_WORDS_CTE.strip()},
survivors AS (
  SELECT i, word, {DEGRADED_WORD_SQL} AS pred,
         ({GRID_W} - abs({SHIFT_DX})) * ({GRID_H} - abs({SHIFT_DY})) AS inter
  FROM w WHERE i % {DROP_MOD} != 0
),
matched AS (
  SELECT *, inter / (2 * {GRID_W} * {GRID_H} - inter) AS iou,
         CAST(floor(inter / (2 * {GRID_W} * {GRID_H} - inter) * 1000000 + 0.5) AS BIGINT) AS iou_micro
  FROM survivors
),
counts AS (
  SELECT (SELECT count(*) FROM w) AS num_gts,
         (SELECT count(*) FROM survivors) + (SELECT count(*) FROM w WHERE i % {SPURIOUS_MOD} = 0) AS num_preds,
         (SELECT count(*) FROM matched WHERE iou >= {iou_thresh}) AS loc_matches,
         (SELECT sum(iou_micro) FROM matched) AS tot_iou_micro,
         (SELECT count(*) FROM matched WHERE iou >= {iou_thresh} AND word = pred) AS nr,
         (SELECT count(*) FROM matched WHERE iou >= {iou_thresh}
            AND lower({fold_gt}) = lower({fold_pred})) AS nu
)
SELECT CAST(loc_matches AS BIGINT) AS loc_matches,
       CAST(num_gts AS BIGINT) AS num_gts,
       CAST(num_preds AS BIGINT) AS num_preds,
       nr / num_gts::DOUBLE AS recall_raw,
       nu / num_gts::DOUBLE AS recall_unicase,
       nr / num_preds::DOUBLE AS precision_raw,
       nu / num_preds::DOUBLE AS precision_unicase,
       tot_iou_micro / 1000000.0 / num_preds::DOUBLE AS mean_iou
FROM counts
"""
