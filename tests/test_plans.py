"""Physical-plan assertions: the plans we'd want at 100 TB.

Checks .explain output for predicate pushdown into parquet scans,
column pruning, broadcast joins on dimension tables, and whole-stage
codegen on the pure-SQL paths.
"""

import re

from onnxtr_spark.queries import relational as rel

SF_DIR = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    p = plan(rel.q1_pricing_summary(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    m = re.search(r"ReadSchema: struct<([^\n]*)", p)  # toString truncates long lines
    assert m, p
    cols = m.group(1)
    assert "l_orderkey" not in cols  # unused columns pruned from the scan
    assert "l_quantity" in cols


def test_q3_broadcasts_dimensions(spark):
    p = plan(rel.q3_shipping_priority(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in p


def test_q5_broadcasts_dimensions(spark):
    p = plan(rel.q5_nation_volume(spark, SF_DIR))
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_semi_join_shape(spark):
    p = plan(rel.order_priority_count(spark, SF_DIR))
    assert "LeftSemi" in p


def test_sessionize_stays_jvm_side(spark):
    p = plan(rel.events_sessionize(spark, SF_DIR))
    # pure window+agg algebra: no Python evaluation nodes of any kind
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p and "MapInPandas" not in p
    assert "Window" in p and "HashAggregate" in p


def test_ocr_pipeline_shuffle_budget(spark):
    """The OCR plan's wide ops stay bounded: render spread, media join,
    model-stage repartition, assembly window — and nothing quadratic."""
    from onnxtr_spark.stages.pipeline import extract_from_testdata

    p = plan(extract_from_testdata(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert p.count("Exchange") <= 8, p
    # the two Python stages: page render + fused detect/recognize
    assert p.count("MapInPandas") == 2, p
