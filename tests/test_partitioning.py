"""spread(): the cluster-safe partition-width helper (partitioning.py)."""

import pytest

from onnxtr_spark.partitioning import CONF_KEY, spread, stage_width


@pytest.fixture()
def df(spark):
    return spark.range(0, 1000)


def test_narrow_input_widens_to_default_parallelism(spark, df):
    narrow = df.coalesce(1)
    out = spread(narrow)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_wide_scan_passes_through_untouched(spark):
    # an exchange-FREE wide input (the 100 TB scan shape): probeable,
    # already wide -> same object graph, no narrowing shuffle
    width = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, numPartitions=width * 4)
    out = spread(wide)
    assert out is wide
    assert out.rdd.getNumPartitions() == width * 4


def test_keyed_spread_never_narrows_a_wide_scan(spark):
    width = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, numPartitions=width * 4)
    out = spread(wide, "id")
    assert out.rdd.getNumPartitions() == width * 4


def test_exchange_bearing_plan_is_not_probed(spark, df):
    # a plan with an upstream exchange must NOT be probed (under AQE,
    # .rdd would execute the shuffle at plan-build time); it gets the
    # explicit unconditional repartition instead
    from onnxtr_spark.partitioning import _probe_safe

    wide = df.repartition(7)
    assert not _probe_safe(wide)
    joined = df.alias("a").join(df.alias("b"), "id")
    assert not _probe_safe(joined)
    assert _probe_safe(df.where(df.id > 3).select("id"))
    out = spread(wide)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_conf_knob_overrides_width(spark, df):
    spark.conf.set(CONF_KEY, "7")
    try:
        assert stage_width(df) == 7
        assert spread(df.coalesce(1)).rdd.getNumPartitions() == 7
    finally:
        spark.conf.unset(CONF_KEY)
