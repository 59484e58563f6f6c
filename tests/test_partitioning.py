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


def test_wide_input_passes_through_untouched(spark, df):
    width = spark.sparkContext.defaultParallelism
    wide = df.repartition(width * 4)
    out = spread(wide)
    # no narrowing shuffle: the plan is the SAME object graph, still 4x wide
    assert out is wide
    assert out.rdd.getNumPartitions() == width * 4


def test_keyed_spread_never_narrows(spark, df):
    width = spark.sparkContext.defaultParallelism
    wide = df.repartition(width * 4)
    out = spread(wide, "id")
    assert out.rdd.getNumPartitions() == width * 4


def test_conf_knob_overrides_width(spark, df):
    spark.conf.set(CONF_KEY, "7")
    try:
        assert stage_width(df) == 7
        assert spread(df.coalesce(1)).rdd.getNumPartitions() == 7
    finally:
        spark.conf.unset(CONF_KEY)
