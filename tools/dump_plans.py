"""Dump .explain("formatted") for named queries to files.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <suffix> <sf_dir> <query...>
"""
import os
import sys

root, out_dir, suffix, sf_dir = sys.argv[1:5]
names = sys.argv[5:]
sys.path.insert(0, root)

import __spark_entry__ as entrymod  # noqa: E402
from onnxtr_spark.session import get_spark  # noqa: E402

spark = get_spark("dump_plans", cpus=8, shuffle_partitions=16)
mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
qs = entrymod.queries()
os.makedirs(out_dir, exist_ok=True)
for name in names:
    try:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
    except Exception as e:  # noqa: BLE001
        txt = f"ERROR: {type(e).__name__}: {e}"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(txt)
    print("dumped", name)
spark.stop()
