"""get_spark's local-cluster path: executor memory + PYTHONPATH wiring.

Runs in a SUBPROCESS (one active SparkContext per process, and the
suite's shared session must not be stopped): a real multi-executor
smoke for the two settings local[*] hides — executors launch at the
1 GB default without spark.executor.memory, and fresh executor
pythons can't import the package without executorEnv.PYTHONPATH
(module-level functions pickle by reference)."""

import subprocess
import sys

SCRIPT = """
import os
from onnxtr_spark.session import get_spark

lc = get_spark("lc-smoke", cpus=2, master="local-cluster[1,2,2048]")
assert lc.conf.get("spark.executor.memory") == "2048m", "bracket capacity default"
pypath = lc.conf.get("spark.executorEnv.PYTHONPATH")
assert os.path.isdir(os.path.join(pypath, "onnxtr_spark")), pypath
from onnxtr_spark.functions.text import quality_score

docs = lc.createDataFrame(
    [(1, "the quick brown fox jumps over the lazy dog", "en", "s")],
    "doc_id long, text string, lang string, source string",
)
rows = quality_score(docs).collect()
assert len(rows) == 1 and rows[0]["quality"] > 0, rows
lc.stop()
print("LC_SMOKE_OK")
"""


def test_local_cluster_master_runs_package_udfs():
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, timeout=240, cwd=".",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "LC_SMOKE_OK" in res.stdout
