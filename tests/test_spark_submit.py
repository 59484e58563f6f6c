"""The north rule's literal deployment shape: `spark-submit --master
<multi-executor> --py-files onnxtr_spark.zip jobs/extract_job.py`.

Runs the REAL spark-submit launcher against a local-cluster master
(separate executor JVMs with fresh python workers) from a NEUTRAL
working directory, with the package shipped ONLY as a --py-files zip —
so the test fails if the code ever stops importing through the
distributed-zip mechanism, or if get_spark overrides the submitted
master (it must respect spark.master from the launcher)."""

import os
import shutil
import subprocess
import zipfile

import pytest
from pyspark.sql import functions as F

from onnxtr_spark.corpus import FIXTURE_TEXTS, build_corpus_pdfs
from tests.test_pipeline_e2e import DOCS_SCHEMA, MEDIA_SCHEMA

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest: str) -> str:
    zip_path = os.path.join(dest, "onnxtr_spark.zip")
    pkg = os.path.join(REPO, "onnxtr_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zip_path


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit launcher")
def test_spark_submit_py_files_local_cluster(spark, tmp_path):
    docs_pdf, media_pdf = build_corpus_pdfs(FIXTURE_TEXTS[:2])
    docs_path, media_path = str(tmp_path / "docs"), str(tmp_path / "media")
    out = str(tmp_path / "out")
    spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA).write.parquet(docs_path)
    spark.createDataFrame(media_pdf, schema=MEDIA_SCHEMA).write.parquet(media_path)
    zip_path = _build_zip(str(tmp_path))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "2"
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[1,2,2048]",
            "--conf", "spark.executor.memory=1536m",
            "--driver-memory", "2g",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "extract_job.py"),
            "--docs", docs_path,
            "--media", media_path,
            "--out", out,
            "--groups", "2",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # neutral cwd: imports must come from the zip
    )
    assert res.returncode == 0, (res.stderr[-3000:], res.stdout[-1000:])
    got = spark.read.parquet(f"{out}/spans")
    assert got.where(F.col("offset") == 0).count() == 2
    lin = spark.read.parquet(f"{out}/lineage")
    assert lin.agg(F.sum("n_docs")).collect()[0][0] == 2
