"""S8 hOCR export + the spark-submit job entry (batch path)."""

import re
import subprocess
import sys

from pyspark.sql import functions as F

from onnxtr_spark.corpus import FIXTURE_TEXTS, build_corpus_pdfs
from onnxtr_spark.stages.build import export_hocr
from onnxtr_spark.stages.fused import detect_recognize_pages
from onnxtr_spark.stages.pipeline import media_pages
from tests.test_pipeline_e2e import DOCS_SCHEMA, MEDIA_SCHEMA


def test_export_hocr(spark):
    docs_pdf, media_pdf = build_corpus_pdfs(FIXTURE_TEXTS[:1])
    docs = spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA)
    media = spark.createDataFrame(media_pdf, schema=MEDIA_SCHEMA)
    words = detect_recognize_pages(media_pages(docs, media))
    hocr = export_hocr(words, media.select("media_ref", "height", "width")).collect()
    assert len(hocr) == 1
    xml = hocr[0]["hocr"]
    assert xml.startswith('<div class="ocr_page" title="bbox 0 0 640 ')
    # every source word appears as an ocrx_word with a plausible bbox
    for w in FIXTURE_TEXTS[0][1].split():
        assert f">{w}</span>" in xml
    assert xml.count('class="ocr_line"') == len(re.findall(r'class="ocr_line"', xml))
    m = re.search(r'ocrx_word" title="bbox (\d+) (\d+) (\d+) (\d+); x_wconf (\d+)"', xml)
    assert m and 0 <= int(m.group(1)) < int(m.group(3)) <= 640
    assert 0 < int(m.group(5)) <= 100


def test_extract_job_cli(spark, tmp_path):
    docs_pdf, media_pdf = build_corpus_pdfs(FIXTURE_TEXTS[:2])
    docs_path, media_path, out = str(tmp_path / "docs"), str(tmp_path / "media"), str(tmp_path / "out")
    spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA).write.parquet(docs_path)
    spark.createDataFrame(media_pdf, schema=MEDIA_SCHEMA).write.parquet(media_path)
    # run the job as a separate process, like spark-submit would
    import os

    env = dict(os.environ, SPARK_GRAFT_CPUS="2", PYTHONPATH=".")
    res = subprocess.run(
        [sys.executable, "jobs/extract_job.py", "--docs", docs_path, "--media", media_path,
         "--out", out, "--groups", "2"],
        capture_output=True, text=True, timeout=300, env=env, cwd=".",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    got = spark.read.parquet(f"{out}/spans")
    assert got.where(F.col("offset") == 0).count() == 2
    lin = spark.read.parquet(f"{out}/lineage")
    assert lin.agg(F.sum("n_docs")).collect()[0][0] == 2
    assert lin.agg(F.sum("n_words")).collect()[0][0] > 0
