"""S8 hOCR export + the spark-submit job entry (batch path)."""

import re
import subprocess
import pytest
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

    # Structural parity with reference Page.export_as_xml
    # (io/elements.py:300-402): well-formed XHTML with the full level
    # hierarchy html > head/body > ocr_page > ocr_carea > ocr_par >
    # ocr_line > ocrx_word and 1-based per-page ids.
    import xml.etree.ElementTree as ET

    ns = {"x": "http://www.w3.org/1999/xhtml"}
    root = ET.fromstring(xml)
    assert root.tag == "{http://www.w3.org/1999/xhtml}html"
    metas = root.findall("x:head/x:meta", ns)
    assert {m.get("name") for m in metas if m.get("name")} == {"ocr-system", "ocr-capabilities"}
    page = root.find("x:body/x:div", ns)
    assert page.get("class") == "ocr_page" and page.get("id") == "page_1"
    assert re.fullmatch(r"image; bbox 0 0 640 \d+; ppageno 0", page.get("title"))
    careas = page.findall("x:div", ns)
    assert all(c.get("class") == "ocr_carea" for c in careas)
    assert careas[0].get("id") == "block_1"
    pars = [p for c in careas for p in c.findall("x:p", ns)]
    assert all(p.get("class") == "ocr_par" for p in pars)
    lines = [ln for p in pars for ln in p.findall("x:span", ns)]
    assert all(ln.get("class") == "ocr_line" for ln in lines)
    assert [ln.get("id") for ln in lines] == [f"line_{i + 1}" for i in range(len(lines))]
    assert "baseline 0 0" in lines[0].get("title")
    words_x = [w for ln in lines for w in ln.findall("x:span", ns)]
    assert [w.get("id") for w in words_x] == [f"word_{i + 1}" for i in range(len(words_x))]
    # every source word appears as an ocrx_word text, in reading order
    assert [w.text for w in words_x] == FIXTURE_TEXTS[0][1].split()
    m = re.fullmatch(r"bbox (\d+) (\d+) (\d+) (\d+); x_wconf (\d+)", words_x[0].get("title"))
    assert m and 0 <= int(m.group(1)) < int(m.group(3)) <= 640
    assert 0 < int(m.group(5)) <= 100


def test_export_hocr_escapes_xml_specials(spark):
    # The vocab includes < > & " — words containing them must produce
    # well-formed XML (reference escapes via ElementTree; ADVICE round 1).
    texts = [("doc-esc", 'a<b&c>d "quoted" plain')]
    docs_pdf, media_pdf = build_corpus_pdfs(texts)
    docs = spark.createDataFrame(docs_pdf, schema=DOCS_SCHEMA)
    media = spark.createDataFrame(media_pdf, schema=MEDIA_SCHEMA)
    words = detect_recognize_pages(media_pages(docs, media))
    xml = export_hocr(words, media.select("media_ref", "height", "width")).collect()[0]["hocr"]
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)  # raises if escaping is broken
    got = [w.text for w in root.iter() if w.get("class") == "ocrx_word"]
    assert got == ['a<b&c>d', '"quoted"', "plain"]


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


@pytest.mark.parametrize("ladder", ["v1", "v3"])
def test_curate_job_cli(spark, tmp_path, ladder):
    """The curation job end-to-end as a separate process: audit +
    curated + funnel land; the funnel partitions the corpus exactly;
    kept docs are PII-scrubbed and pass every gate. v3 exercises the
    full eleven-gate ladder (Gopher/CCNet/boilerplate/DSIR included)."""
    docs_path, out = str(tmp_path / "docs"), str(tmp_path / "cur")
    sf_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sf_docs.write.parquet(docs_path)
    n_docs = sf_docs.count()
    import os

    env = dict(os.environ, SPARK_GRAFT_CPUS="2", PYTHONPATH=".")
    res = subprocess.run(
        [sys.executable, "jobs/curate_job.py", "--docs", docs_path, "--out", out,
         "--ladder", ladder],
        capture_output=True, text=True, timeout=300, env=env, cwd=".",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    audit = spark.read.parquet(f"{out}/audit")
    curated = spark.read.parquet(f"{out}/curated")
    funnel = {r.stage: r.n_docs for r in spark.read.parquet(f"{out}/funnel").collect()}
    assert audit.count() == n_docs
    assert sum(funnel.values()) == n_docs
    assert funnel.get("kept", 0) == curated.count() > 0
    # the held-out eval slice is excluded from training output
    assert curated.where(F.col("doc_id") % 97 == 0).count() == 0
    # audit kept rows ≡ curated rows
    assert audit.where(F.col("kept_by") == "").count() == curated.count()


def test_crawl_job_cli(spark, tmp_path):
    """Crawl-to-training-data job end-to-end as a separate process:
    WARC archives in → curated docs + funnel + packed sequences out,
    with the WARC roundtrip feeding the same doc_ids the curation
    audits."""
    import os

    from onnxtr_spark.sources.warc import synthesize_warcs

    warcs_path, out = str(tmp_path / "warcs_parquet"), str(tmp_path / "train")
    sf_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
        "doc_id < 120"
    )
    synthesize_warcs(sf_docs).write.parquet(warcs_path)
    n_docs = sf_docs.count()

    env = dict(os.environ, SPARK_GRAFT_CPUS="2", PYTHONPATH=".")
    res = subprocess.run(
        [sys.executable, "jobs/crawl_job.py", "--warcs", warcs_path, "--out", out,
         "--ctx", "64", "--frontier"],
        capture_output=True, text=True, timeout=300, env=env, cwd=".",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    audit = spark.read.parquet(f"{out}/audit")
    kept = spark.read.parquet(f"{out}/docs")
    packed = spark.read.parquet(f"{out}/packed")
    funnel = {r.stage: r.n_docs for r in spark.read.parquet(f"{out}/funnel").collect()}
    assert audit.count() == n_docs
    assert sum(funnel.values()) == n_docs
    assert funnel.get("kept", 0) == kept.count() > 0
    # every kept doc is packed exactly once, offsets inside the ctx
    assert packed.count() == kept.count()
    assert packed.where("bin_offset >= 64 OR bin_offset < 0").count() == 0
    # --frontier: a politeness slot per KEPT doc, one host per round
    frontier = spark.read.parquet(f"{out}/frontier")
    assert frontier.count() == kept.count()
    assert frontier.groupBy("fetch_round", "host").count().where("count > 1").count() == 0
