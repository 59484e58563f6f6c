"""WARC web-archive source: gzip-member framing + Content-Length record
parse + URI attribution + strip roundtrip."""

import gzip

import pandas as pd
import pytest

from onnxtr_spark.sources import warc as W


def test_warc_roundtrip_with_separator_in_body():
    recs = [
        ("https://s.example/doc/1", "<html><body><p>hello one</p></body></html>"),
        # CRLFCRLF inside the body: delimiter scanning would truncate
        ("https://s.example/doc/2", "<html><body><p>two \r\n\r\n tricky</p></body></html>"),
    ]
    assert W.parse_warc(W.encode_warc(recs)) == recs


def test_warc_skips_non_response_records():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
    )
    blob = gzip.compress(info) + W.encode_warc([("https://s.example/doc/9", "<p>x</p>")])
    assert W.parse_warc(blob) == [("https://s.example/doc/9", "<p>x</p>")]


def test_warc_rejects_garbage_tail():
    blob = W.encode_warc([("u", "<p>a</p>")]) + b"not-gzip-at-all"
    with pytest.raises(ValueError):
        W.parse_warc(blob)


def test_warc_spark_roundtrip_groups_docs_per_archive(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": list(range(12)),
            "text": [f"doc {i} body words here padding " + "w " * 30 for i in range(12)],
        })
    )
    archives = W.synthesize_warcs(docs, docs_per_file=8).toPandas()
    assert sorted(archives["warc_key"]) == [0, 1]  # 12 docs -> 2 archives
    out = W.warc_extract_query(docs).toPandas()
    assert len(out) == 12
    row = out[out.doc_id == "7"].iloc[0]
    import re

    want = re.sub(r"\s+", " ", f"doc 7 body words here padding " + "w " * 30).strip()
    assert row.main_text == want
