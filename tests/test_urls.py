"""URL canonicalization rules + frontier-dedup collapse invariant."""

import pandas as pd

from onnxtr_spark.functions import urls as U
from pyspark.sql import functions as F


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame(pd.DataFrame({"u": raw}))
    return [r["c"] for r in df.select(U.canonicalize_url(F.col("u")).alias("c")).collect()]


def test_canonicalize_rules(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Example.COM:443/A/B/",          # case + default port + trailing slash
        "http://h.example:80/x",                      # http default port
        "http://h.example:8080/x",                    # non-default port KEPT
        "https://h.example/p?z=2&utm_source=a&a=1",   # tracking dropped, params sorted
        "https://h.example/p#frag",                   # fragment stripped
        "https://h.example/",                         # root path stays /
        "https://h.example/p?utm_medium=x",           # all params tracking -> no ?
    ])
    assert got == [
        "https://www.example.com/A/B",
        "http://h.example/x",
        "http://h.example:8080/x",
        "https://h.example/p?a=1&z=2",
        "https://h.example/p",
        "https://h.example/",
        "https://h.example/p",
    ]


def test_url_dedup_collapses_every_messy_pair(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(40)), "text": ["x"] * 40})
    )
    out = U.url_dedup_query(docs).toPandas()
    assert len(out) == 40                      # one canonical URL per doc
    assert (out["n_raw"] == 2).all()           # clean + messy always collapse
    # hosts (scheme..authority) are lowercased even for the SHOUTING class-0 spelling
    hosts = out["canonical_url"].str.extract(r"^(https?://[^/]+)")[0]
    assert hosts.notna().all() and (hosts == hosts.str.lower()).all()
    assert not out["canonical_url"].str.contains("#|utm_|:443").any()
    assert not out["canonical_url"].str.endswith("/").any()  # paths are /doc/<id>


def test_url_dedup_matches_duckdb_oracle(spark):
    import duckdb

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(60)), "text": ["x"] * 60})
    )
    got = U.url_dedup_query(docs).toPandas()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": list(range(60)), "text": ["x"] * 60}))
    want = con.sql(U.url_dedup_sql()).df()

    def norm(df):
        cols = sorted(df.columns)
        return sorted(df[cols].astype(str).itertuples(index=False, name=None))

    assert norm(got) == norm(want)
