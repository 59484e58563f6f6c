"""URL canonicalization + frontier dedup (crawl curation).

A crawler's frontier and a crawl corpus both carry many spellings of
the same resource — case-folded schemes/hosts, explicit default ports,
fragments, tracking params in arbitrary order, trailing slashes. URL
canonicalization is the exact-dedup key for crawl data (the step C4 /
Common Crawl run before any content dedup); at 10^12 docs it is one
string-algebra map plus one map-side-combined groupBy on the canonical
form — no shuffle carries the raw spellings.

The whole transform is JVM column algebra (split_part / lower / filter
/ array_sort — no UDF), mirrored function-for-function in DuckDB SQL so
the oracle verifies every canonicalization rule:

1. scheme and host lowercased;
2. fragment stripped;
3. default port stripped (``:443`` for https, ``:80`` for http), any
   other explicit port kept;
4. query params split, ``utm_*`` tracking params dropped, the rest
   byte-sorted and rejoined (param order never distinguishes URLs);
5. trailing slashes trimmed from the path (root stays ``/``).

``synthesize_raw_urls`` plants two spellings per doc (one clean, one
messy — the messy class cycles by doc_id %% 4) so ``url_dedup_query``'s
invariant is sharp: every canonical group must collapse exactly 2 raw
URLs. The reference has no crawl layer (its DocumentFile stops at
pdf/image/url-download, io/reader.py); this extends the WARC source's
curation story.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from onnxtr_spark.partitioning import spread
from onnxtr_spark.sources.warc import N_HOSTS, doc_uri, doc_uri_sql


def synthesize_raw_urls(documents: DataFrame) -> DataFrame:
    """(doc_id, raw_url): two deterministic spellings per doc — the
    clean canonical-shaped URL plus one messy variant by doc_id % 4
    (upper-case + :443 / fragment / unordered+tracking query /
    trailing slash)."""
    d = F.col("doc_id").cast("long")
    base = documents.select(d.alias("doc_id"), doc_uri(d).alias("clean"))
    host_up = F.concat(
        F.lit("HTTPS://SITE-"), (d % N_HOSTS).cast("string"),
        F.lit(".EXAMPLE:443/doc/"), d.cast("string"),
    )
    # class 2 carries REAL query params in both spellings (they survive
    # canonicalization), differing only by order + an added utm_* param
    clean = F.when(d % 4 == 2, F.concat(F.col("clean"), F.lit("?a=1&z=9"))).otherwise(
        F.col("clean")
    )
    messy = F.when(d % 4 == 0, host_up).otherwise(
        F.when(d % 4 == 1, F.concat(F.col("clean"), F.lit("#sec-"), d.cast("string"))).otherwise(
            F.when(d % 4 == 2, F.concat(F.col("clean"), F.lit("?z=9&utm_source=feed&a=1"))).otherwise(
                F.concat(F.col("clean"), F.lit("/"))
            )
        )
    )
    both = base.select("doc_id", F.explode(F.array(clean, messy)).alias("raw_url"))
    return spread(both)


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules — pure JVM column
    algebra, byte-identical to ``_CANON_SQL``."""
    no_frag = F.split_part(url, F.lit("#"), F.lit(1))
    pre = F.split_part(no_frag, F.lit("?"), F.lit(1))
    q = F.split_part(no_frag, F.lit("?"), F.lit(2))
    scheme = F.lower(F.split_part(pre, F.lit("://"), F.lit(1)))
    rest = F.split_part(pre, F.lit("://"), F.lit(2))
    authority = F.split_part(rest, F.lit("/"), F.lit(1))
    path = F.substring(rest, F.length(authority) + 1, F.lit(1 << 30))
    host = F.lower(F.split_part(authority, F.lit(":"), F.lit(1)))
    port = F.split_part(authority, F.lit(":"), F.lit(2))
    default_port = ((scheme == "https") & (port == "443")) | ((scheme == "http") & (port == "80"))
    portpart = F.when((port == "") | default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path_trim = F.when(
        F.length(F.regexp_replace(path, "/+$", "")) == 0, F.lit("/")
    ).otherwise(F.regexp_replace(path, "/+$", ""))
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.startswith("utm_"),
        )
    )
    qpart = F.when(F.size(params) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(params, "&"))
    )
    return F.concat(scheme, F.lit("://"), host, portpart, path_trim, qpart)


# DuckDB mirror of canonicalize_url over a column named {c}
def _canon_sql(c: str) -> str:
    no_frag = f"split_part({c}, '#', 1)"
    pre = f"split_part({no_frag}, '?', 1)"
    q = f"split_part({no_frag}, '?', 2)"
    scheme = f"lower(split_part({pre}, '://', 1))"
    rest = f"split_part({pre}, '://', 2)"
    authority = f"split_part({rest}, '/', 1)"
    path = f"substr({rest}, length({authority}) + 1)"
    host = f"lower(split_part({authority}, ':', 1))"
    port = f"split_part({authority}, ':', 2)"
    default_port = (
        f"(({scheme} = 'https' AND {port} = '443') OR ({scheme} = 'http' AND {port} = '80'))"
    )
    portpart = f"CASE WHEN {port} = '' OR {default_port} THEN '' ELSE ':' || {port} END"
    path_trim = (
        f"CASE WHEN length(regexp_replace({path}, '/+$', '')) = 0 THEN '/' "
        f"ELSE regexp_replace({path}, '/+$', '') END"
    )
    params = (
        f"list_sort(list_filter(string_split({q}, '&'), "
        f"x -> x <> '' AND NOT starts_with(x, 'utm_')))"
    )
    qpart = f"CASE WHEN len({params}) = 0 THEN '' ELSE '?' || array_to_string({params}, '&') END"
    return f"{scheme} || '://' || {host} || {portpart} || {path_trim} || {qpart}"


def url_dedup_query(documents: DataFrame) -> DataFrame:
    """Frontier dedup: canonicalize every raw spelling, group by the
    canonical form. Output (canonical_url, doc_id, n_raw) — by
    construction every group collapses exactly the doc's 2 spellings,
    so a wrong rule (missed port strip, kept tracking param, unstable
    param order) splits a group and breaks the oracle. Scale: narrow
    map + ONE map-side-combined groupBy keyed by the canonical string."""
    raw = synthesize_raw_urls(documents)
    return (
        raw.select("doc_id", canonicalize_url(F.col("raw_url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").cast("long").alias("doc_id"),
            F.count("*").cast("long").alias("n_raw"),
        )
    )


def url_dedup_sql() -> str:
    """Oracle: rebuild both spellings per doc straight from documents,
    canonicalize with the mirrored rules, group identically."""
    base = doc_uri_sql("CAST(doc_id AS BIGINT)")
    return f"""
WITH raw AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest([
    base || CASE WHEN d % 4 = 2 THEN '?a=1&z=9' ELSE '' END,
    CASE d % 4
      WHEN 0 THEN 'HTTPS://SITE-' || CAST(d % {N_HOSTS} AS VARCHAR) || '.EXAMPLE:443/doc/' || CAST(d AS VARCHAR)
      WHEN 1 THEN base || '#sec-' || CAST(d AS VARCHAR)
      WHEN 2 THEN base || '?z=9&utm_source=feed&a=1'
      ELSE base || '/'
    END
  ]) AS raw_url
  FROM (
    SELECT CAST(doc_id AS BIGINT) AS d, doc_id,
           {base} AS base
    FROM documents
  )
)
SELECT {_canon_sql('raw_url')} AS canonical_url,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_raw
FROM raw GROUP BY 1
"""
