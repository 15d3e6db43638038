"""Web-corpus URL tooling: canonicalization, host/domain extraction,
canonical-URL dedup — the crawl-side normalization an LLM-data pipeline
runs before any content dedup (two crawls of HTTP://WWW.Site.COM:80/a#x
and http://site.com/a are the same document).

All pure Column string/regex expressions (JVM codegen, zero shuffle for
the projection; one groupBy for the dedup) — regex patterns are written
in the Java/RE2 common subset and replacements avoid capture groups, so
the DuckDB oracle replays them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def url_normalize(url: Column) -> Column:
    """Canonical URL: lowercase scheme://host[:port], strip the fragment,
    the default :80 port, a www. host prefix, utm_* tracking params, and a
    trailing slash.  Path/query case is preserved (paths are
    case-sensitive on real servers; hosts are not)."""
    # lowercase ONLY the scheme://host[:port] prefix
    u = F.concat(F.lower(F.regexp_extract(url, r"^([^/]*//[^/]*)", 1)),
                 F.regexp_replace(url, r"^[^/]*//[^/]*", ""))
    u = F.regexp_replace(u, r"#.*$", "")          # fragment
    u = F.regexp_replace(u, r":80/", "/")         # default port (host ends
    #                                               at the path's leading /)
    u = F.regexp_replace(u, r"://www\.", "://")   # www. host prefix
    u = F.regexp_replace(u, r"\?utm_[^&]*&", "?")  # utm_* first with more params
    u = F.regexp_replace(u, r"[?&]utm_[^&]*", "")  # utm_* sole/trailing param
    u = F.regexp_replace(u, r"/$", "")             # trailing slash
    return u


def url_host(url_norm: Column) -> Column:
    """Host of an already-normalized URL (no port, no userinfo in the
    synthesis contract)."""
    return F.regexp_extract(url_norm, r"^[a-z]+://([^/:]+)", 1)


def url_domain(host: Column) -> Column:
    """Registrable domain = the last two dot-labels of the host (the
    public-suffix list is environment-blocked; two labels is the honest
    deterministic approximation and what the oracle replays)."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def canonicalize_urls(pages: DataFrame, url_col: str = "url",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, url, url_norm, host, domain) — one pure projection."""
    norm = url_normalize(F.col(url_col))
    host = url_host(norm)
    return pages.select(F.col(id_col).alias("id"),
                        F.col(url_col).alias("url"),
                        norm.alias("url_norm"),
                        host.alias("host"),
                        url_domain(host).alias("domain"))


def url_dedup(pages: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """(id, url_norm, is_survivor) — canonical-URL exact dedup: the
    min-id document per normalized URL survives.  One key window (same
    shape as merge.upsert_latest), map-side-combinable at scale via the
    groupBy-min equivalent."""
    canon = canonicalize_urls(pages, url_col, id_col)
    w = Window.partitionBy("url_norm").orderBy(F.col("id").asc())
    return (canon.withColumn("_rn", F.row_number().over(w))
            .select("id", "url_norm", (F.col("_rn") == 1).alias("is_survivor"))
            .drop("_rn"))


def domain_rollup(pages: DataFrame, url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """(domain, n_docs, n_urls) — per-registrable-domain crawl rollup:
    document count and distinct canonical URLs (the crawl-frontier /
    source-quality view).  One map-side-combined aggregation."""
    canon = canonicalize_urls(pages, url_col, id_col)
    return (canon.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("url_norm").alias("n_urls")))
