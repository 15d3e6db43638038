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
    the default :80 port (http ONLY — :80 on https is a real non-default
    port), a www. host prefix, utm_* tracking params, and a trailing
    slash.  Path/query case is preserved (paths are case-sensitive on
    real servers; hosts are not).

    Authority rules operate on the EXTRACTED scheme://host[:port] prefix,
    never the full string — a ':80/' or '://www.' inside a path/query
    (e.g. '?u=http://www.b.com:80/x') must not be rewritten (r5
    code-review).  The utm rules handle runs: middle/trailing '&utm_...'
    params are removed first (this pattern can match several times — the
    DuckDB replay needs the 'g' flag there), leaving at most ONE leading
    '?utm_...&' to collapse, then a sole '?utm_...' to drop."""
    pre = F.lower(F.regexp_extract(url, r"^([^/]*//[^/]*)", 1))
    pre = F.when(pre.startswith("http://"),
                 F.regexp_replace(pre, r":80$", "")).otherwise(pre)
    pre = F.regexp_replace(pre, r"^http://www\.", "http://")
    pre = F.regexp_replace(pre, r"^https://www\.", "https://")
    rest = F.regexp_replace(url, r"^[^/]*//[^/]*", "")
    rest = F.regexp_replace(rest, r"#.*$", "")         # fragment
    rest = F.regexp_replace(rest, r"&utm_[^&]*", "")   # middle/trailing utm_*
    rest = F.regexp_replace(rest, r"\?utm_[^&]*&", "?")  # leading utm_* w/ more
    rest = F.regexp_replace(rest, r"\?utm_[^&]*$", "")   # sole utm_*
    rest = F.regexp_replace(rest, r"/$", "")           # trailing slash
    return F.concat(pre, rest)


def url_host(url_norm: Column) -> Column:
    """Host of an already-normalized URL (no port, no userinfo in the
    synthesis contract)."""
    return F.regexp_extract(url_norm, r"^[a-z]+://([^/:]+)", 1)


# Minimal embedded public-suffix table (VERDICT r5 #7): the most common
# second-level ccTLD suffixes, public knowledge from the Mozilla PSL.  The
# full publicsuffix package is environment-blocked; without this table the
# two-label fallback collapsed every UK site into one "domain"
# (example.co.uk -> co.uk).  Hosts ending in one of these take the last
# THREE labels as the registrable domain; everything else takes two.
# Sorted tuple so the SQL twin renders deterministically.
PUBLIC_SUFFIX_2LD = (
    "ac.jp", "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk", "co.za",
    "com.ar", "com.au", "com.br", "com.cn", "com.mx", "com.sg", "com.tr",
    "go.jp", "gov.uk", "ne.jp", "net.au", "or.jp", "org.au", "org.uk",
)


def url_domain(host: Column) -> Column:
    """Registrable domain: last two dot-labels of the host, or last THREE
    when the two-label tail is a known second-level public suffix
    (shop.example.co.uk -> example.co.uk; a bare 'co.uk' host falls back
    to itself — there is no third label to take)."""
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return F.when(last2.isin(*PUBLIC_SUFFIX_2LD) & (last3 != F.lit("")),
                  last3).otherwise(last2)


def url_domain_sql(host_sql: str) -> str:
    """DuckDB twin of url_domain over a host expression — generated from
    the SAME suffix tuple so the two sides cannot drift (the
    hash_bucket_sql pattern)."""
    in_list = ", ".join(f"'{s}'" for s in PUBLIC_SUFFIX_2LD)
    l2 = f"regexp_extract({host_sql}, '([^.]+\\.[^.]+)$', 1)"
    l3 = f"regexp_extract({host_sql}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    return (f"CASE WHEN {l2} IN ({in_list}) AND {l3} <> '' "
            f"THEN {l3} ELSE {l2} END")


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
            .select("id", "url_norm", (F.col("_rn") == 1).alias("is_survivor")))


def domain_rollup(pages: DataFrame, url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """(domain, n_docs, n_urls) — per-registrable-domain crawl rollup:
    document count and distinct canonical URLs (the crawl-frontier /
    source-quality view).  One map-side-combined aggregation."""
    canon = canonicalize_urls(pages, url_col, id_col)
    return (canon.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("url_norm").alias("n_urls")))


HREF_REGEX = 'href="([^"]+)"'


def extract_links(pages: DataFrame, html_col: str = "html",
                  src_host_col: str = "src_host") -> DataFrame:
    """(src_host, url, dst_host) — one row per hyperlink in the corpus:
    every href attribute extracted, canonicalized through the SAME
    url_normalize as the crawl dedup (case, www., :80, utm_*, fragment,
    trailing slash — so http://WWW.X.com:80/a#f and https://x.com/a land
    on one node), host taken as the graph node id.

    This is the crawl-structure extraction pass that feeds pagerank /
    triangle_count with a REAL edge list instead of a synthetic rule
    graph.  Pure Column regexp_extract_all + ONE generator (explode) —
    scan-shaped, zero shuffle, codegen end-to-end."""
    urls = F.regexp_extract_all(F.col(html_col), F.lit(HREF_REGEX), F.lit(1))
    return (pages.select(F.col(src_host_col).alias("src_host"),
                         F.explode(urls).alias("url"))
            .select("src_host", "url",
                    url_host(url_normalize(F.col("url"))).alias("dst_host")))


def link_graph(pages: DataFrame, html_col: str = "html",
               src_host_col: str = "src_host") -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level web link graph with
    edge multiplicities: extract_links collapsed by endpoint pair.  Self
    links are kept (they are real and downstream graph ops decide).  One
    map-side-combined aggregation — the partial agg collapses a host's
    repeated links before the exchange, so shuffle volume is bounded by
    the DISTINCT edge set, not the link count."""
    e = extract_links(pages, html_col, src_host_col)
    return (e.groupBy("src_host", "dst_host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_links")))


# --- robots-rules crawl filtering (r6) ---------------------------------------

def parse_robots(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body") -> DataFrame:
    """robots.txt bodies -> one (host, is_allow, prefix) row per Allow /
    Disallow line.  REP subset: a single user-agent group (every rule line
    applies), literal path prefixes (no * / $ wildcards — documented
    subset), values end at whitespace or '#'.  Empty-value lines are
    DROPPED, which is the REP semantic: 'Disallow:' with no value means
    allow-everything, NOT a zero-length ban — keeping it as a ''-prefix
    rule would invert the verdict for every otherwise-unmatched URL.
    Pure split/explode/regexp projection, zero Python."""
    line = F.explode(F.split(F.col(body_col), "\n")).alias("line")
    rows = robots.select(F.col(host_col).alias("host"), line)
    directive = F.regexp_extract("line", r"^(Allow|Disallow):[ \t]*([^ \t#]*)", 1)
    value = F.regexp_extract("line", r"^(Allow|Disallow):[ \t]*([^ \t#]*)", 2)
    return (rows.select("host", directive.alias("_d"), value.alias("prefix"))
            .where((F.col("_d") != "") & (F.col("prefix") != ""))
            .select("host", (F.col("_d") == "Allow").cast("int")
                    .alias("is_allow"), "prefix"))


def robots_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """(id, host, path, allowed, match_len, match_prefix) — REP
    longest-match verdict per URL: among the host's rules whose prefix
    starts the URL path, the LONGEST wins; at equal length Allow beats
    Disallow; no matching rule (or no rules for the host) -> allowed,
    match_len = -1, match_prefix = ''.

    Two same-length prefixes matching one path are necessarily the SAME
    string (both equal path[:len]), so max over
    struct(len, is_allow, prefix) is deterministic and the struct's
    prefix leg never actually breaks a tie.

    Scale shape: the rules table is O(hosts x rules-per-host) — tiny next
    to a 100 TB URL corpus — so it is broadcast and the matching join
    shuffles NOTHING; the only exchange is the per-id max aggregation,
    map-side combined.  The LEFT join carries rule-less URLs through with
    nulls folded into the (-1, allow) default, so no second join-back
    pass is needed."""
    path = F.regexp_replace("url_norm", r"^[a-z]+://[^/]*", "")
    u = urls.select("id", "host", path.alias("path"))
    r = rules.select(F.col("host").alias("_rhost"), "is_allow", "prefix")
    joined = u.join(
        F.broadcast(r),
        (F.col("host") == F.col("_rhost"))
        & F.col("path").startswith(F.col("prefix")), "left")
    best = F.max(F.struct(
        F.coalesce(F.length("prefix"), F.lit(-1)).cast("long").alias("l"),
        F.coalesce(F.col("is_allow"), F.lit(1)).alias("a"),
        F.coalesce(F.col("prefix"), F.lit("")).alias("p"))).alias("m")
    return (joined.groupBy("id", "host", "path").agg(best)
            .select("id", "host", "path",
                    (F.col("m.a") == 1).alias("allowed"),
                    F.col("m.l").alias("match_len"),
                    F.col("m.p").alias("match_prefix")))


# --- funnel analysis (r6) ----------------------------------------------------

def funnel_steps(events: DataFrame, steps: tuple[str, ...],
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts_us") -> DataFrame:
    """Ordered k-step funnel per user (r6): the classic web-analytics
    conversion query — t_i = earliest step-i event STRICTLY after t_{i-1}
    (equal timestamps never chain a step).  Returns
    (user, t1_us..tk_us, steps_reached) over EVERY user in the input,
    non-converting users included with NULL stage times.

    Physical form: ONE groupBy(user) collecting (ts, type) pairs — the
    step-type filter rides INSIDE collect_list via when() (collect_list
    skips nulls), so non-converting users stay in the result without a
    second distinct+join pass — then array_sort and a pure Column
    left-fold whose accumulator is the array of achieved stage times:
    append e.ts iff it is the next expected type and strictly later than
    the last stage.  First-qualifying-in-sorted-order == min-qualifying,
    so the fold equals the k-chained-aggregate relational form the
    oracle runs; sort ties are irrelevant to the result (strict > blocks
    equal-ts chains) but the (ts, type) sort key is total anyway.

    Scale shape: ONE exchange; per-user state is that user's step-type
    events (the sessionize contract — bounded by user activity, not
    corpus).  Zero Python, zero Window, codegen end-to-end."""
    k = len(steps)
    if k == 0:
        raise ValueError("funnel needs at least one step")
    if any("'" in s for s in steps):
        raise ValueError("step names must not contain quotes")
    lits = ", ".join(f"'{s}'" for s in steps)
    fold = (
        "aggregate(evs, CAST(array() AS ARRAY<BIGINT>), (a, e) -> "
        f"CASE WHEN size(a) < {k} "
        f"AND e.tp = element_at(array({lits}), size(a) + 1) "
        "AND (size(a) = 0 OR e.ts > try_element_at(a, -1)) "
        "THEN concat(a, array(e.ts)) ELSE a END)")
    out = (events
           .groupBy(F.col(user_col).alias("user_id"))
           .agg(F.array_sort(F.collect_list(F.when(
               F.col(type_col).isin(*steps), F.struct(
                   F.col(ts_col).alias("ts"),
                   F.col(type_col).alias("tp")))))
               .alias("evs"))
           .select("user_id", F.expr(fold).alias("tl")))
    # try_element_at: index past the achieved-stage count is a NULL
    # stage time, not an ANSI error
    cols = [F.try_element_at("tl", F.lit(i + 1)).alias(f"t{i + 1}_us")
            for i in range(k)]
    return out.select(
        "user_id", *cols,
        F.size("tl").cast("int").alias("steps_reached"))
