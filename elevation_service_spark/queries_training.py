"""Driver-contract queries for the training-data operator surface
(dedup, text analysis, similarity search) and the relational coverage
(joins, aggregations, windows, set ops, rollups) — each with a DuckDB
oracle.  Exactness policy: every oracle-compared number is either an
integer, an exact string, or a float produced by the identical IEEE op
sequence (money → cents via floor(x*100+0.5))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup, similarity, text
from .queries import load

NH = dedup.NUM_HASHES
P = dedup.MINHASH_P
PARAMS = dedup.minhash_params()
ANN_QUERY_IDS = [0, 1, 2]
ANN_K = 10


# --- shared SQL fragments ----------------------------------------------------

_TOK_CTE = """tok AS (
  SELECT doc_id AS id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents)"""

_CODES_CTE = f"""{_TOK_CTE},
codes AS (SELECT id, pos, {dedup.TOKEN_CODE_SQL} AS code FROM tok)"""

_SIG_EXPRS = ", ".join(
    f"min((code * {a} + {b}) % {P}) AS s{i}" for i, (a, b) in enumerate(PARAMS))
_SIG_CTE = f"""{_CODES_CTE},
sig AS (SELECT id, {_SIG_EXPRS} FROM codes GROUP BY id)"""

_SIG_CONCAT = "concat_ws(','" + "".join(f", CAST(s{i} AS STRING)" for i in range(NH)) + ")"

_N_BANDS = NH // dedup.BAND_ROWS
_BANDS_SQL = " UNION ALL ".join(
    "SELECT id, {bi} AS band_idx, concat_ws(','{cols}) AS band_key FROM sig".format(
        bi=bi, cols="".join(f", CAST(s{bi * dedup.BAND_ROWS + j} AS STRING)"
                            for j in range(dedup.BAND_ROWS)))
    for bi in range(_N_BANDS))
_PAIRS_CTE = f"""{_SIG_CTE},
bands AS ({_BANDS_SQL}),
pairs AS (SELECT DISTINCT a.id AS id1, b.id AS id2
          FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id)"""


# --- dedup queries ------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(load(spark, sf_dir, "documents"))


_DEDUP_EXACT_ORACLE = """SELECT md5(text) AS fingerprint,
  CAST(count(*) AS BIGINT) AS n_dups, min(doc_id) AS representative
FROM documents GROUP BY md5(text)"""


def q_minhash_signatures(spark, sf_dir):
    sigs = dedup.minhash_signatures(load(spark, sf_dir, "documents"))
    return sigs.select("id", F.concat_ws(
        ",", *[F.col(f"s{i}").cast("string") for i in range(NH)]).alias("sig"))


_MINHASH_ORACLE = f"""WITH {_SIG_CTE}
SELECT id, {_SIG_CONCAT} AS sig FROM sig"""


def q_lsh_pairs(spark, sf_dir):
    return dedup.lsh_candidate_pairs(load(spark, sf_dir, "documents"))


_LSH_PAIRS_ORACLE = f"""WITH {_PAIRS_CTE}
SELECT id1, id2 FROM pairs"""


def q_lsh_pairs_capped(spark, sf_dir):
    """lsh_candidate_pairs through the capped code path (count + semi-join
    + self-join).  The cap is far above any fixture bucket, so the result
    equals the uncapped oracle — the capping MECHANISM is exercised under
    the hash gate; the bounded-output behavior on a pathological bucket is
    proven in tests/test_spark_pipeline.py and the bench lsh_capped row."""
    return dedup.lsh_candidate_pairs(load(spark, sf_dir, "documents"),
                                     max_bucket=100_000)


def q_containment_pairs(spark, sf_dir):
    """Asymmetric containment verification (r6): |A∩B|/|A| and /|B| per
    LSH candidate pair — catches sub-document duplication (full
    inclusion) that symmetric Jaccard misses."""
    return dedup.containment_pairs(load(spark, sf_dir, "documents"))


_CONTAINMENT_ORACLE = f"""WITH {_PAIRS_CTE},
sh0 AS (SELECT id,
        tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle,
        lead(tok, 2) OVER w AS t2
        FROM tok WINDOW w AS (PARTITION BY id ORDER BY pos)),
sh AS (SELECT DISTINCT id, shingle FROM sh0 WHERE t2 IS NOT NULL),
counts AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (SELECT p.id1, p.id2, count(*) AS inter
          FROM pairs p
          JOIN sh a ON a.id = p.id1
          JOIN sh b ON b.id = p.id2 AND b.shingle = a.shingle
          GROUP BY p.id1, p.id2)
SELECT p.id1, p.id2,
  CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
  CAST(c1.n_sh AS BIGINT) AS n1, CAST(c2.n_sh AS BIGINT) AS n2,
  CAST(coalesce(i.inter, 0) * 1000 // c1.n_sh AS BIGINT) AS cont1_milli,
  CAST(coalesce(i.inter, 0) * 1000 // c2.n_sh AS BIGINT) AS cont2_milli
FROM pairs p
LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2
JOIN counts c1 ON c1.id = p.id1
JOIN counts c2 ON c2.id = p.id2"""


def q_simhash(spark, sf_dir):
    return dedup.simhash(load(spark, sf_dir, "documents"))


_SIMHASH_SUMS = ", ".join(
    f"sum((((h >> {b}) & 1) * 2) - 1) AS c{b}" for b in range(32))
_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN c{b} > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {b})"
    for b in range(32))
_SIMHASH_ORACLE = f"""WITH {_CODES_CTE},
hs AS (SELECT id, (code * {dedup.SIMHASH_MULT}) % {dedup.SIMHASH_MOD} AS h FROM codes),
c AS (SELECT id, {_SIMHASH_SUMS} FROM hs GROUP BY id)
SELECT id, CAST({_SIMHASH_BITS} AS BIGINT) AS simhash FROM c"""


def q_jaccard_pairs(spark, sf_dir):
    return dedup.jaccard_pairs(load(spark, sf_dir, "documents"))


_JACCARD_ORACLE = f"""WITH {_PAIRS_CTE},
sh0 AS (SELECT id,
        tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle,
        lead(tok, 2) OVER w AS t2
        FROM tok WINDOW w AS (PARTITION BY id ORDER BY pos)),
sh AS (SELECT DISTINCT id, shingle FROM sh0 WHERE t2 IS NOT NULL),
counts AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (SELECT p.id1, p.id2, count(*) AS inter
          FROM pairs p
          JOIN sh a ON a.id = p.id1
          JOIN sh b ON b.id = p.id2 AND b.shingle = a.shingle
          GROUP BY p.id1, p.id2)
SELECT p.id1, p.id2,
  CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
  CAST(c1.n_sh + c2.n_sh - coalesce(i.inter, 0) AS BIGINT) AS uni
FROM pairs p
LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2
JOIN counts c1 ON c1.id = p.id1
JOIN counts c2 ON c2.id = p.id2"""


# --- text queries ---------------------------------------------------------------

def q_text_stats(spark, sf_dir):
    return text.text_stats(load(spark, sf_dir, "documents"))


_STOP_IN = ", ".join(f"'{s}'" for s in text.STOPWORDS)
_TEXT_STATS_ORACLE = f"""SELECT doc_id AS id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
  CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_IN}))) AS BIGINT) AS n_stopwords,
  CAST(floor(list_sum(list_transform(string_split(text, ' '), t -> length(t))) * 1000 / len(string_split(text, ' '))) AS BIGINT) AS avg_token_len_milli
FROM documents"""


def q_token_count(spark, sf_dir):
    return text.token_count_bpe(load(spark, sf_dir, "documents"))


_TOKEN_COUNT_ORACLE = f"""SELECT doc_id AS id,
  CAST(len(regexp_extract_all(text, '{text.TOKEN_REGEX}')) AS BIGINT) AS n_bpe_tokens
FROM documents"""


def q_lang_id(spark, sf_dir):
    return text.lang_id(load(spark, sf_dir, "documents"))


def _lang_sql_parts() -> tuple[str, str]:
    """(score_exprs, chain) — the ONE definition site for the lang-ID
    argmax SQL, mirroring text.lang_argmax (VERDICT r4 #8): both the
    lang_id and quality_filter oracles are generated from this, so the
    Spark chain and its two DuckDB replays cannot drift."""
    langs = sorted(text.LANG_MARKERS)
    score_exprs = ", ".join(
        "len(list_filter(string_split(text, ' '), t -> t IN ({m}))) AS s_{l}".format(
            m=", ".join(f"'{w}'" for w in text.LANG_MARKERS[l]), l=l)
        for l in langs)
    chain = []
    for lang in langs:
        conds = [f"s_{lang} > 0"]
        for other in langs:
            if other == lang:
                continue
            op = ">=" if other > lang else ">"
            conds.append(f"s_{lang} {op} s_{other}")
        chain.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return score_exprs, " ".join(chain)


def _langid_oracle() -> str:
    langs = sorted(text.LANG_MARKERS)
    score_exprs, chain_sql = _lang_sql_parts()
    greatest = ", ".join(f"s_{l}" for l in langs)
    return f"""WITH s AS (SELECT doc_id AS id, lang AS lang_given, {score_exprs} FROM documents)
SELECT id, lang_given,
  CASE {chain_sql} ELSE 'und' END AS lang_pred,
  CAST(greatest({greatest}) AS BIGINT) AS score
FROM s"""


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix (r6): predicted language vs the
    corpus label, per (given, predicted) cell with count and summed
    detector score — the classifier-quality eval a curation pipeline
    reads before trusting the lang filter.  One rollup over the gated
    lang_id projection; oracle reuses the same generated argmax SQL."""
    pred = text.lang_id(load(spark, sf_dir, "documents"))
    return (pred.groupBy("lang_given", "lang_pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("score").cast("long").alias("score_sum")))


def _lang_confusion_oracle() -> str:
    return f"""WITH p AS ({_langid_oracle()})
SELECT lang_given, lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(score) AS BIGINT) AS score_sum
FROM p GROUP BY 1, 2"""


def q_top_terms(spark, sf_dir):
    """tf x linear-idf top-3 terms per document (term weighting over the
    inverted-index shape; exact integer micro scores)."""
    return text.top_terms(load(spark, sf_dir, "documents"), k=3)


_TOP_TERMS_ORACLE = f"""WITH {_TOK_CTE},
tf AS (SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY id, tok),
dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT tf.id, tf.tok, tf.tf, dfq.df,
         (tf.tf * nd.n * 1000000) // dfq.df AS score_micro
  FROM tf JOIN dfq USING (tok) CROSS JOIN nd)
SELECT id, CAST(rank AS INT) AS rank, tok, tf, df, CAST(score_micro AS BIGINT) AS score_micro FROM (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY score_micro DESC, tok ASC) AS rank
  FROM scored) t WHERE rank <= 3"""


def q_fingerprint(spark, sf_dir):
    return text.fingerprint(load(spark, sf_dir, "documents"))


_FINGERPRINT_ORACLE = r"""SELECT doc_id AS id,
  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
FROM documents"""


# --- similarity queries -----------------------------------------------------------

def q_ann_topk(spark, sf_dir):
    return similarity.ann_brute_topk(load(spark, sf_dir, "embeddings"),
                                     ANN_QUERY_IDS, ANN_K)


_ANN_ORACLE = f"""WITH e AS (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * {similarity.QUANT_SCALE} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS v
  FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({", ".join(map(str, ANN_QUERY_IDS))})),
scored AS (SELECT q.qid, e.vec_id, CAST(list_dot_product(q.qv, e.v) AS BIGINT) AS score
           FROM e, q WHERE e.vec_id <> q.qid)
SELECT qid, CAST(rank AS INT) AS rank, vec_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
  FROM scored) r
WHERE rank <= {ANN_K}"""


# --- relational coverage (joins/aggs/windows/set ops/rollup) ------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped aggregation; money summed as exact cents."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)).cast("long")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                 F.sum(cents).alias("sum_base_cents"),
                 F.sum(disc_cents).alias("sum_disc_cents"),
                 F.count(F.lit(1)).alias("count_order")))


_PRICING_ORACLE = """SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_base_cents,
  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


def q_top_customers(spark, sf_dir):
    """3-way join + agg + per-nation top-3 window rank."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    agg = (o.join(c, o["o_custkey"] == c["c_custkey"])
           .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
           .groupBy("n_name", "c_custkey")
           .agg(F.sum(cents).alias("total_cents"),
                F.count(F.lit(1)).alias("n_orders")))
    w = Window.partitionBy("n_name").orderBy(F.col("total_cents").desc(), F.col("c_custkey"))
    return (agg.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("n_name", "rnk", "c_custkey", "total_cents", "n_orders"))


_TOP_CUSTOMERS_ORACLE = """WITH agg AS (
  SELECT n_name, c_custkey,
    CAST(sum(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS total_cents,
    CAST(count(*) AS BIGINT) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey)
SELECT n_name, CAST(rnk AS INT) AS rnk, c_custkey, total_cents, n_orders FROM (
  SELECT *, row_number() OVER (PARTITION BY n_name ORDER BY total_cents DESC, c_custkey) AS rnk
  FROM agg) t
WHERE rnk <= 3"""


def q_order_set_ops(spark, sf_dir):
    """Set operators: customers with orders minus customers with big
    orders, unioned with a disjoint marker set."""
    o = load(spark, sf_dir, "orders")
    with_orders = o.select(F.col("o_custkey").alias("k")).distinct()
    big = (o.filter(F.col("o_totalprice") > 200000.0)
           .select(F.col("o_custkey").alias("k")).distinct())
    small_only = with_orders.exceptAll(big).select("k")
    marker = with_orders.select((F.col("k") + 10_000_000).alias("k"))
    return small_only.union(marker).distinct()


_SET_OPS_ORACLE = """WITH wo AS (SELECT DISTINCT o_custkey AS k FROM orders),
big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 200000.0)
SELECT k FROM ((SELECT k FROM wo EXCEPT SELECT k FROM big)
UNION
SELECT k + 10000000 AS k FROM wo) u"""


def q_orders_rollup(spark, sf_dir):
    """Grouping-sets lineage rollup (cube/rollup §2.B)."""
    o = load(spark, sf_dir, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("cents")))


_ROLLUP_ORACLE = """SELECT o_orderstatus, o_orderpriority,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS cents
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""


def q_events_running(spark, sf_dir):
    """Per-user running sum + row_number over event time (value in exact
    milli-units)."""
    # NTZ->instant interpretation must be UTC for unix_micros to equal the
    # oracle's epoch_us regardless of the host session's zone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = load(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.select("event_id", "user_id", mv.alias("mv"),
                     F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
            .withColumn("running_mv", F.sum("mv").over(
                Window.partitionBy("user_id").orderBy("ts_us", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)))
            .withColumn("seq", F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts_us", "event_id")))
            .select("event_id", "user_id", "ts_us", "mv", "running_mv", "seq"))


_EVENTS_RUNNING_ORACLE = """SELECT event_id, user_id,
  epoch_us(ts) AS ts_us,
  CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mv,
  CAST(sum(CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT))
       OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_mv,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS INT) AS seq
FROM events"""


# --- semi-structured props + exact order statistics (r5) ---------------------

def q_props_rollup(spark, sf_dir):
    """Semi-structured JSON extraction (r5): pull the integer `k` out of
    the events' JSON props column (get_json_object — JVM-side JSON path,
    no Python) and roll up per k-decade: counts, distinct users, exact
    integer value-cents.  The webtext pipeline's metadata-sidecar shape."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (e.select((k - k % 10).alias("k_decade"), "user_id",
                     cents.alias("cents"))
            .groupBy("k_decade")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum("cents").alias("sum_cents")))


_PROPS_ROLLUP_ORACLE = """WITH e AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT k - k % 10 AS k_decade,
  CAST(count(*) AS BIGINT) AS n,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(sum(cents) AS BIGINT) AS sum_cents
FROM e GROUP BY 1"""


def q_value_quantiles(spark, sf_dir):
    """Exact order statistics per event type (r5): type-1 (selection)
    quantiles — the value at rank ceil(q*n), NO interpolation — so both
    engines pick the identical element (interpolated percentile formulas
    differ in ULPs across engines; selection cannot).  One window + one
    pivot-free join; ties broken by event_id for full determinism."""
    from pyspark.sql import Window
    e = load(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(),
                                                 F.col("event_id").asc())
    ranked = e.withColumn("_rn", F.row_number().over(w))
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    r = ranked.join(counts, "event_type")
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    agg = [F.max(F.when(F.col("_rn") == F.ceil(F.col("_n") * F.lit(q)),
                        F.col("value"))).alias(name)
           for name, q in qs.items()]
    return (r.groupBy("event_type")
            .agg(F.max("_n").cast("long").alias("n"), *agg))


_VALUE_QUANTILES_ORACLE = """WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
  max(CASE WHEN rn = ceil(n * 0.5) THEN value END) AS p50,
  max(CASE WHEN rn = ceil(n * 0.9) THEN value END) AS p90,
  max(CASE WHEN rn = ceil(n * 0.99) THEN value END) AS p99
FROM r GROUP BY event_type"""


# --- per-source robust outliers (r6) -----------------------------------------
# every 97th doc gets +5000 chars so the outlier class is live at every SF
_OUTLIER_VAL_SQL = ("n_chars + CASE WHEN doc_id % 97 = 0 "
                    "THEN 5000 ELSE 0 END")


def q_source_outliers(spark, sf_dir):
    """Per-source robust outlier detection (r6): median/MAD fence over
    document length — the curation filter that drops the one pathological
    page without a distribution assumption.  Both statistics are type-1
    selection quantiles, the fence is pure int64."""
    from .operators.text import robust_outliers
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_OUTLIER_VAL_SQL).alias("v"))
    return robust_outliers(docs, "source", "v", "doc_id", c=5)


_SOURCE_OUTLIERS_ORACLE = f"""WITH d AS (
  SELECT doc_id AS id, source AS grp,
         CAST({_OUTLIER_VAL_SQL} AS BIGINT) AS val
  FROM documents),
r1 AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY val, id) AS rn,
              count(*) OVER (PARTITION BY grp) AS n FROM d),
med AS (SELECT grp, max(CASE WHEN rn = ceil(n * 0.5) THEN val END) AS med
        FROM r1 GROUP BY grp),
dv AS (SELECT d.id, d.grp, d.val, med.med,
              abs(d.val - med.med) AS dev
       FROM d JOIN med USING (grp)),
r2 AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY dev, id) AS rn,
              count(*) OVER (PARTITION BY grp) AS n FROM dv),
mad AS (SELECT grp, max(CASE WHEN rn = ceil(n * 0.5) THEN dev END) AS mad
        FROM r2 GROUP BY grp)
SELECT dv.id, dv.grp AS source, dv.val, dv.med, mad.mad,
       dv.dev > 5 * mad.mad AS is_outlier
FROM dv JOIN mad USING (grp)"""


# --- ordered funnel analysis (r6) --------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def q_user_funnel(spark, sf_dir):
    """Ordered 3-step funnel (r6): per user the earliest view, the
    earliest click STRICTLY after it, the earliest purchase strictly
    after that — ONE exchange (when()-filtered collect_list + pure
    Column left-fold), non-converting users included.  The oracle runs
    the independent k-chained-aggregate relational form (min-qualifying
    per stage), which the fold provably equals."""
    from .operators.web import funnel_steps
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    return funnel_steps(e, FUNNEL_STEPS)


_USER_FUNNEL_ORACLE = """WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND ts_us > s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND ts_us > s2.t2 GROUP BY 1),
u AS (SELECT DISTINCT user_id FROM e)
SELECT u.user_id, s1.t1 AS t1_us, s2.t2 AS t2_us, s3.t3 AS t3_us,
  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS steps_reached
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)"""


# --- relational PIVOT (r6) ---------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(spark, sf_dir):
    """Relational PIVOT (r6): per-user event-type matrix — count + exact
    milli-quantized value sum per type, one column pair per type.  The
    pivot VALUES are passed explicitly: without them Spark runs an extra
    distinct-scan job over the whole input to discover the domain before
    it can even plan — at 100 TB that is a full second pass, and the
    column set would silently drift with the data.  With the literal list
    the pivot is ONE map-side-combinable groupBy (partial aggregation of
    5x2 cells per user on the map side, one exchange on user_id).

    Physical form: conditional aggregation (sum of CASE per cell), NOT
    `DataFrame.pivot` — measured on this plan, native pivot compiles to
    TWO exchanges (partial (user,type) agg, then a pivotfirst re-agg on
    user) while the CASE form is a single map-side-combined
    HashAggregate + ONE exchange carrying one already-partial row per
    user.  Same result, one fewer stage barrier.

    Empty cells: sum(CASE ...) yields NULL for a (user, type) pair with
    no rows; both engines coalesce to 0 so absence is a value, not a
    hole."""
    e = load(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
    base = e.select("user_id", "event_type", mv.alias("mv"))
    aggs = []
    for t in EVENT_TYPES:
        hit = F.col("event_type") == t
        aggs.append(F.coalesce(F.sum(F.when(hit, F.lit(1))), F.lit(0))
                    .cast("long").alias(f"{t}_n"))
        aggs.append(F.coalesce(F.sum(F.when(hit, F.col("mv"))), F.lit(0))
                    .cast("long").alias(f"{t}_mv"))
    return base.groupBy("user_id").agg(*aggs)


def _events_pivot_oracle() -> str:
    cells = []
    for t in EVENT_TYPES:
        cells.append(
            f"CAST(coalesce(sum(CASE WHEN event_type = '{t}' THEN 1 END), 0)"
            f" AS BIGINT) AS {t}_n")
        cells.append(
            f"CAST(coalesce(sum(CASE WHEN event_type = '{t}' THEN mv END), 0)"
            f" AS BIGINT) AS {t}_mv")
    body = ",\n  ".join(cells)
    return f"""WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mv
  FROM events)
SELECT user_id,
  {body}
FROM e GROUP BY user_id"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap) via lag + cumulative flag —
    the batch equivalent of a streaming session window."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = e.select("event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    flagged = base.withColumn(
        "new_sess",
        F.when(F.col("ts_us") - F.lag("ts_us", 1).over(w) > 1800 * 1_000_000, 1)
        .otherwise(F.lit(0)))
    return (flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select("event_id", "user_id", "ts_us",
                F.col("session_seq").cast("long").alias("session_seq")))


_SESSIONIZE_ORACLE = """WITH base AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
flagged AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us, 1) OVER w > 1800 * 1000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
SELECT event_id, user_id, ts_us,
  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM flagged"""


# --- registry -----------------------------------------------------------------------

SPARK_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "minhash_signatures": q_minhash_signatures,
    "lsh_pairs": q_lsh_pairs,
    "lsh_pairs_capped": q_lsh_pairs_capped,
    "simhash": q_simhash,
    "jaccard_pairs": q_jaccard_pairs,
    "containment_pairs": q_containment_pairs,
    "text_stats": q_text_stats,
    "token_count": q_token_count,
    "lang_id": q_lang_id,
    "lang_confusion": q_lang_confusion,
    "fingerprint": q_fingerprint,
    "top_terms": q_top_terms,
    "ann_topk": q_ann_topk,
    "pricing_summary": q_pricing_summary,
    "top_customers": q_top_customers,
    "order_set_ops": q_order_set_ops,
    "orders_rollup": q_orders_rollup,
    "events_running": q_events_running,
    "sessionize": q_sessionize,
    "props_rollup": q_props_rollup,
    "value_quantiles": q_value_quantiles,
    "events_pivot": q_events_pivot,
    "source_outliers": q_source_outliers,
    "user_funnel": q_user_funnel,
}

ORACLES = {
    "dedup_exact": _DEDUP_EXACT_ORACLE,
    "minhash_signatures": _MINHASH_ORACLE,
    "lsh_pairs": _LSH_PAIRS_ORACLE,
    "lsh_pairs_capped": _LSH_PAIRS_ORACLE,
    "simhash": _SIMHASH_ORACLE,
    "jaccard_pairs": _JACCARD_ORACLE,
    "containment_pairs": _CONTAINMENT_ORACLE,
    "text_stats": _TEXT_STATS_ORACLE,
    "token_count": _TOKEN_COUNT_ORACLE,
    "lang_id": _langid_oracle(),
    "lang_confusion": _lang_confusion_oracle(),
    "fingerprint": _FINGERPRINT_ORACLE,
    "top_terms": _TOP_TERMS_ORACLE,
    "ann_topk": _ANN_ORACLE,
    "pricing_summary": _PRICING_ORACLE,
    "top_customers": _TOP_CUSTOMERS_ORACLE,
    "order_set_ops": _SET_OPS_ORACLE,
    "orders_rollup": _ROLLUP_ORACLE,
    "events_running": _EVENTS_RUNNING_ORACLE,
    "sessionize": _SESSIONIZE_ORACLE,
    "props_rollup": _PROPS_ROLLUP_ORACLE,
    "value_quantiles": _VALUE_QUANTILES_ORACLE,
    "events_pivot": _events_pivot_oracle(),
    "source_outliers": _SOURCE_OUTLIERS_ORACLE,
    "user_funnel": _USER_FUNNEL_ORACLE,
}


# --- additional coverage ------------------------------------------------------

def q_simhash_pairs(spark, sf_dir):
    return dedup.simhash_near_pairs(load(spark, sf_dir, "documents"),
                                    max_hamming=30)


_SIMHASH_PAIRS_ORACLE = f"""WITH {_PAIRS_CTE},
hs AS (SELECT id, (code * {dedup.SIMHASH_MULT}) % {dedup.SIMHASH_MOD} AS h FROM codes),
c AS (SELECT id, {_SIMHASH_SUMS} FROM hs GROUP BY id),
sh2 AS (SELECT id, CAST({_SIMHASH_BITS} AS BIGINT) AS simhash FROM c)
SELECT p.id1, p.id2, CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM pairs p JOIN sh2 a ON a.id = p.id1 JOIN sh2 b ON b.id = p.id2
WHERE bit_count(xor(a.simhash, b.simhash)) <= 30"""


def q_distinct_stats(spark, sf_dir):
    """exact distinct aggregations over documents (grouping coverage)."""
    d = load(spark, sf_dir, "documents")
    return (d.groupBy("source")
            .agg(F.countDistinct("lang").alias("n_langs"),
                 F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars")))


_DISTINCT_STATS_ORACLE = """SELECT source,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(count(*) AS BIGINT) AS n_docs,
  min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY source"""


# per-track cumulative planar length.  sqrt is correctly-rounded IEEE so the
# per-step float is bit-equal across engines, but running-window FLOAT sums
# are not association-safe (DuckDB uses a segment tree) — each step is
# quantized to integer micro-units before the cumulative sum, which is then
# exact in any association.
_TRACK_ID = "CAST(c_custkey % 50 AS BIGINT)"


def q_track_cumlen(spark, sf_dir):
    from .queries import LAT_SQL, LON_SQL
    from pyspark.sql import Window
    pts = load(spark, sf_dir, "customer").select(
        F.expr(_TRACK_ID).alias("track_id"),
        F.col("c_custkey").alias("seq"),
        F.expr(LAT_SQL).alias("lat"), F.expr(LON_SQL).alias("lon"))
    w = Window.partitionBy("track_id").orderBy("seq")
    step = F.sqrt((F.col("lat") - F.lag("lat", 1).over(w))
                  * (F.col("lat") - F.lag("lat", 1).over(w))
                  + (F.col("lon") - F.lag("lon", 1).over(w))
                  * (F.col("lon") - F.lag("lon", 1).over(w)))
    step_u = F.floor(F.coalesce(step, F.lit(0.0)) * 1000000 + F.lit(0.5)).cast("long")
    return (pts.withColumn("step_u", step_u)
            .withColumn("cum_len_micro", F.sum("step_u").over(
                w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
            .select("track_id", "seq", "cum_len_micro"))


def _track_oracle():
    from .queries import LAT_SQL, LON_SQL
    return f"""WITH pts AS (
  SELECT {_TRACK_ID} AS track_id, c_custkey AS seq,
         {LAT_SQL} AS lat, {LON_SQL} AS lon FROM customer),
st AS (
  SELECT track_id, seq,
    CAST(floor(coalesce(sqrt((lat - lag(lat, 1) OVER w) * (lat - lag(lat, 1) OVER w)
                + (lon - lag(lon, 1) OVER w) * (lon - lag(lon, 1) OVER w)),
             CAST(0 AS DOUBLE)) * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS step_u
  FROM pts WINDOW w AS (PARTITION BY track_id ORDER BY seq))
SELECT track_id, seq,
  CAST(sum(step_u) OVER (PARTITION BY track_id ORDER BY seq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_len_micro
FROM st"""


def q_elevation_profile(spark, sf_dir):
    """Per-track elevation profile (r6): the route-profile view an
    elevation service exists to serve — derived waypoints through the
    REAL broadcast enrich (tile decode + bilinear), elevation quantized
    to e64 ticks, then per-track total gain / loss / extrema via a lag
    window partitioned by track.  Quantize-then-diff keeps every
    aggregate an exact integer sum (float gains would be
    order-dependent); the oracle replays the closed-form bilinear DEM
    and the identical window."""
    from pyspark.sql import Window
    from .queries import _q_elevation
    out = _q_elevation(spark, sf_dir)
    e = out.select(
        (F.col("pid") % 50).cast("long").alias("track_id"),
        F.col("pid").alias("seq"),
        F.floor(F.col("elevation") * 64 + F.lit(0.5)).cast("long")
        .alias("e64"))
    w = Window.partitionBy("track_id").orderBy("seq")
    d = F.col("e64") - F.lag("e64", 1).over(w)
    return (e.withColumn("_d", d)
            .groupBy("track_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.coalesce(F.sum(F.when(F.col("_d") > 0, F.col("_d"))),
                            F.lit(0)).cast("long").alias("gain64"),
                 F.coalesce(F.sum(F.when(F.col("_d") < 0, -F.col("_d"))),
                            F.lit(0)).cast("long").alias("loss64"),
                 F.min("e64").cast("long").alias("min_e64"),
                 F.max("e64").cast("long").alias("max_e64")))


def _elevation_profile_oracle() -> str:
    from .queries import _BILINEAR_ORACLE
    return f"""WITH base AS ({_BILINEAR_ORACLE}),
e AS (SELECT CAST(pid % 50 AS BIGINT) AS track_id, pid AS seq,
  CAST(floor(elevation * 64 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS e64
  FROM base),
d AS (SELECT track_id, e64,
  e64 - lag(e64, 1) OVER (PARTITION BY track_id ORDER BY seq) AS df
  FROM e)
SELECT track_id, CAST(count(*) AS BIGINT) AS n_points,
  CAST(coalesce(sum(CASE WHEN df > 0 THEN df END), 0) AS BIGINT) AS gain64,
  CAST(coalesce(sum(CASE WHEN df < 0 THEN -df END), 0) AS BIGINT) AS loss64,
  CAST(min(e64) AS BIGINT) AS min_e64,
  CAST(max(e64) AS BIGINT) AS max_e64
FROM d GROUP BY 1"""


def q_embedding_centroids(spark, sf_dir):
    """Per-label embedding centroid signatures (r6): exact quantized
    per-dimension sums + member counts — the mergeable domain-signature
    artifact for drift monitoring (centroid = sum_q/n_vecs as an exact
    rational)."""
    from .operators.similarity import embedding_centroids
    return embedding_centroids(load(spark, sf_dir, "embeddings"))


_EMB_CENTROIDS_ORACLE = f"""WITH e AS (
  SELECT label AS grp, list_transform(embedding,
    x -> CAST(floor(CAST(x AS DOUBLE) * {similarity.QUANT_SCALE}
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS qv
  FROM embeddings),
c AS (SELECT grp, generate_subscripts(qv, 1) - 1 AS pos, unnest(qv) AS val
      FROM e)
SELECT grp, CAST(pos AS INT) AS pos, CAST(sum(val) AS BIGINT) AS sum_q,
  CAST(count(*) AS BIGINT) AS n_vecs
FROM c GROUP BY 1, 2"""


def q_embedding_neardup(spark, sf_dir):
    return similarity.embedding_near_dup_pairs(
        load(spark, sf_dir, "embeddings"), min_score=1)


def _embedding_neardup_oracle():
    dim, planes = 64, similarity.N_PLANES
    sign = ("CASE ((j * 31 + (pos - 1) * 17) % 2) WHEN 0 THEN 1 ELSE -1 END")
    return f"""WITH e AS (
  SELECT vec_id AS id, list_transform(embedding,
    x -> CAST(floor(CAST(x AS DOUBLE) * {similarity.QUANT_SCALE} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS v
  FROM embeddings),
comp AS (
  SELECT id, generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM e),
proj AS (
  SELECT c.id, j.j, sum(c.val * ({sign})) AS p
  FROM comp c CROSS JOIN (SELECT unnest(range({planes})) AS j) j
  GROUP BY c.id, j.j),
bkt AS (
  SELECT id, sum(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS bucket
  FROM proj GROUP BY id)
SELECT a.id AS id1, b.id AS id2,
  CAST(list_dot_product(ea.v, eb.v) AS BIGINT) AS score
FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.id < b.id
JOIN e ea ON ea.id = a.id JOIN e eb ON eb.id = b.id
WHERE list_dot_product(ea.v, eb.v) >= 1"""


SPARK_QUERIES.update({
    "simhash_pairs": q_simhash_pairs,
    "distinct_stats": q_distinct_stats,
    "track_cumlen": q_track_cumlen,
    "elevation_profile": q_elevation_profile,
    "embedding_neardup": q_embedding_neardup,
})
ORACLES.update({
    "simhash_pairs": _SIMHASH_PAIRS_ORACLE,
    "distinct_stats": _DISTINCT_STATS_ORACLE,
    "track_cumlen": _track_oracle(),
    "elevation_profile": _elevation_profile_oracle(),
    "embedding_neardup": _embedding_neardup_oracle(),
})


def q_ann_lsh(spark, sf_dir):
    """sign-LSH bucketed ANN (the scale path; recall measured vs brute in
    tests/test_spatial.py).  The buckets are deterministic integer math, so
    the oracle recomputes them exactly (promoted from rows-only in r02)."""
    return similarity.ann_lsh_topk(load(spark, sf_dir, "embeddings"),
                                   ANN_QUERY_IDS, ANN_K)


def _ann_lsh_oracle():
    planes = similarity.N_PLANES
    qids = ", ".join(map(str, ANN_QUERY_IDS))
    sign = "CASE ((j * 31 + (pos - 1) * 17) % 2) WHEN 0 THEN 1 ELSE -1 END"
    return f"""WITH e AS (
  SELECT vec_id AS id, list_transform(embedding,
    x -> CAST(floor(CAST(x AS DOUBLE) * {similarity.QUANT_SCALE} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS v
  FROM embeddings),
comp AS (
  SELECT id, generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM e),
proj AS (
  SELECT c.id, j.j, sum(c.val * ({sign})) AS p
  FROM comp c CROSS JOIN (SELECT unnest(range({planes})) AS j) j
  GROUP BY c.id, j.j),
bkt AS (
  SELECT id, sum(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS bucket
  FROM proj GROUP BY id),
q AS (SELECT b.id AS qid, b.bucket AS qbucket, e.v AS qv
      FROM bkt b JOIN e ON e.id = b.id WHERE b.id IN ({qids})),
cand AS (
  SELECT q.qid, b.id AS vec_id, CAST(list_dot_product(q.qv, e.v) AS BIGINT) AS score
  FROM q JOIN bkt b ON b.bucket = q.qbucket AND b.id <> q.qid
  JOIN e ON e.id = b.id)
SELECT qid, CAST(rank AS INT) AS rank, vec_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
  FROM cand) r WHERE rank <= {ANN_K}"""


ORACLES["ann_lsh"] = _ann_lsh_oracle()


def q_ann_recall(spark, sf_dir):
    """ANN quality evaluation (r6): recall@k of the sign-LSH index
    against the brute-force ground truth — the measurement loop any
    approximate-similarity deployment runs before trusting the index.
    Both sides are the exact gated operators; recall_milli is integer
    (n_hits * 1000 div k), deterministic because both top-k lists use
    the total (score DESC, vec_id) order."""
    bt = q_ann_topk(spark, sf_dir).select("qid", "vec_id")
    lh = (q_ann_lsh(spark, sf_dir).select("qid", "vec_id")
          .withColumn("_hit", F.lit(1)))
    return (bt.join(lh, ["qid", "vec_id"], "left")
            .groupBy("qid")
            .agg(F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
                 .alias("n_hits"))
            .select("qid", "n_hits",
                    F.expr(f"n_hits * 1000L div {ANN_K}")
                    .alias("recall_milli")))


def _ann_recall_oracle() -> str:
    return f"""WITH bt AS ({_ANN_ORACLE}),
lh AS ({_ann_lsh_oracle()})
SELECT bt.qid, CAST(count(lh.vec_id) AS BIGINT) AS n_hits,
  CAST(count(lh.vec_id) * 1000 // {ANN_K} AS BIGINT) AS recall_milli
FROM bt LEFT JOIN lh ON lh.qid = bt.qid AND lh.vec_id = bt.vec_id
GROUP BY bt.qid"""


SPARK_QUERIES["ann_recall"] = q_ann_recall
ORACLES["ann_recall"] = _ann_recall_oracle()


# --- rows-only queries (no SQL-expressible oracle; driver records a weaker
# rows-only check — approx sketches differ across engines by design) --------


def q_approx_distinct(spark, sf_dir):
    """HLL approx_count_distinct for lineage metrics (SURVEY §2.B aggs);
    approximate by design -> rows-only check."""
    d = load(spark, sf_dir, "documents")
    return (d.groupBy("lang")
            .agg(F.approx_count_distinct("source").alias("approx_sources"),
                 F.count(F.lit(1)).alias("n")))


SPARK_QUERIES.update({
    "ann_lsh": q_ann_lsh,
    "approx_distinct": q_approx_distinct,
})


def q_orders_cube(spark, sf_dir):
    """CUBE grouping sets (all subtotal combinations; §2.B aggregations)."""
    o = load(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("cents")))


_CUBE_ORACLE = """SELECT o_orderstatus, o_orderpriority,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS cents
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""

SPARK_QUERIES["orders_cube"] = q_orders_cube
ORACLES["orders_cube"] = _CUBE_ORACLE


def q_winnow_fingerprints(spark, sf_dir):
    return text.winnow_fingerprints(load(spark, sf_dir, "documents"))


def _winnow_oracle():
    B, P, K, W = (text.WINNOW_B, text.WINNOW_P, text.WINNOW_K, text.WINNOW_W)
    # per-term mod mirrors winnow_fingerprints (hash codes ~2^31 would
    # overflow an unreduced 4-term int64 sum)
    terms = " + ".join(
        f"((lead(code, {j}) OVER w) * {pow(B, K - 1 - j, P)}) % {P}"
        for j in range(K))
    return f"""WITH {_CODES_CTE},
hashed AS (
  SELECT id, pos, ({terms}) % {P} AS h,
         lead(code, {K - 1}) OVER w AS _t
  FROM codes WINDOW w AS (PARTITION BY id ORDER BY pos)),
hf AS (SELECT id, pos, h FROM hashed WHERE _t IS NOT NULL),
wmin AS (
  SELECT id,
         min(h) OVER (PARTITION BY id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {W - 1} FOLLOWING) AS fp,
         lead(h, {W - 1}) OVER (PARTITION BY id ORDER BY pos) AS _last
  FROM hf)
SELECT DISTINCT id, fp FROM wmin WHERE _last IS NOT NULL"""


SPARK_QUERIES["winnow_fingerprints"] = q_winnow_fingerprints
ORACLES["winnow_fingerprints"] = _winnow_oracle()


def q_top_bigrams(spark, sf_dir):
    """Top-5 bigrams per language (corpus statistics; per-doc window +
    map-side-combined counts + vocabulary-sized top-k)."""
    return text.top_ngrams_per_lang(load(spark, sf_dir, "documents"), n=2, k=5)


_TOP_BIGRAMS_ORACLE = """WITH t AS (
  SELECT doc_id AS id, lang,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents),
g AS (
  SELECT lang, tok || ' ' || lead(tok, 1) OVER w AS ngram,
         lead(tok, 1) OVER w AS _t
  FROM t WINDOW w AS (PARTITION BY id ORDER BY pos)),
c AS (SELECT lang, ngram, CAST(count(*) AS BIGINT) AS n_occ
      FROM g WHERE _t IS NOT NULL GROUP BY lang, ngram)
SELECT lang, CAST(rank AS INT) AS rank, ngram, n_occ FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n_occ DESC, ngram ASC) AS rank
  FROM c) r WHERE rank <= 5"""

SPARK_QUERIES["top_bigrams"] = q_top_bigrams
ORACLES["top_bigrams"] = _TOP_BIGRAMS_ORACLE


def q_top_trigrams_lang(spark, sf_dir):
    """Top-5 trigrams per language (VERDICT r2 #8: the per-lang n-gram
    statistic gated at larger n) — window-free array-HOF n-grams."""
    return text.top_ngrams_per_lang(load(spark, sf_dir, "documents"), n=3, k=5)


_TOP_TRIGRAMS_ORACLE = """WITH t AS (
  SELECT doc_id AS id, lang,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents),
g AS (
  SELECT lang,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS ngram,
         lead(tok, 2) OVER w AS _t
  FROM t WINDOW w AS (PARTITION BY id ORDER BY pos)),
c AS (SELECT lang, ngram, CAST(count(*) AS BIGINT) AS n_occ
      FROM g WHERE _t IS NOT NULL GROUP BY lang, ngram)
SELECT lang, CAST(rank AS INT) AS rank, ngram, n_occ FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n_occ DESC, ngram ASC) AS rank
  FROM c) r WHERE rank <= 5"""

SPARK_QUERIES["top_trigrams_lang"] = q_top_trigrams_lang
ORACLES["top_trigrams_lang"] = _TOP_TRIGRAMS_ORACLE


def q_contamination(spark, sf_dir):
    """Train/test n-gram contamination (VERDICT r2 #8): distinct 5-gram
    overlap of every test-split doc against the train split — composes
    hash_split + ngram_shingles + a distributed left-semi membership join.
    The daily pre-eval check of an LLM-data pipeline, hash-gated."""
    return text.contamination_check(load(spark, sf_dir, "documents"), n=5)


def _contamination_oracle() -> str:
    from .operators.sampling import hash_bucket_sql
    b = hash_bucket_sql("doc_id")
    lead_chain = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {i}) OVER w" for i in range(1, 5)])
    return f"""WITH s AS (
  SELECT doc_id AS id, text,
         CASE WHEN {b} < 9000 THEN 'train'
              WHEN {b} < 9500 THEN 'val' ELSE 'test' END AS split
  FROM documents),
tok AS (SELECT id, split,
        generate_subscripts(string_split(text, ' '), 1) AS pos,
        unnest(string_split(text, ' ')) AS tok
        FROM s),
sh0 AS (SELECT id, split, {lead_chain} AS shingle,
        lead(tok, 4) OVER w AS _t
        FROM tok WINDOW w AS (PARTITION BY id ORDER BY pos)),
sh AS (SELECT DISTINCT id, split, shingle FROM sh0 WHERE _t IS NOT NULL),
tr AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
te AS (SELECT id, shingle FROM sh WHERE split = 'test'),
tot AS (SELECT id, CAST(count(*) AS BIGINT) AS n_grams FROM te GROUP BY id),
ov AS (SELECT id, CAST(count(*) AS BIGINT) AS n_overlap
       FROM te WHERE shingle IN (SELECT shingle FROM tr) GROUP BY id)
SELECT tot.id, tot.n_grams,
       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap
FROM tot LEFT JOIN ov ON ov.id = tot.id"""


SPARK_QUERIES["contamination_check"] = q_contamination
ORACLES["contamination_check"] = _contamination_oracle()


def q_quality_filter(spark, sf_dir):
    """Curation gate: length / diversity / stopword / language checks with
    machine-readable reject reasons — one projection, zero shuffle."""
    return text.quality_filter(load(spark, sf_dir, "documents"))


def _quality_filter_oracle() -> str:
    score_exprs, chain_sql = _lang_sql_parts()
    return f"""WITH s AS (SELECT doc_id AS id,
  len(string_split(text, ' ')) AS n_tok,
  len(list_distinct(string_split(text, ' '))) AS n_uniq,
  len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_IN}))) AS n_stop,
  list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS sum_len,
  {score_exprs}
  FROM documents),
p AS (SELECT id,
  CAST(n_tok AS BIGINT) AS n_tokens,
  CAST(floor(n_uniq * 1000 / n_tok) AS BIGINT) AS uniq_milli,
  CAST(n_stop AS BIGINT) AS n_stopwords,
  CAST(floor(sum_len * 1000 / n_tok) AS BIGINT) AS avg_milli,
  CASE {chain_sql} ELSE 'und' END AS lang_pred
  FROM s),
r AS (SELECT *, concat_ws(',',
    CASE WHEN n_tokens < {text.QF_MIN_TOKENS} THEN 'TOO_SHORT' END,
    CASE WHEN uniq_milli < {text.QF_MIN_UNIQ_MILLI} THEN 'LOW_DIVERSITY' END,
    CASE WHEN avg_milli > {text.QF_MAX_AVG_TOKLEN_MILLI} THEN 'LONG_TOKENS' END,
    CASE WHEN n_stopwords = 0 THEN 'NO_STOPWORDS' END,
    CASE WHEN lang_pred = 'und' THEN 'LANG_UNKNOWN' END) AS reasons
  FROM p)
SELECT id, n_tokens, uniq_milli, n_stopwords, lang_pred,
  CASE WHEN reasons = '' THEN 'KEEP' ELSE 'REJECT' END AS verdict, reasons
FROM r"""


SPARK_QUERIES["quality_filter"] = q_quality_filter
ORACLES["quality_filter"] = _quality_filter_oracle()


def q_perceptron_quality(spark, sf_dir):
    """Distributed batch-perceptron training (r6): learn a linear quality
    classifier from the rule-based gate's own labels — 16 exact-integer
    epochs (one scan + one d-sum aggregate each, d+1 ints of driver
    state), then the trained model's confusion matrix (zero training
    error on the gate corpus — the separable-indicator design).  The
    DuckDB twin replays the ENTIRE training trajectory in chained
    MATERIALIZED CTEs."""
    from .operators.train import perceptron_train, quality_features
    qf = text.quality_filter(load(spark, sf_dir, "documents"))
    return perceptron_train(quality_features(qf))


def _perceptron_oracle() -> str:
    from .operators.train import PERCEPTRON_EPOCHS
    d = 5

    def dot(ws: list[str]) -> str:
        return " + ".join(f"({ws[j]}) * x{j}" for j in range(d))

    # AS MATERIALIZED is load-bearing: each epoch CTE references its
    # predecessor ~6d times via scalar subqueries, so inlining (DuckDB's
    # default) would re-evaluate the corpus scan exponentially many times
    ctes = [f"q AS MATERIALIZED ({_quality_filter_oracle()})",
            f"""f AS MATERIALIZED (SELECT
  CAST(CASE WHEN verdict = 'KEEP' THEN 1 ELSE -1 END AS BIGINT) AS y,
  CAST(1 AS BIGINT) AS x0,
  CAST(CASE WHEN n_tokens >= {text.QF_MIN_TOKENS} THEN 1 ELSE 0 END AS BIGINT) AS x1,
  CAST(CASE WHEN uniq_milli >= {text.QF_MIN_UNIQ_MILLI} THEN 1 ELSE 0 END AS BIGINT) AS x2,
  CAST(CASE WHEN n_stopwords >= 1 THEN 1 ELSE 0 END AS BIGINT) AS x3,
  CAST(CASE WHEN lang_pred <> 'und' THEN 1 ELSE 0 END AS BIGINT) AS x4
  FROM q)"""]
    prev = ["0"] * d
    for e in range(1, PERCEPTRON_EPOCHS + 1):
        margin = f"y * ({dot(prev)})"
        cols = ", ".join(
            f"CAST(({prev[j]}) + coalesce(sum(CASE WHEN {margin} <= 0 "
            f"THEN y * x{j} END), 0) AS BIGINT) AS w{j}" for j in range(d))
        ctes.append(f"e{e} AS MATERIALIZED (SELECT {cols} FROM f)")
        prev = [f"(SELECT w{j} FROM e{e})" for j in range(d)]
    final_dot = dot(prev)
    return f"""WITH {', '.join(ctes)},
c AS (SELECT
  CAST(coalesce(sum(CASE WHEN y = 1 AND {final_dot} > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
  CAST(coalesce(sum(CASE WHEN y = -1 AND {final_dot} > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
  CAST(coalesce(sum(CASE WHEN y = 1 AND {final_dot} <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn,
  CAST(coalesce(sum(CASE WHEN y = -1 AND {final_dot} <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS tn,
  CAST(count(*) AS BIGINT) AS n
  FROM f)
SELECT {', '.join(f'w{j}' for j in range(d))}, tp, fp, fn, tn, n
FROM e{PERCEPTRON_EPOCHS}, c"""


SPARK_QUERIES["perceptron_quality"] = q_perceptron_quality
ORACLES["perceptron_quality"] = _perceptron_oracle()


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals: top-token concentration and
    duplicate 2-/3-gram occurrence shares, one scan, zero shuffle."""
    return text.repetition_stats(load(spark, sf_dir, "documents"))


_REPETITION_ORACLE = """WITH t AS (
  SELECT doc_id AS id, string_split(text, ' ') AS tk FROM documents),
s AS (SELECT id, len(tk) AS n_tok,
  list_max(list_transform(list_distinct(tk),
                          u -> len(list_filter(tk, x -> x = u)))) AS top_n,
  CASE WHEN len(tk) >= 2 THEN list_transform(generate_series(1, len(tk) - 1),
       i -> tk[i] || ' ' || tk[i + 1]) ELSE []::VARCHAR[] END AS g2,
  CASE WHEN len(tk) >= 3 THEN list_transform(generate_series(1, len(tk) - 2),
       i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]) ELSE []::VARCHAR[] END AS g3
  FROM t)
SELECT id, CAST(n_tok AS BIGINT) AS n_tokens,
  CAST(floor(top_n * 1000 / n_tok) AS BIGINT) AS top_tok_milli,
  CAST(CASE WHEN len(g2) > 0
       THEN floor((len(g2) - len(list_distinct(g2))) * 1000 / len(g2))
       ELSE 0 END AS BIGINT) AS dup2_milli,
  CAST(CASE WHEN len(g3) > 0
       THEN floor((len(g3) - len(list_distinct(g3))) * 1000 / len(g3))
       ELSE 0 END AS BIGINT) AS dup3_milli
FROM s"""

SPARK_QUERIES["repetition_stats"] = q_repetition_stats
ORACLES["repetition_stats"] = _REPETITION_ORACLE


def q_corpus_upsert(spark, sf_dir):
    """Maintenance: MERGE-style latest-wins upsert (r4) — a new crawl
    batch updates a third of the corpus (version 1 beats version 0) and
    inserts brand-new docs; one union + one key-partitioned window, no
    join.  First gated query for the maintenance family."""
    from .operators.merge import upsert_latest
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source")
    base = docs.withColumn("version", F.lit(0).cast("long"))
    upd_mod = (docs.filter(F.col("doc_id") % 3 == 0)
               .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
               .withColumn("version", F.lit(1).cast("long")))
    upd_new = (docs.filter(F.col("doc_id") % 7 == 0)
               .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                       F.concat(F.lit("new "), F.col("text")).alias("text"),
                       "lang", "source")
               .withColumn("version", F.lit(1).cast("long")))
    merged = upsert_latest(base, upd_mod.unionByName(upd_new))
    return merged.select("doc_id", "version",
                         F.length("text").cast("long").alias("text_len"),
                         "lang", "source")


_CORPUS_UPSERT_ORACLE = """WITH base AS (
  SELECT doc_id, text, lang, source, 0 AS version FROM documents),
upd AS (
  SELECT doc_id, 'v2 ' || text AS text, lang, source, 1 AS version
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 1000000, 'new ' || text, lang, source, 1
  FROM documents WHERE doc_id % 7 = 0),
u AS (SELECT *, 1 AS _src FROM upd UNION ALL SELECT *, 0 AS _src FROM base),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY version DESC, _src DESC) AS rn
      FROM u)
SELECT doc_id, CAST(version AS BIGINT) AS version,
       CAST(length(text) AS BIGINT) AS text_len, lang, source
FROM r WHERE rn = 1"""

SPARK_QUERIES["corpus_upsert"] = q_corpus_upsert
ORACLES["corpus_upsert"] = _CORPUS_UPSERT_ORACLE


def q_snapshot_diff(spark, sf_dir):
    """CDC between two deterministic corpus snapshots (r6): docs with
    id%13==3 exist only in the new snapshot (added), id%11==5 only in
    the old (removed), id%7==0 carry revised text (changed); everything
    else is unchanged and must NOT appear.  One union + one
    map-side-combinable groupBy — no full-outer join."""
    from .operators.merge import snapshot_diff
    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 13 != 3).select("doc_id", "text")
    new = (docs.filter(F.col("doc_id") % 11 != 5)
           .select("doc_id",
                   F.when(F.col("doc_id") % 7 == 0,
                          F.concat(F.lit("rev "), F.col("text")))
                   .otherwise(F.col("text")).alias("text")))
    return snapshot_diff(old, new, "doc_id", "text")


_SNAPSHOT_DIFF_ORACLE = """WITH old AS (
  SELECT doc_id AS id, md5(text) AS fp FROM documents WHERE doc_id % 13 <> 3),
new AS (
  SELECT doc_id AS id,
         md5(CASE WHEN doc_id % 7 = 0 THEN 'rev ' || text ELSE text END) AS fp
  FROM documents WHERE doc_id % 11 <> 5),
u AS (SELECT id, fp, 0 AS side FROM old
      UNION ALL SELECT id, fp, 1 FROM new),
g AS (SELECT id, MAX(CASE WHEN side = 0 THEN fp END) AS old_fp,
             MAX(CASE WHEN side = 1 THEN fp END) AS new_fp
      FROM u GROUP BY id)
SELECT id, CASE WHEN old_fp IS NULL THEN 'added'
                WHEN new_fp IS NULL THEN 'removed'
                ELSE 'changed' END AS change, old_fp, new_fp
FROM g WHERE old_fp IS NULL OR new_fp IS NULL OR old_fp <> new_fp"""

SPARK_QUERIES["snapshot_diff"] = q_snapshot_diff
ORACLES["snapshot_diff"] = _SNAPSHOT_DIFF_ORACLE


def q_source_quality(spark, sf_dir):
    """Per-source curation rollup: how many docs each crawl source
    contributes and how many survive the quality gate — the table a data
    team reads before deciding which sources to keep crawling."""
    docs = load(spark, sf_dir, "documents")
    # keep_cols passthrough: verdicts and the source ride ONE projection —
    # one scan, no self-join of documents
    qf = text.quality_filter(docs, keep_cols=("source",))
    return (qf.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("verdict") == "KEEP").cast("long")).alias("n_keep")))


def _source_quality_oracle() -> str:
    return f"""WITH q AS ({_quality_filter_oracle()})
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN q.verdict = 'KEEP' THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM q JOIN documents d ON d.doc_id = q.id
GROUP BY d.source"""


def q_embedding_survivors(spark, sf_dir):
    """Embedding-space dedup end-to-end: bucketed cosine near-dup pairs →
    connected components → one survivor per component (the vector twin of
    dedup_survivors over text)."""
    from .operators.cluster import connected_components, dedup_survivors
    emb = load(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_dup_pairs(emb, min_score=1).select("id1", "id2")
    comps = connected_components(pairs, emb.select("vec_id"))
    return dedup_survivors(emb, comps, id_col="vec_id")


def _embedding_survivors_oracle() -> str:
    return f"""WITH RECURSIVE ep AS ({_embedding_neardup_oracle()}),
sym AS (SELECT id1 AS id, id2 AS nbr FROM ep
        UNION ALL SELECT id2 AS id, id1 AS nbr FROM ep),
verts AS (SELECT vec_id AS id FROM embeddings),
reach(id, comp) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.id, r.comp FROM sym s JOIN reach r ON r.id = s.nbr),
comps AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT id, component, id = component AS is_survivor FROM comps"""


_BOILER = ("the same boilerplate footer navigation copyright text repeated "
           "across the crawl")
_OVERSIZE_CAP = 16


def q_lsh_oversize(spark, sf_dir):
    """Observable dropped mass: a third of the corpus is replaced with one
    boilerplate text, and the query reports every band bucket the
    max_bucket cap would drop — (band_idx, band_key, n_members,
    representative).  This is the report a dedup pipeline logs so capped
    candidate generation is auditable, not silent."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit(_BOILER))
         .otherwise(F.col("text")).alias("text"))
    return dedup.lsh_oversize_buckets(docs, max_bucket=_OVERSIZE_CAP)


def _lsh_oversize_oracle() -> str:
    boiler_tok = _TOK_CTE.replace(
        "string_split(text, ' ')",
        f"string_split(CASE WHEN doc_id % 3 = 0 THEN '{_BOILER}' "
        "ELSE text END, ' ')")
    bands_cte = _PAIRS_CTE.replace(_TOK_CTE, boiler_tok).split(",\npairs AS")[0]
    return f"""WITH {bands_cte}
SELECT band_idx, band_key,
       CAST(count(*) AS BIGINT) AS n_members,
       min(id) AS representative
FROM bands GROUP BY band_idx, band_key
HAVING count(*) > {_OVERSIZE_CAP}"""


SPARK_QUERIES.update({
    "source_quality": q_source_quality,
    "embedding_survivors": q_embedding_survivors,
    "lsh_oversize": q_lsh_oversize,
})
ORACLES.update({
    "source_quality": _source_quality_oracle(),
    "embedding_survivors": _embedding_survivors_oracle(),
    "lsh_oversize": _lsh_oversize_oracle(),
})


# --- deterministic sampling / splits -------------------------------------------

def q_doc_sample(spark, sf_dir):
    """5% deterministic content-hash sample of documents — reproducible on
    any partitioning/cluster (df.sample is partitioning-dependent)."""
    from .operators.sampling import deterministic_sample
    docs = load(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", rate_bp=500).select("doc_id", "lang")


def q_train_split(spark, sf_dir):
    """90/5/5 train/val/test split by hash range: per-(split, lang) counts
    prove disjoint + exhaustive + deterministic assignment."""
    from .operators.sampling import hash_split
    docs = load(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id",
                     {"train": 9000, "val": 500, "test": 500})
    return (out.groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("doc_id").alias("min_id"), F.max("doc_id").alias("max_id")))


def _sampling_oracles():
    from .operators.sampling import hash_bucket_sql
    b = hash_bucket_sql("doc_id")
    sample = f"""SELECT doc_id, lang FROM documents WHERE {b} < 500"""
    split = f"""WITH s AS (
  SELECT *, CASE WHEN {b} < 9000 THEN 'train'
                 WHEN {b} < 9500 THEN 'val' ELSE 'test' END AS split
  FROM documents)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM s GROUP BY split, lang"""
    return sample, split


_DOC_SAMPLE_ORACLE, _TRAIN_SPLIT_ORACLE = _sampling_oracles()

SPARK_QUERIES.update({"doc_sample": q_doc_sample, "train_split": q_train_split})
ORACLES.update({"doc_sample": _DOC_SAMPLE_ORACLE,
                "train_split": _TRAIN_SPLIT_ORACLE})


# --- near-dup clustering (iterative connected components) ---------------------

def q_neardup_clusters(spark, sf_dir):
    """Candidate pairs → Jaccard-verified edges (>= 0.5, exact integer
    compare) → connected components via iterative min-label propagation —
    the step that turns pairwise matches into dedup groups.  The oracle
    recomputes components with a recursive reachability CTE."""
    from .operators.cluster import connected_components
    docs = load(spark, sf_dir, "documents")
    edges = (dedup.jaccard_pairs(docs)
             .filter(F.col("inter") * 2 >= F.col("uni")))
    return connected_components(edges, docs.select("doc_id"))


def q_dedup_survivors(spark, sf_dir):
    """One representative (min doc id) per near-dup component survives."""
    from .operators.cluster import connected_components, dedup_survivors
    docs = load(spark, sf_dir, "documents")
    edges = (dedup.jaccard_pairs(docs)
             .filter(F.col("inter") * 2 >= F.col("uni")))
    comps = connected_components(edges, docs.select("doc_id"))
    return dedup_survivors(docs, comps)


_REACH_SQL = """edge AS (SELECT id1, id2 FROM jp WHERE inter * 2 >= uni),
sym AS (SELECT id1 AS id, id2 AS nbr FROM edge
        UNION ALL SELECT id2 AS id, id1 AS nbr FROM edge),
verts AS (SELECT doc_id AS id FROM documents),
reach(id, comp) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.id, r.comp FROM sym s JOIN reach r ON r.id = s.nbr)"""

_CLUSTERS_ORACLE = f"""WITH RECURSIVE jp AS ({_JACCARD_ORACLE}),
{_REACH_SQL}
SELECT id, min(comp) AS component FROM reach GROUP BY id"""

_SURVIVORS_ORACLE = f"""WITH RECURSIVE jp AS ({_JACCARD_ORACLE}),
{_REACH_SQL},
comps AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT id, component, id = component AS is_survivor FROM comps"""

def q_neardup_clusters_star(spark, sf_dir):
    """Same dedup-group computation through the O(log n) alternating
    large-star/small-star scheme — identical output contract (and oracle)
    as the min-label variant, proving the swap-in really is drop-in."""
    from .operators.cluster import connected_components_star
    docs = load(spark, sf_dir, "documents")
    edges = (dedup.jaccard_pairs(docs)
             .filter(F.col("inter") * 2 >= F.col("uni")))
    return connected_components_star(edges, docs.select("doc_id"))


SPARK_QUERIES.update({
    "neardup_clusters": q_neardup_clusters,
    "dedup_survivors": q_dedup_survivors,
    "neardup_clusters_star": q_neardup_clusters_star,
})
ORACLES.update({
    "neardup_clusters": _CLUSTERS_ORACLE,
    "dedup_survivors": _SURVIVORS_ORACLE,
    "neardup_clusters_star": _CLUSTERS_ORACLE,
})


# --- as-of join --------------------------------------------------------------

def q_asof_join(spark, sf_dir):
    """For each event, the latest order (by derived integer as-of key) in
    the event's group — union-and-window as-of join, one shuffle."""
    from .operators.asof import asof_join
    left = load(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 50).alias("grp"),
        ((F.col("event_id") * 7919) % 60000).alias("k"))
    right = load(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 50).alias("grp"),
        (F.col("o_orderkey") % 60000).alias("k"),
        F.col("o_orderkey").alias("rid"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"))
    return asof_join(left, right, carry_cols=("cents",))


_ASOF_ORACLE = """WITH l AS (
  SELECT event_id, user_id % 50 AS grp, (event_id * 7919) % 60000 AS k FROM events),
r AS (
  SELECT o_custkey % 50 AS grp, o_orderkey % 60000 AS k, o_orderkey AS rid,
         CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM orders),
cand AS (
  SELECT l.event_id, l.grp, l.k, r.rid, r.cents,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.k DESC, r.rid DESC) AS rn
  FROM l JOIN r ON r.grp = l.grp AND r.k <= l.k)
SELECT l.grp, l.event_id, l.k,
       c.rid AS matched_rid, c.cents AS matched_cents
FROM l LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c USING (event_id)"""

SPARK_QUERIES["asof_join"] = q_asof_join
ORACLES["asof_join"] = _ASOF_ORACLE

# fixed resample grid: 2024-01-01T00:00Z, 2-day step, 16 instants — covers
# the generated events window (Jan 2024) at every SF; the first instant
# precedes the earliest event so the no-match NULL row is always exercised
RESAMPLE_T0 = 1_704_067_200_000_000
RESAMPLE_STEP = 172_800_000_000
RESAMPLE_N = 16


def q_resample_locf(spark, sf_dir):
    """Time-grid resampling with gap-fill (r6): every user sampled at the
    fixed 16-instant grid, each instant carrying the latest event value
    at-or-before it (last-observation-carried-forward) — the series
    regularization pass feature pipelines run before windowed models.
    Pure composition: deterministic grid (sequence + ONE explode) ⨝
    events through the union-and-window as-of join (one shuffle)."""
    from .operators.asof import asof_join
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = load(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(F.sequence(
            F.lit(0), F.lit(RESAMPLE_N - 1))).alias("gi"))
    left = grid.select(
        "user_id", "gi",
        (F.lit(RESAMPLE_T0) + F.col("gi") * F.lit(RESAMPLE_STEP))
        .alias("grid_ts_us"))
    right = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("grid_ts_us"),
        F.col("event_id").alias("rid"),
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("mv"))
    out = asof_join(left, right, group_col="user_id", key_col="grid_ts_us",
                    carry_cols=("mv",))
    return out.select("user_id", "gi", "grid_ts_us",
                      "matched_rid", "matched_mv")


_RESAMPLE_ORACLE = f"""WITH u AS (SELECT DISTINCT user_id FROM events),
g AS (SELECT user_id, CAST(i AS INT) AS gi,
             {RESAMPLE_T0} + i * {RESAMPLE_STEP} AS grid_ts_us
      FROM u, (SELECT unnest(range({RESAMPLE_N})) AS i)),
r AS (SELECT user_id, epoch_us(ts) AS k, event_id AS rid,
             CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mv
      FROM events),
cand AS (
  SELECT g.user_id, g.gi, r.rid, r.mv,
         row_number() OVER (PARTITION BY g.user_id, g.gi
                            ORDER BY r.k DESC, r.rid DESC) AS rn
  FROM g JOIN r ON r.user_id = g.user_id AND r.k <= g.grid_ts_us)
SELECT g.user_id, g.gi, g.grid_ts_us, c.rid AS matched_rid,
       c.mv AS matched_mv
FROM g LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON c.user_id = g.user_id AND c.gi = g.gi"""

SPARK_QUERIES["resample_locf"] = q_resample_locf
ORACLES["resample_locf"] = _RESAMPLE_ORACLE


IVF_CENTROID_IDS = list(range(10, 18))


def q_ann_ivf(spark, sf_dir):
    return similarity.ann_ivf_topk(load(spark, sf_dir, "embeddings"),
                                   ANN_QUERY_IDS, ANN_K,
                                   centroid_ids=IVF_CENTROID_IDS)


def _ann_ivf_oracle():
    cids = ", ".join(map(str, IVF_CENTROID_IDS))
    qids = ", ".join(map(str, ANN_QUERY_IDS))
    return f"""WITH e AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(floor(CAST(x AS DOUBLE) * {similarity.QUANT_SCALE} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS v
  FROM embeddings),
cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id IN ({cids})),
scored AS (
  SELECT e.vec_id, c.cid, CAST(list_dot_product(e.v, c.cv) AS BIGINT) AS s
  FROM e, cents c),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM scored) t WHERE rn = 1),
q AS (SELECT a.vec_id AS qid, a.cid AS qc, e.v AS qv
      FROM assign a JOIN e ON e.vec_id = a.vec_id WHERE a.vec_id IN ({qids})),
cand AS (
  SELECT q.qid, a.vec_id, CAST(list_dot_product(q.qv, e.v) AS BIGINT) AS score
  FROM q JOIN assign a ON a.cid = q.qc JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id <> q.qid)
SELECT qid, CAST(rank AS INT) AS rank, vec_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
  FROM cand) r WHERE rank <= {ANN_K}"""


def q_ann_ivf_probe2(spark, sf_dir):
    """IVF with nprobe=2 — the recall dial (VERDICT r01 #10): queries
    search their two nearest centroids' inverted lists."""
    return similarity.ann_ivf_topk(load(spark, sf_dir, "embeddings"),
                                   ANN_QUERY_IDS, ANN_K,
                                   centroid_ids=IVF_CENTROID_IDS, nprobe=2)


def _ann_ivf_probe2_oracle():
    cids = ", ".join(map(str, IVF_CENTROID_IDS))
    qids = ", ".join(map(str, ANN_QUERY_IDS))
    return f"""WITH e AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(floor(CAST(x AS DOUBLE) * {similarity.QUANT_SCALE} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS v
  FROM embeddings),
cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id IN ({cids})),
scored AS (
  SELECT e.vec_id, c.cid, CAST(list_dot_product(e.v, c.cv) AS BIGINT) AS s
  FROM e, cents c),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM scored) t WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS qid, cid AS qc FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM scored WHERE vec_id IN ({qids})) t WHERE rn <= 2),
q AS (SELECT p.qid, p.qc, e.v AS qv FROM qprobe p JOIN e ON e.vec_id = p.qid),
cand AS (
  SELECT q.qid, a.vec_id, CAST(list_dot_product(q.qv, e.v) AS BIGINT) AS score
  FROM q JOIN assign a ON a.cid = q.qc JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id <> q.qid)
SELECT qid, CAST(rank AS INT) AS rank, vec_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
  FROM cand) r WHERE rank <= {ANN_K}"""


def q_cell_rollup(spark, sf_dir):
    """Hierarchical cell rollup: per-cell point counts at resolution r and
    the parent resolution r-1 (parent = integer-halved cell coords) in one
    grouping-sets pass — the hypertable-rollup pattern over the cell index."""
    from .queries import LAT_SQL, LON_SQL
    pts = load(spark, sf_dir, "customer").select(
        F.expr(LAT_SQL).alias("lat"), F.expr(LON_SQL).alias("lon"))
    cells = pts.select(
        F.floor(F.col("lon") / F.lit(0.25)).cast("long").alias("cx"),
        F.floor(F.col("lat") / F.lit(0.25)).cast("long").alias("cy"))
    fine = (cells.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(0).alias("lvl"), "cx", "cy", "n"))
    parent = (cells.groupBy(F.shiftright("cx", 1).alias("cx"),
                            F.shiftright("cy", 1).alias("cy"))
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.lit(1).alias("lvl"), "cx", "cy", "n"))
    return fine.unionByName(parent)


def _cell_rollup_oracle():
    from .queries import LAT_SQL, LON_SQL
    return f"""WITH pts AS (
  SELECT {LAT_SQL} AS lat, {LON_SQL} AS lon FROM customer),
cells AS (
  SELECT CAST(floor(lon / CAST(0.25 AS DOUBLE)) AS BIGINT) AS cx,
         CAST(floor(lat / CAST(0.25 AS DOUBLE)) AS BIGINT) AS cy
  FROM pts)
SELECT 0 AS lvl, cx, cy, CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY cx, cy
UNION ALL
SELECT 1 AS lvl, cx >> 1 AS cx, cy >> 1 AS cy, CAST(count(*) AS BIGINT) AS n
FROM cells GROUP BY (cx >> 1), (cy >> 1)"""


KMEANS_K = 8
KMEANS_ITERS = 2


def q_ann_ivf_kmeans(spark, sf_dir):
    """IVF over LEARNED centroids (VERDICT r3 #3): kmeans_centroids runs
    two quantized-integer Lloyd rounds distributively (deterministic
    md5-smallest-k init, broadcast-argmax assign, per-partition integer
    partial sums, half-away-from-zero integer means), then ann_ivf_topk
    searches the learned inverted lists.  Every arithmetic step is integer-
    exact, so the DuckDB oracle replays the identical rounds as chained
    CTEs — the learned-centroid quality path joins the hash gate."""
    emb = load(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_centroids(emb, KMEANS_K, iters=KMEANS_ITERS)
    return similarity.ann_ivf_topk(emb, ANN_QUERY_IDS, ANN_K, centroids=cents)


def _kmeans_assign_ctes():
    # one Lloyd round: centroids {prev} -> assignment -> integer means,
    # empty clusters keep their previous centroid (LEFT JOIN + COALESCE);
    # the // operands are made non-negative in both CASE branches, so
    # DuckDB truncation == Python floor == the Spark kernel's formula
    def lloyd(prev: str, nxt: str) -> str:
        return f"""s_{nxt} AS (
  SELECT e.vec_id, c.cid, CAST(list_dot_product(e.v, c.cv) AS BIGINT) AS s
  FROM e, {prev} c),
a_{nxt} AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM s_{nxt}) t WHERE rn = 1),
d_{nxt} AS (
  SELECT a.cid, d.i, sum(e.v[d.i]) AS sm, count(*) AS n
  FROM a_{nxt} a JOIN e ON e.vec_id = a.vec_id, dims d
  GROUP BY a.cid, d.i),
m_{nxt} AS (
  SELECT cid, list(CASE WHEN sm >= 0 THEN (2 * sm + n) // (2 * n)
                        ELSE -((2 * -sm + n) // (2 * n)) END ORDER BY i) AS cv
  FROM d_{nxt} GROUP BY cid),
{nxt} AS (
  SELECT p.cid, COALESCE(m.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN m_{nxt} m USING (cid))"""

    rounds = ",\n".join(lloyd(f"c{i}", f"c{i + 1}") for i in range(KMEANS_ITERS))
    # the shared training/assignment prefix (through `assign`) is reused
    # verbatim by the semantic_dedup oracle — ONE definition site, so the
    # two replays of kmeans_centroids cannot drift
    prefix = f"""e AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(floor(CAST(x AS DOUBLE) * {similarity.QUANT_SCALE} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS v
  FROM embeddings),
dims AS (SELECT unnest(generate_series(1, (SELECT max(len(embedding)) FROM embeddings))) AS i),
seeds AS (
  SELECT vec_id, v FROM e
  ORDER BY md5(CAST(vec_id AS VARCHAR) || 'km'), vec_id LIMIT {KMEANS_K}),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv FROM seeds),
{rounds},
sF AS (
  SELECT e.vec_id, c.cid, CAST(list_dot_product(e.v, c.cv) AS BIGINT) AS s
  FROM e, c{KMEANS_ITERS} c),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM sF) t WHERE rn = 1)"""
    return prefix


def _ann_ivf_kmeans_oracle():
    qids = ", ".join(map(str, ANN_QUERY_IDS))
    return f"""WITH {_kmeans_assign_ctes()},
q AS (SELECT a.vec_id AS qid, a.cid AS qc, e.v AS qv
      FROM assign a JOIN e ON e.vec_id = a.vec_id WHERE a.vec_id IN ({qids})),
cand AS (
  SELECT q.qid, a.vec_id, CAST(list_dot_product(q.qv, e.v) AS BIGINT) AS score
  FROM q JOIN assign a ON a.cid = q.qc JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id <> q.qid)
SELECT qid, CAST(rank AS INT) AS rank, vec_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
  FROM cand) r WHERE rank <= {ANN_K}"""


PQ_ITERS = 2


def q_ann_pq(spark, sf_dir):
    """Product-quantization ANN (r4): per-subspace integer Lloyd codebooks
    (pq_train), one encode pass, then asymmetric (ADC) search — per-query
    lookup tables folded into JVM Column arithmetic, so search is a scan
    plus one top-k window.  Training, encoding, and scoring are all
    integer-exact; the oracle replays them as chained CTEs."""
    emb = load(spark, sf_dir, "embeddings")
    cbs = similarity.pq_train(emb, iters=PQ_ITERS)
    return similarity.ann_pq_topk(emb, ANN_QUERY_IDS, ANN_K, codebooks=cbs)


def _ann_pq_oracle():
    from .operators.similarity import PQ_K, PQ_M
    qids = ", ".join(map(str, ANN_QUERY_IDS))
    mean = ("CASE WHEN sm >= 0 THEN (2 * sm + n) // (2 * n) "
            "ELSE -((2 * -sm + n) // (2 * n)) END")

    def lloyd(prev: str, nxt: str) -> str:
        return f"""d_{nxt} AS (
  SELECT e.vec_id, cb.m, cb.code,
    sum((e.v[cb.m * dsub + d.i] - cb.cv[d.i])
        * (e.v[cb.m * dsub + d.i] - cb.cv[d.i])) AS dd
  FROM e, {prev} cb, dims d, dd0 GROUP BY e.vec_id, cb.m, cb.code),
a_{nxt} AS (
  SELECT vec_id, m, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY dd ASC, code ASC) AS rn
    FROM d_{nxt}) t WHERE rn = 1),
s_{nxt} AS (
  SELECT a.m, a.code, d.i, sum(e.v[a.m * dsub + d.i]) AS sm, count(*) AS n
  FROM a_{nxt} a JOIN e USING (vec_id), dims d, dd0
  GROUP BY a.m, a.code, d.i),
m_{nxt} AS (
  SELECT m, code, list({mean} ORDER BY i) AS cv FROM s_{nxt} GROUP BY m, code),
{nxt} AS (
  SELECT p.m, p.code, COALESCE(mm.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN m_{nxt} mm USING (m, code))"""

    rounds = ",\n".join(lloyd(f"cb{i}", f"cb{i + 1}") for i in range(PQ_ITERS))
    final = f"cb{PQ_ITERS}"
    return f"""WITH e AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(floor(CAST(x AS DOUBLE) * {similarity.QUANT_SCALE} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS v
  FROM embeddings),
dd0 AS (SELECT (SELECT max(len(embedding)) FROM embeddings) // {PQ_M} AS dsub),
dims AS (SELECT unnest(generate_series(1, (SELECT dsub FROM dd0))) AS i),
ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
seeds AS (
  SELECT vec_id, v FROM e
  ORDER BY md5(CAST(vec_id AS VARCHAR) || 'pq'), vec_id LIMIT {PQ_K}),
sc AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v FROM seeds),
cb0 AS (
  SELECT ms.m, sc.code,
         list_transform(generate_series(1, dsub), i -> sc.v[ms.m * dsub + i]) AS cv
  FROM ms, sc, dd0),
{rounds},
dF AS (
  SELECT e.vec_id, cb.m, cb.code,
    sum((e.v[cb.m * dsub + d.i] - cb.cv[d.i])
        * (e.v[cb.m * dsub + d.i] - cb.cv[d.i])) AS dd
  FROM e, {final} cb, dims d, dd0 GROUP BY e.vec_id, cb.m, cb.code),
aF AS (
  SELECT vec_id, m, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY dd ASC, code ASC) AS rn
    FROM dF) t WHERE rn = 1),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({qids})),
cand AS (
  SELECT q.qid, a.vec_id,
         CAST(sum(q.qv[a.m * dsub + d.i] * cb.cv[d.i]) AS BIGINT) AS score
  FROM q CROSS JOIN aF a
       JOIN {final} cb ON cb.m = a.m AND cb.code = a.code
       CROSS JOIN dims d CROSS JOIN dd0
  WHERE a.vec_id <> q.qid
  GROUP BY q.qid, a.vec_id)
SELECT qid, CAST(rank AS INT) AS rank, vec_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
  FROM cand) r WHERE rank <= {ANN_K}"""


# --- web-corpus URL tooling (r5) ---------------------------------------------

# deterministic messy-URL synthesis (shared Spark expr + oracle SQL, the
# extract_coords pattern): three host spellings (two canonicalize to the
# same host), default :80 port, tracking params in both first+sole
# position, trailing slash, fragment.  doc_id % 50 paths make genuinely
# colliding canonical URLs across spelling variants (d and d+350 share
# host+path; variant classes %4 in {1,2,3} all normalize to the bare path).
# Variant 1 is a subdomained .CO.UK host (r6): its registrable domain must
# come out as exampleN.co.uk, not co.uk — exercising the embedded
# public-suffix table under the gate.
_URL_SQL = """'HTTP://' || CASE CAST(doc_id % 3 AS INT)
  WHEN 0 THEN 'WWW.Example' || CAST(doc_id % 7 AS STRING) || '.COM:80'
  WHEN 1 THEN 'News.Example' || CAST(doc_id % 7 AS STRING) || '.CO.UK'
  ELSE 'example' || CAST(doc_id % 7 AS STRING) || '.com' END
|| '/Path/' || CAST(doc_id % 50 AS STRING)
|| CASE CAST(doc_id % 4 AS INT)
  WHEN 0 THEN '/?utm_source=feed&x=' || CAST(doc_id % 5 AS STRING)
  WHEN 1 THEN '?utm_campaign=a'
  WHEN 2 THEN '/'
  ELSE '' END
|| CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END"""

# the oracle-side replay of web.url_normalize — identical regex sequence
# (patterns sit in the Java/RE2 common subset; the '&utm_' rule can match
# several times so its DuckDB replace takes the 'g' flag — every other
# pattern is ^/$-anchored or occurs at most once, where replace-first ==
# Spark's replace-all)
_URL_PRE_SQL = """regexp_replace(regexp_replace(
  CASE WHEN lower(regexp_extract(url, '^([^/]*//[^/]*)', 1))
            LIKE 'http://%'
       THEN regexp_replace(lower(regexp_extract(url, '^([^/]*//[^/]*)', 1)),
                           ':80$', '')
       ELSE lower(regexp_extract(url, '^([^/]*//[^/]*)', 1)) END,
  '^http://www\\.', 'http://'), '^https://www\\.', 'https://')"""

_URL_NORM_SQL = f"""{_URL_PRE_SQL} || regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(url, '^[^/]*//[^/]*', ''),
    '#.*$', ''), '&utm_[^&]*', '', 'g'), '\\?utm_[^&]*&', '?'),
  '\\?utm_[^&]*$', ''), '/$', '')"""

_URL_HOST_SQL = "regexp_extract(url_norm, '^[a-z]+://([^/:]+)', 1)"

from .operators.web import url_domain_sql as _url_domain_sql  # noqa: E402

_URL_DOMAIN_SQL = _url_domain_sql("host")


def _url_pages(spark, sf_dir):
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_SQL).alias("url"))


def q_url_canonical(spark, sf_dir):
    """URL canonicalization (r5 webtext): scheme/host lowering, default
    port, www., utm_*, fragment, trailing slash — plus host and
    registrable-domain extraction.  Pure JVM regex projection."""
    from .operators.web import canonicalize_urls
    return canonicalize_urls(_url_pages(spark, sf_dir))


_URL_CANONICAL_ORACLE = f"""WITH u AS (
  SELECT doc_id AS id, {_URL_SQL} AS url FROM documents),
n AS (SELECT id, url, {_URL_NORM_SQL} AS url_norm FROM u),
h AS (SELECT *, {_URL_HOST_SQL} AS host FROM n)
SELECT id, url, url_norm, host,
  {_URL_DOMAIN_SQL} AS domain
FROM h"""


def q_url_dedup(spark, sf_dir):
    """Canonical-URL exact dedup: min-id survivor per normalized URL —
    the crawl-side dedup that runs before any content dedup."""
    from .operators.web import url_dedup
    return url_dedup(_url_pages(spark, sf_dir))


_URL_DEDUP_ORACLE = f"""WITH u AS (
  SELECT doc_id AS id, {_URL_SQL} AS url FROM documents),
n AS (SELECT id, {_URL_NORM_SQL} AS url_norm FROM u)
SELECT id, url_norm,
  id = min(id) OVER (PARTITION BY url_norm) AS is_survivor
FROM n"""


def q_domain_rollup(spark, sf_dir):
    """Per-registrable-domain crawl rollup: doc count + distinct
    canonical URLs (the crawl-frontier / source-quality view)."""
    from .operators.web import domain_rollup
    return domain_rollup(_url_pages(spark, sf_dir))


_DOMAIN_ROLLUP_ORACLE = f"""WITH u AS (
  SELECT doc_id AS id, {_URL_SQL} AS url FROM documents),
n AS (SELECT id, {_URL_NORM_SQL} AS url_norm FROM u),
h AS (SELECT *, {_URL_HOST_SQL} AS host FROM n)
SELECT {_URL_DOMAIN_SQL} AS domain,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT url_norm) AS BIGINT) AS n_urls
FROM h GROUP BY 1"""


# --- host-level link graph (r6) ----------------------------------------------
# deterministic html-ish bodies: every doc carries two hrefs (one clean,
# one messy spelling that must canonicalize — upper-case scheme/host, www.,
# fragment) and every 3rd doc a third with a sole utm_ param; 40 hosts make
# a dense multigraph with live self-links at every SF
_LINKS_BODY_SQL = """'<p><a href="http://site'
|| CAST((doc_id * 31 + 1) % 40 AS STRING) || '.example/a/'
|| CAST(doc_id % 17 AS STRING) || '">l1</a> <a href="HTTPS://WWW.Site'
|| CAST((doc_id * 7 + 3) % 40 AS STRING) || '.Example/b/'
|| CAST(doc_id % 11 AS STRING) || '#f">l2</a>'
|| CASE WHEN doc_id % 3 = 0 THEN ' <a href="http://site'
|| CAST((doc_id * 13 + 5) % 40 AS STRING)
|| '.example/c?utm_source=x">l3</a>' ELSE '' END || '</p>'"""

_SRC_HOST_SQL = "'site' || CAST(doc_id % 40 AS STRING) || '.example'"


def q_link_graph(spark, sf_dir):
    """Host-level link-graph extraction (r6): every href in the corpus →
    canonicalize → (src_host, dst_host, n_links) edge list — the
    crawl-structure pass that feeds PageRank / triangle counting with a
    real graph.  Scan-shaped extraction + one map-side-combined
    aggregation bounded by the distinct edge set."""
    from .operators.web import link_graph
    pages = load(spark, sf_dir, "documents").select(
        F.expr(_SRC_HOST_SQL).alias("src_host"),
        F.expr(_LINKS_BODY_SQL).alias("html"))
    return link_graph(pages)


_LINK_GRAPH_ORACLE = f"""WITH d AS (
  SELECT {_SRC_HOST_SQL} AS src_host, {_LINKS_BODY_SQL} AS html
  FROM documents),
x AS (SELECT src_host,
             unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS url
      FROM d),
n AS (SELECT src_host, {_URL_NORM_SQL} AS url_norm FROM x),
h AS (SELECT src_host, {_URL_HOST_SQL} AS dst_host FROM n)
SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
FROM h GROUP BY 1, 2"""


def q_crawl_frontier(spark, sf_dir):
    """Crawl-frontier builder (r6): the THREE-component webtext
    composition a crawler runs per cycle — href extraction ->
    canonicalization -> referrer rollup, then REP robots verdicts per
    target (longest-match, Allow-beats-Disallow, rule-less hosts default
    allow) — yielding the politeness-filtered, referrer-ranked frontier
    (url_norm, host, allowed, match_len, n_ref_hosts, n_links).
    Synthetic robots bodies exercise the blanket /c block, the
    /a -> /a/1 longest-match re-allow, and absent-robots hosts; the
    oracle derives the rule set closed-form (no body text) and replays
    extraction + matching independently."""
    from .operators.web import (extract_links, parse_robots, robots_filter,
                                url_normalize)
    pages = load(spark, sf_dir, "documents").select(
        F.expr(_SRC_HOST_SQL).alias("src_host"),
        F.expr(_LINKS_BODY_SQL).alias("html"))
    links = extract_links(pages)
    canon = links.select(
        "src_host", url_normalize(F.col("url")).alias("url_norm"),
        F.col("dst_host").alias("host"))
    refs = (canon.groupBy("url_norm", "host")
            .agg(F.countDistinct("src_host").cast("long").alias("n_ref_hosts"),
                 F.count(F.lit(1)).cast("long").alias("n_links")))
    hosts = refs.select("host").distinct()
    k = F.regexp_extract("host", "([0-9]+)", 1).cast("int")
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /c\n"),
        F.when(k % 5 == 0, F.lit("Disallow: /a\nAllow: /a/1\n"))
        .otherwise(F.lit("")))
    robots = hosts.where(k % 7 != 0).select("host", body.alias("body"))
    verdict = robots_filter(
        refs.select(F.col("url_norm").alias("id"), "url_norm", "host"),
        parse_robots(robots))
    return (verdict.select(F.col("id").alias("url_norm"), "host",
                           "allowed", "match_len")
            .join(refs, ["url_norm", "host"])
            .select("url_norm", "host", "allowed",
                    F.col("match_len").cast("long").alias("match_len"),
                    "n_ref_hosts", "n_links"))


_CRAWL_FRONTIER_ORACLE = f"""WITH d AS (
  SELECT {_SRC_HOST_SQL} AS src_host, {_LINKS_BODY_SQL} AS html
  FROM documents),
x AS (SELECT src_host,
             unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS url
      FROM d),
n AS (SELECT src_host, {_URL_NORM_SQL} AS url_norm FROM x),
h AS (SELECT src_host, url_norm, {_URL_HOST_SQL} AS host FROM n),
refs AS (SELECT url_norm, host,
         CAST(count(DISTINCT src_host) AS BIGINT) AS n_ref_hosts,
         CAST(count(*) AS BIGINT) AS n_links
         FROM h GROUP BY 1, 2),
hk AS (SELECT DISTINCT host,
       CAST(regexp_extract(host, '([0-9]+)', 1) AS INT) AS k FROM refs),
rules AS (
  SELECT host, 0 AS is_allow, '/c' AS prefix FROM hk WHERE k % 7 <> 0
  UNION ALL SELECT host, 0, '/a' FROM hk WHERE k % 7 <> 0 AND k % 5 = 0
  UNION ALL SELECT host, 1, '/a/1' FROM hk WHERE k % 7 <> 0 AND k % 5 = 0),
p AS (SELECT url_norm, host,
      regexp_replace(url_norm, '^[a-z]+://[^/]*', '') AS path FROM refs),
m AS (SELECT p.url_norm, p.host, r.is_allow, r.prefix
      FROM p LEFT JOIN rules r
        ON p.host = r.host AND starts_with(p.path, r.prefix)),
b AS (SELECT *, row_number() OVER (
        PARTITION BY url_norm, host
        ORDER BY coalesce(length(prefix), -1) DESC,
                 coalesce(is_allow, 1) DESC) AS rn FROM m)
SELECT b.url_norm, b.host, coalesce(b.is_allow, 1) = 1 AS allowed,
  CAST(coalesce(length(b.prefix), -1) AS BIGINT) AS match_len,
  refs.n_ref_hosts, refs.n_links
FROM b JOIN refs ON refs.url_norm = b.url_norm AND refs.host = b.host
WHERE b.rn = 1"""


def q_host_components(spark, sf_dir):
    """Weakly-connected components of the REAL crawl link graph (r6):
    href extraction -> canonicalized host edges -> iterative min-label
    propagation — the mirror-site / link-farm grouping pass.  String
    vertex ids exercise CC's min-label over lexicographic order; the
    oracle recomputes components with the recursive reachability CTE
    over the same extracted edge list."""
    from .operators.cluster import connected_components
    from .operators.web import link_graph
    pages = load(spark, sf_dir, "documents").select(
        F.expr(_SRC_HOST_SQL).alias("src_host"),
        F.expr(_LINKS_BODY_SQL).alias("html"))
    g = link_graph(pages)
    edges = g.select(F.col("src_host").alias("id1"),
                     F.col("dst_host").alias("id2"))
    return connected_components(edges)


_HOST_COMPONENTS_ORACLE = f"""WITH RECURSIVE lg AS ({_LINK_GRAPH_ORACLE}),
edge AS (SELECT src_host AS id1, dst_host AS id2 FROM lg),
sym AS (SELECT id1 AS id, id2 AS nbr FROM edge
        UNION ALL SELECT id2 AS id, id1 AS nbr FROM edge),
verts AS (SELECT DISTINCT id1 AS id FROM edge
          UNION SELECT DISTINCT id2 AS id FROM edge),
reach(id, comp) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.id, r.comp FROM sym s JOIN reach r ON r.id = s.nbr)
SELECT id, min(comp) AS component FROM reach GROUP BY id"""


def q_bigram_lm(spark, sf_dir):
    """Count-based bigram LM quality scoring (r5): corpus-trained bigram /
    context counts, each doc scored as the exact integer micro-sum of its
    per-occurrence conditional probabilities (the KenLM-filter proxy,
    engine-portable because no log is involved)."""
    return text.bigram_lm_scores(load(spark, sf_dir, "documents"))


_BIGRAM_LM_ORACLE = """WITH t AS (
  SELECT doc_id AS id, string_split(text, ' ') AS tk FROM documents),
g AS (SELECT id, unnest(CASE WHEN len(tk) >= 2
        THEN list_transform(generate_series(1, len(tk) - 1),
                            i -> tk[i] || ' ' || tk[i + 1])
        ELSE []::VARCHAR[] END) AS bigram FROM t),
c2 AS (SELECT bigram, count(*) AS c2 FROM g GROUP BY bigram),
c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1
       FROM g GROUP BY 1),
s AS (SELECT g.id, (c2.c2 * 1000000) // c1.c1 AS p_micro
      FROM g JOIN c2 USING (bigram)
      JOIN c1 ON c1.w1 = split_part(g.bigram, ' ', 1)),
d AS (SELECT id, count(*) AS n_bigrams, sum(p_micro) AS lm_micro_sum
      FROM s GROUP BY id)
SELECT t.id,
  CAST(coalesce(d.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(d.lm_micro_sum, 0) AS BIGINT) AS lm_micro_sum
FROM (SELECT DISTINCT id FROM t) t LEFT JOIN d USING (id)"""


# --- Dice-score collocation mining (r6) --------------------------------------

def q_collocations(spark, sf_dir):
    """Top-k collocation detection (r6): Dice-scored bigram phrase mining
    over the whitespace-token corpus — one tokenize pass, vocab-sized
    context/continuation re-aggregations, two vocab joins, global
    TakeOrdered.  Integer Dice surrogate stays in int64 at any corpus
    size (the PMI alternative overflows)."""
    from .operators.text import collocations
    return collocations(load(spark, sf_dir, "documents"))


def _colloc_oracle() -> str:
    from .operators.text import COLLOC_TOP_K, MIN_COLLOC
    return f"""WITH t AS (
  SELECT string_split(text, ' ') AS tk FROM documents),
g AS (SELECT unnest(CASE WHEN len(tk) >= 2
        THEN list_transform(generate_series(1, len(tk) - 1),
                            i -> tk[i] || ' ' || tk[i + 1])
        ELSE []::VARCHAR[] END) AS bigram FROM t),
c2 AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c2 FROM g GROUP BY 1),
cl AS (SELECT split_part(bigram, ' ', 1) AS w, CAST(sum(c2) AS BIGINT) AS c
       FROM c2 GROUP BY 1),
cr AS (SELECT split_part(bigram, ' ', 2) AS w, CAST(sum(c2) AS BIGINT) AS c
       FROM c2 GROUP BY 1),
s AS (SELECT split_part(bigram, ' ', 1) AS w1,
             split_part(bigram, ' ', 2) AS w2,
             c2.c2, cl.c AS c_left, cr.c AS c_right,
             (2 * c2.c2 * 1000000) // (cl.c + cr.c) AS dice_micro
      FROM c2
      JOIN cl ON cl.w = split_part(bigram, ' ', 1)
      JOIN cr ON cr.w = split_part(bigram, ' ', 2)
      WHERE c2.c2 >= {MIN_COLLOC})
SELECT * FROM s ORDER BY dice_micro DESC, w1, w2 LIMIT {COLLOC_TOP_K}"""


# --- distributed BPE vocabulary training (r6) --------------------------------

def q_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (r6): lowercase ascii-run words
    -> one corpus scan for the Zipf-bounded word-frequency table -> six
    merge rounds, each ONE vocabulary-sized pair aggregate + a pure
    Column greedy left-fold rewrite, ONE (a, b) row of driver state per
    round.  Returns the ranked merge table (merge_rank, a, b, n) — the
    artifact a BPE trainer actually ships.  The oracle replays the whole
    trajectory as chained CTEs: DuckDB list_reduce runs the identical
    greedy automaton as Spark's aggregate HOF."""
    from .operators.bpe import bpe_train
    return bpe_train(load(spark, sf_dir, "documents"))


def _bpe_ctes(n: int, final: bool) -> list[str]:
    """The shared training-trajectory CTE chain (word column carried
    through every round so the apply oracle can join back); when
    ``final`` the last round's rewritten word table w{n} is emitted
    too."""
    ctes = ["""wt AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents)""",
            """w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS c,
         regexp_extract_all(word, '.') AS toks
  FROM wt GROUP BY word)"""]
    for r in range(1, n + 1):
        ctes.append(
            f"p{r} AS (SELECT c, toks, unnest(range(1, len(toks))) AS i "
            f"FROM w{r - 1})")
        ctes.append(
            f"a{r} AS (SELECT toks[i] AS a, toks[i + 1] AS b, "
            f"CAST(sum(c) AS BIGINT) AS n FROM p{r} GROUP BY 1, 2)")
        ctes.append(
            f"b{r} AS (SELECT a, b, n FROM a{r} "
            f"ORDER BY n DESC, a, b LIMIT 1)")
        if r < n or final:  # greedy left-fold rewrite
            ctes.append(
                f"w{r} AS (SELECT word, c, list_reduce("
                "list_transform(toks, x -> [x]), "
                f"(acc, x) -> CASE WHEN acc[-1] = b{r}.a AND x[1] = b{r}.b "
                f"THEN acc[:-2] || [b{r}.a || b{r}.b] "
                f"ELSE acc || x END) AS toks FROM w{r - 1}, b{r})")
    return ctes


def _bpe_oracle(n_merges: int | None = None) -> str:
    from .operators.bpe import BPE_MERGES
    n = int(n_merges or BPE_MERGES)
    union = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_rank, a, b, n FROM b{r}"
        for r in range(1, n + 1))
    return "WITH " + ",\n".join(_bpe_ctes(n, False)) + "\n" + union


def q_bpe_encode(spark, sf_dir):
    """BPE train-then-encode (r6): the learned n-merge vocabulary applied
    back to the corpus — per-document word and piece counts, the
    token-budget view under the pipeline's OWN tokenizer.  The oracle
    replays the full training trajectory AND the apply join."""
    from .operators.bpe import bpe_piece_counts
    return bpe_piece_counts(load(spark, sf_dir, "documents"))


def _bpe_encode_oracle(n_merges: int | None = None) -> str:
    from .operators.bpe import BPE_MERGES
    n = int(n_merges or BPE_MERGES)
    tail = f"""pieces AS (SELECT word, CAST(len(toks) AS BIGINT) AS np
  FROM w{n}),
occ AS (SELECT doc_id AS id,
  unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents),
pd AS (SELECT id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(np) AS BIGINT) AS n_pieces
       FROM occ JOIN pieces USING (word) GROUP BY id)
SELECT d.id, coalesce(pd.n_words, 0) AS n_words,
       coalesce(pd.n_pieces, 0) AS n_pieces
FROM (SELECT DISTINCT doc_id AS id FROM documents) d
LEFT JOIN pd USING (id)"""
    return "WITH " + ",\n".join(_bpe_ctes(n, True)) + ",\n" + tail


def q_robots_filter(spark, sf_dir):
    """Robots-rules crawl filter (r6): synthetic robots.txt bodies per
    host -> parse_robots line rules -> REP longest-match verdict per URL
    (Allow beats Disallow at equal length; rule-less hosts default
    allow).  The bodies exercise comment stripping, the empty-Disallow
    drop, a blanket 'Disallow: /', and a longer Allow overriding a
    shorter Disallow; digit-6 hosts get NO robots.txt at all.  The
    oracle derives the rule set closed-form (no body text, no parse) —
    an independent path to the same verdicts."""
    from .operators.web import canonicalize_urls, parse_robots, robots_filter
    urls = canonicalize_urls(_url_pages(spark, sf_dir))
    hosts = urls.select("host").distinct()
    k = F.regexp_extract("host", "([0-9])", 1).cast("int")
    body = F.concat(
        F.lit("User-agent: *\n# synthetic corpus rules\n"
              "Disallow: /Path/1\nAllow: /Path/12  # re-allow\n"),
        F.when(k % 3 == 0, F.lit("Disallow: /Path/2\n")).otherwise(F.lit("")),
        F.when(F.col("host").endswith(".co.uk"),
               F.lit("Disallow:\n")).otherwise(F.lit("")),
        F.when(k == 3, F.lit("Disallow: /\n")).otherwise(F.lit("")))
    robots = hosts.where(k != 6).select("host", body.alias("body"))
    return robots_filter(urls, parse_robots(robots))


_ROBOTS_ORACLE = f"""WITH u AS (
  SELECT doc_id AS id, {_URL_SQL} AS url FROM documents),
n AS (SELECT id, {_URL_NORM_SQL} AS url_norm FROM u),
h AS (SELECT id, {_URL_HOST_SQL} AS host,
  regexp_replace(url_norm, '^[a-z]+://[^/]*', '') AS path FROM n),
hosts AS (SELECT DISTINCT host FROM h),
hk AS (SELECT host, CAST(regexp_extract(host, '([0-9])', 1) AS INT) AS k
       FROM hosts),
rules AS (
  SELECT host, 0 AS is_allow, '/Path/1' AS prefix FROM hk WHERE k <> 6
  UNION ALL SELECT host, 1, '/Path/12' FROM hk WHERE k <> 6
  UNION ALL SELECT host, 0, '/Path/2' FROM hk WHERE k <> 6 AND k % 3 = 0
  UNION ALL SELECT host, 0, '/' FROM hk WHERE k = 3),
m AS (SELECT h.id, h.host, h.path, r.is_allow, r.prefix
      FROM h LEFT JOIN rules r
        ON h.host = r.host AND starts_with(h.path, r.prefix)),
b AS (SELECT *, row_number() OVER (
        PARTITION BY id
        ORDER BY coalesce(length(prefix), -1) DESC,
                 coalesce(is_allow, 1) DESC) AS rn FROM m)
SELECT id, host, path, coalesce(is_allow, 1) = 1 AS allowed,
  CAST(coalesce(length(prefix), -1) AS BIGINT) AS match_len,
  coalesce(prefix, '') AS match_prefix
FROM b WHERE rn = 1"""


# --- sharded positional inverted index (r6) ----------------------------------

_INV_SHARDS = 4


def q_inverted_index(spark, sf_dir):
    """Positional inverted index over the documents table (r6): postings
    serialized in doc_id order, positions ascending, doc_id-sharded so no
    stop-word group concentrates — two map-side-combinable aggs, all JVM."""
    from .operators.text import inverted_index
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return inverted_index(docs, n_shards=_INV_SHARDS)


_INVERTED_INDEX_ORACLE = f"""WITH t AS (
  SELECT doc_id AS id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents),
pd AS (SELECT token, id,
         string_agg(CAST(pos AS VARCHAR), ' ' ORDER BY pos) AS plist
       FROM t GROUP BY token, id)
SELECT token, CAST(id % {_INV_SHARDS} AS INT) AS shard,
  CAST(count(*) AS BIGINT) AS df,
  string_agg(CAST(id AS VARCHAR) || ':' || plist, ';' ORDER BY id)
    AS postings
FROM pd GROUP BY token, CAST(id % {_INV_SHARDS} AS INT)"""


# --- PII redaction (r6) ------------------------------------------------------
# Synthetic PII appended to real text; two-thirds of docs carry an email +
# phone, every third adds an IPv4, so every rule and the zero case are live.
_PII_TEXT_SQL = ("text || ' contact bob' || CAST(doc_id % 50 AS STRING)"
                 " || '@mail' || CAST(doc_id % 7 AS STRING) || '.com'"
                 " || CASE WHEN doc_id % 2 = 0 THEN ' tel +44'"
                 " || CAST(1000000 + doc_id AS STRING) ELSE '' END"
                 " || CASE WHEN doc_id % 3 = 0 THEN ' ip 10.0.'"
                 " || CAST(doc_id % 256 AS STRING) || '.'"
                 " || CAST(doc_id % 100 AS STRING) ELSE '' END")


def q_pii_redact(spark, sf_dir):
    """PII scrub over the documents corpus (r6): emails / international
    phones / IPv4 literals replaced by type tokens with pre-redaction
    audit counts — pure JVM regex projection."""
    from .operators.text import redact_pii
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_TEXT_SQL).alias("text_p"))
    return redact_pii(docs, "doc_id", "text_p")


def _pii_oracle() -> str:
    from .operators.text import PII_RULES
    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_RULES)
    red = "t"
    for _, pat, token in PII_RULES:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""WITH d AS (
  SELECT doc_id AS id, {_PII_TEXT_SQL} AS t FROM documents)
SELECT id, {red} AS text_redacted,
  {counts}
FROM d"""


# --- BM25-surrogate top-k retrieval (r6) -------------------------------------

_BM25_TERMS = ["spark", "merge", "window"]
_BM25_K = 10


def q_bm25_topk(spark, sf_dir):
    """Top-k documents for a bag-of-terms query under the exact rational
    BM25 surrogate (integer idf-ratio x tf-normalization, no ln) — the
    search/contamination-retrieval primitive over the documents table."""
    from .operators.text import bm25_topk
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(docs, _BM25_TERMS, k=_BM25_K)


_BM25_ORACLE = f"""WITH base AS (
  SELECT doc_id AS id, string_split(text, ' ') AS tk FROM documents),
st AS (SELECT CAST(count(*) AS BIGINT) AS N,
              CAST(sum(len(tk)) AS BIGINT) AS T FROM base),
occ AS (SELECT id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS token
        FROM base),
tft AS (SELECT id, token, CAST(count(*) AS BIGINT) AS tf,
               CAST(min(dl) AS BIGINT) AS dl
        FROM occ WHERE token IN ({", ".join(repr(t) for t in _BM25_TERMS)})
        GROUP BY id, token),
dfc AS (SELECT token, CAST(count(*) AS BIGINT) AS df
        FROM tft GROUP BY token),
j AS (SELECT tft.id,
        (((2*N - 2*df + 1) * 1000) // (2*df + 1))
        * ((44 * T * tf * 1000) // (20 * T * tf + 6 * T + 18 * dl * N)) AS c
      FROM tft, dfc, st WHERE tft.token = dfc.token)
SELECT id, CAST(sum(c) AS BIGINT) AS score
FROM j GROUP BY id ORDER BY score DESC, id ASC LIMIT {_BM25_K}"""


# --- corpus-wide paragraph dedup (r6) ----------------------------------------
# Synthetic paragraph-structured docs: a per-site banner + two real text
# chunks + a per-site footer.  Banner/footer repeat across every doc of the
# same site (doc_id % 7) — the realistic boilerplate case — while the
# content chunks are (near-certainly) unique; keep-first semantics strip
# the boilerplate from all but each site's first document.  The expression
# is valid in BOTH engines (chr/substr/CAST STRING shared subset).
_PARA_SQL = """'BANNER domain-' || CAST(doc_id % 7 AS STRING) || chr(10)
 || substr(text, 1, 40) || chr(10) || substr(text, 41, 40) || chr(10)
 || 'FOOTER (c) site-' || CAST(doc_id % 7 AS STRING)"""


def q_paragraph_dedup(spark, sf_dir):
    """CCNet/Dolma-style exact paragraph dedup (r6): corpus-first
    occurrence survives, documents reassembled in paragraph order —
    md5-content-keyed window + one regroup, all JVM."""
    from .operators.dedup import paragraph_dedup
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PARA_SQL).alias("text_p"))
    return paragraph_dedup(docs, "doc_id", "text_p")


_PARAGRAPH_DEDUP_ORACLE = f"""WITH d AS (
  SELECT doc_id AS id, {_PARA_SQL} AS text_p FROM documents),
p AS (SELECT id,
  generate_subscripts(string_split(text_p, chr(10)), 1) AS par_idx,
  unnest(string_split(text_p, chr(10))) AS par FROM d),
k AS (SELECT *, row_number() OVER (
        PARTITION BY md5(par) ORDER BY id, par_idx) = 1 AS keep FROM p)
SELECT id, CAST(count(*) AS BIGINT) AS n_pars,
  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
  coalesce(string_agg(CASE WHEN keep THEN par END, chr(10)
                      ORDER BY par_idx), '') AS text_dedup
FROM k GROUP BY id"""


SPARK_QUERIES.update({"url_canonical": q_url_canonical,
                      "url_dedup": q_url_dedup,
                      "domain_rollup": q_domain_rollup,
                      "robots_filter": q_robots_filter,
                      "paragraph_dedup": q_paragraph_dedup,
                      "inverted_index": q_inverted_index,
                      "bm25_topk": q_bm25_topk,
                      "pii_redact": q_pii_redact,
                      "bigram_lm": q_bigram_lm,
                      "link_graph": q_link_graph,
                      "host_components": q_host_components,
                      "embedding_centroids": q_embedding_centroids,
                      "crawl_frontier": q_crawl_frontier,
                      "bpe_merges": q_bpe_merges,
                      "collocations": q_collocations,
                      "bpe_encode": q_bpe_encode})
ORACLES.update({"url_canonical": _URL_CANONICAL_ORACLE,
                "url_dedup": _URL_DEDUP_ORACLE,
                "domain_rollup": _DOMAIN_ROLLUP_ORACLE,
                "robots_filter": _ROBOTS_ORACLE,
                "paragraph_dedup": _PARAGRAPH_DEDUP_ORACLE,
                "inverted_index": _INVERTED_INDEX_ORACLE,
                "bm25_topk": _BM25_ORACLE,
                "pii_redact": _pii_oracle(),
                "bigram_lm": _BIGRAM_LM_ORACLE,
                "link_graph": _LINK_GRAPH_ORACLE,
                "host_components": _HOST_COMPONENTS_ORACLE,
                "embedding_centroids": _EMB_CENTROIDS_ORACLE,
                "crawl_frontier": _CRAWL_FRONTIER_ORACLE,
                "bpe_merges": _bpe_oracle(),
                "collocations": _colloc_oracle(),
                "bpe_encode": _bpe_encode_oracle()})


# --- stratified (class-balanced) sampling (r5) -------------------------------

STRAT_K = 10


def q_stratified_sample(spark, sf_dir):
    """Exactly k docs per source by md5 order (r5): the class-balanced
    subset for imbalanced sources; deterministic on any partitioning."""
    from .operators.sampling import stratified_sample
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(docs, "source", "doc_id", STRAT_K)


_STRATIFIED_ORACLE = f"""WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS STRING) || ''), doc_id) AS rn
  FROM documents)
SELECT doc_id, source FROM r WHERE rn <= {STRAT_K}"""


WSS_K = 64
_WSS_W_SQL = "n_chars % 97 + 1"


def q_weighted_sample(spark, sf_dir):
    """Weighted systematic sample (r6): 64 deterministic picks over the
    cumulative-weight line in md5 order — multiplicity-correct weighted
    sampling with NO libm keys and NO global window (256 order-prefix
    buckets + bounded driver offsets).  The oracle stabs the same grid
    positions against a plain global-window cumulative sum."""
    from .operators.sampling import weighted_systematic_sample
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_WSS_W_SQL).alias("wt"))
    return weighted_systematic_sample(docs, "doc_id", "wt", WSS_K)


_WSS_ORACLE = f"""WITH d AS (
  SELECT doc_id AS id, CAST({_WSS_W_SQL} AS BIGINT) AS w FROM documents),
h AS (SELECT id, w, md5(CAST(id AS STRING) || '') AS hx FROM d WHERE w > 0),
o AS (SELECT *, sum(w) OVER (ORDER BY hx, id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS s FROM h),
t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM h),
p AS (SELECT CAST(i AS INT) AS pick_idx, (i * tw) // {WSS_K} AS pos
      FROM (SELECT unnest(range({WSS_K})) AS i), t)
SELECT p.pick_idx, o.id, o.w
FROM p JOIN o ON p.pos >= o.s AND p.pos < o.s + o.w"""


SHARD_SIZE = 20_000  # weight units (tokens) per training shard


def q_shard_plan(spark, sf_dir):
    """Token-budget shard packing (r6): documents on the md5-ordered
    cumulative-token line, cut every SHARD_SIZE units — the per-shard
    manifest (n_docs, token sum, min/max doc weight) a training-shard
    writer consumes.  Same no-global-window machinery as
    weighted_sample; the oracle replays with a plain global window."""
    from .operators.sampling import shard_plan
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_WSS_W_SQL).alias("wt"))
    return shard_plan(docs, "doc_id", "wt", SHARD_SIZE)


_SHARD_PLAN_ORACLE = f"""WITH d AS (
  SELECT doc_id AS id, CAST({_WSS_W_SQL} AS BIGINT) AS w FROM documents),
h AS (SELECT id, w, md5(CAST(id AS STRING) || '') AS hx FROM d WHERE w > 0),
o AS (SELECT *, sum(w) OVER (ORDER BY hx, id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS s FROM h)
SELECT CAST(s // {SHARD_SIZE} AS BIGINT) AS shard,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(w) AS BIGINT) AS w_sum,
  CAST(min(w) AS BIGINT) AS w_min,
  CAST(max(w) AS BIGINT) AS w_max
FROM o GROUP BY 1"""


SPARK_QUERIES.update({"stratified_sample": q_stratified_sample,
                      "weighted_sample": q_weighted_sample,
                      "shard_plan": q_shard_plan})
ORACLES.update({"stratified_sample": _STRATIFIED_ORACLE,
                "weighted_sample": _WSS_ORACLE,
                "shard_plan": _SHARD_PLAN_ORACLE})


# --- mergeable sketches: count-min + Bloom (r5) ------------------------------

# deterministic probe set: corpus-frequent tokens, mid-frequency tokens,
# and two absent ones (the Bloom no-false-negative / CMS overestimate
# properties both get exercised)
SKETCH_PROBES = ["the", "a", "value", "row", "merge", "table", "scan",
                 "zzzq_absent1", "zzzq_absent2"]


def q_cms_counts(spark, sf_dir):
    """Count-min sketch (r5): depth x width integer matrix built in one
    token pass (bounded by geometry, not corpus), probed for a fixed token
    set; exact counts joined alongside so the overestimate-only guarantee
    is visible in the gated rows."""
    from .operators import sketch
    docs = load(spark, sf_dir, "documents")
    probes = spark.createDataFrame([(t,) for t in SKETCH_PROBES], ["tok"])
    est = sketch.cms_lookup(sketch.cms_build(docs), probes)
    # a deliberately narrow twin (width 8 << the ~35-word synthetic
    # vocabulary): collisions are certain in every row, so the gated rows
    # SHOW the overestimate-only guarantee (est_narrow >= exact) instead
    # of only claiming it
    narrow = (sketch.cms_lookup(sketch.cms_build(docs, width=8), probes,
                                width=8)
              .withColumnRenamed("est", "est_narrow"))
    exact = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
             .filter(F.col("tok").isin(SKETCH_PROBES))
             .groupBy("tok").agg(F.count(F.lit(1)).alias("_c")))
    return (est.join(narrow, "tok").join(exact, "tok", "left")
            .select("tok", "est", "est_narrow",
                    F.coalesce("_c", F.lit(0)).cast("long").alias("exact_cnt")))


def q_bloom_filter(spark, sf_dir):
    """Bloom membership (r5): k salted md5 bits per vocabulary token,
    <= n_bits rows however large the corpus; probes answer is_member with
    no false negatives."""
    from .operators import sketch
    docs = load(spark, sf_dir, "documents")
    bits = sketch.bloom_build(docs)
    probes = spark.createDataFrame([(t,) for t in SKETCH_PROBES], ["tok"])
    return sketch.bloom_lookup(bits, probes)


def _cell_sql(expr: str, salt: str, mod: int) -> str:
    return (f"CAST(('0x' || substr(md5({expr} || '{salt}'), 1, 15)) "
            f"AS BIGINT) % {mod}")


def _cms_width_ctes(width: int, suffix: str) -> str:
    from .operators.sketch import CMS_DEPTH
    cells = " UNION ALL ".join(
        f"SELECT {r} AS row, {_cell_sql('tok', f'cms{r}', width)} AS bucket FROM tokq"
        for r in range(CMS_DEPTH))
    pc = " UNION ALL ".join(
        f"SELECT tok, {r} AS row, {_cell_sql('tok', f'cms{r}', width)} AS bucket FROM probes"
        for r in range(CMS_DEPTH))
    return f"""cells{suffix} AS ({cells}),
cms{suffix} AS (SELECT row, bucket, count(*) AS cnt FROM cells{suffix} GROUP BY 1, 2),
pc{suffix} AS ({pc}),
est{suffix} AS (SELECT p.tok, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
        FROM pc{suffix} p LEFT JOIN cms{suffix} c
          ON c.row = p.row AND c.bucket = p.bucket
        GROUP BY p.tok)"""


def _cms_oracle():
    from .operators.sketch import CMS_WIDTH
    probes_vals = ", ".join(f"('{t}')" for t in SKETCH_PROBES)
    return f"""WITH tokq AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
probes(tok) AS (VALUES {probes_vals}),
{_cms_width_ctes(CMS_WIDTH, '')},
{_cms_width_ctes(8, '_n')},
exact AS (SELECT tok, count(*) AS c FROM tokq GROUP BY tok)
SELECT est.tok, est.est, est_n.est AS est_narrow,
  CAST(coalesce(exact.c, 0) AS BIGINT) AS exact_cnt
FROM est JOIN est_n ON est_n.tok = est.tok
LEFT JOIN exact ON exact.tok = est.tok"""


def _bloom_oracle():
    from .operators.sketch import BLOOM_BITS, BLOOM_HASHES
    probes_vals = ", ".join(f"('{t}')" for t in SKETCH_PROBES)
    bits = " UNION ALL ".join(
        f"SELECT {_cell_sql('tok', f'bloom{r}', BLOOM_BITS)} AS bit FROM tokq"
        for r in range(BLOOM_HASHES))
    pb = " UNION ALL ".join(
        f"SELECT tok, {_cell_sql('tok', f'bloom{r}', BLOOM_BITS)} AS bit FROM probes"
        for r in range(BLOOM_HASHES))
    return f"""WITH tokq AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
bits AS (SELECT DISTINCT bit FROM ({bits})),
probes(tok) AS (VALUES {probes_vals}),
pb AS ({pb})
SELECT pb.tok,
  CAST(min(CASE WHEN bits.bit IS NULL THEN 0 ELSE 1 END) = 1 AS BOOLEAN)
    AS is_member
FROM pb LEFT JOIN bits ON bits.bit = pb.bit
GROUP BY pb.tok"""


def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-count estimate over lineitem order keys (r5): the
    hash-gateable approximate-distinct — unlike HLL, hashing, top-k, and
    the integer estimate are all engine-replayable; accuracy vs the exact
    count is visible in the gated row (exact_distinct alongside)."""
    from .operators.sketch import kmv_distinct
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    est = kmv_distinct(li, "l_orderkey")
    exact = li.agg(F.countDistinct("l_orderkey").cast("long")
                   .alias("exact_distinct"))
    return est.crossJoin(exact)


def _kmv_oracle():
    from .operators.sketch import KMV_HASH_SPACE, KMV_K
    return f"""WITH h AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS STRING)), 1, 13))
                       AS BIGINT) AS h
  FROM lineitem),
mins AS (SELECT h FROM h ORDER BY h LIMIT {KMV_K}),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_mins,
               CAST(max(h) AS BIGINT) AS kth_hash FROM mins),
ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
       FROM lineitem)
SELECT n_mins, kth_hash,
  CAST(CASE WHEN n_mins < {KMV_K} OR kth_hash <= 0 THEN n_mins
       ELSE ({KMV_K} - 1) * {KMV_HASH_SPACE} // kth_hash END AS BIGINT)
    AS est_distinct,
  exact_distinct
FROM agg, ex"""


PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                "o_orderpriority")


def q_table_profile(spark, sf_dir):
    """ANALYZE-style per-column profile over orders (r7): row/null/exact
    distinct counts + min/max per column in ONE aggregation pass — the
    data-quality gate a pipeline runs on a new corpus drop.  Profiled
    columns restricted to int/string types whose string casts are
    byte-identical across engines (the exactness policy; o_totalprice
    is double and o_orderdate timestamp — both excluded, formatting is
    engine-specific)."""
    from .operators.profile import table_profile
    return table_profile(load(spark, sf_dir, "orders"), list(PROFILE_COLS))


def _table_profile_oracle():
    parts = []
    for c in PROFILE_COLS:
        parts.append(f"""SELECT '{c}' AS col_name,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(*) - count({c}) AS BIGINT) AS n_null,
  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(min({c}) AS VARCHAR) AS min_str,
  CAST(max({c}) AS VARCHAR) AS max_str
FROM orders""")
    return "\nUNION ALL\n".join(parts)


def q_quantile_sketch(spark, sf_dir):
    """Bottom-k rank sketch over document lengths (r7): the mergeable
    quantile estimator that IS oracle-replayable — KLL/GK compactor state
    depends on merge order (partition-unstable, sketch bytes opaque), the
    deterministic bottom-k hash sample is a global TakeOrdered both
    engines replay element-for-element.  At the gate SF the corpus (5000
    docs) genuinely exceeds k=256, so the row exercises real sampling,
    not the exact-degenerate path."""
    from .operators.sketch import quantile_sketch
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("doc_len"))
    return quantile_sketch(docs, "doc_len", "doc_id")


def _quantile_sketch_oracle():
    from .operators.sketch import QSK_K, QSK_QS_MILLI
    qvals = ", ".join(f"({q})" for q in QSK_QS_MILLI)
    return f"""WITH s AS (
  SELECT CAST(length(text) AS BIGINT) AS v,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
              AS BIGINT) AS h
  FROM documents
  ORDER BY h, v LIMIT {QSK_K}),
ord AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
               count(*) OVER () AS m FROM s),
qs(q) AS (VALUES {qvals})
SELECT CAST(qs.q AS INT) AS q_milli,
       CAST(ord.m AS BIGINT) AS sample_n,
       ord.v AS est_value
FROM qs JOIN ord
  ON ord.rn = greatest(1, (ord.m * qs.q + 999) // 1000)"""


def q_hll_registers(spark, sf_dir):
    """HyperLogLog register table over lineitem part keys (r6): the
    classically-opaque sketch made hash-gateable — bucket = low 6 hash
    bits, rank via the engine-portable CASE ladder; <= 64 rows out, one
    map-side-combined groupBy.  Mergeability (union shards + re-max) is
    pinned by pytest."""
    from .operators.sketch import hll_registers
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    return hll_registers(li, "l_partkey")


def _hll_oracle():
    from .operators.sketch import HLL_HASH_BITS, HLL_P, hll_rank_case_sql
    m = 1 << HLL_P
    w_bits = HLL_HASH_BITS - HLL_P
    return f"""WITH h AS (
  SELECT CAST(('0x' || substr(md5(CAST(l_partkey AS STRING)), 1, 13))
              AS BIGINT) AS h
  FROM lineitem),
b AS (SELECT h % {m} AS bucket, h // {m} AS w FROM h)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(MAX({hll_rank_case_sql('w', w_bits)}) AS BIGINT) AS max_rank
FROM b GROUP BY bucket"""


SPARK_QUERIES.update({"cms_counts": q_cms_counts,
                      "bloom_filter": q_bloom_filter,
                      "kmv_distinct": q_kmv_distinct,
                      "hll_registers": q_hll_registers,
                      "quantile_sketch": q_quantile_sketch,
                      "table_profile": q_table_profile})
ORACLES.update({"cms_counts": _cms_oracle(),
                "bloom_filter": _bloom_oracle(),
                "kmv_distinct": _kmv_oracle(),
                "hll_registers": _hll_oracle(),
                "quantile_sketch": _quantile_sketch_oracle(),
                "table_profile": _table_profile_oracle()})


# --- integer PageRank over a derived link graph (r5) -------------------------

PAGERANK_ITERS = 3


def q_pagerank(spark, sf_dir):
    """Integer fixed-point PageRank (r5): the second distributed-iterative
    algorithm family (besides connected components) — a deterministic
    3-out-link graph over the documents (dst = (id*7919 + j) mod N), three
    exact integer rounds; the oracle replays every round as chained CTEs
    (the k-means replay pattern)."""
    from .operators.cluster import pagerank_integer
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()  # one scalar job (the top_terms pattern); ids are 0..N-1
    # three link rules with genuinely different in-degree structure — a
    # bijection (uniform), a quadratic residue map (irregular), and an
    # integer-division hub map (high-in-degree nodes); an all-bijective
    # graph would make every rank identical and prove nothing
    dsts = [((F.col("doc_id") * 7919 + 1) % n),
            ((F.col("doc_id") * F.col("doc_id") + 2) % n),
            (F.expr("doc_id div 3") % n)]
    edges = None
    for dst in dsts:
        e = docs.select(F.col("doc_id").alias("src"), dst.alias("dst"))
        edges = e if edges is None else edges.unionByName(e)
    return pagerank_integer(edges, docs, iters=PAGERANK_ITERS)


def _pagerank_oracle():
    rounds = []
    for k in range(1, PAGERANK_ITERS + 1):
        rounds.append(f"""s{k} AS (
  SELECT e.dst AS id, sum(r.rank // od.od) AS s
  FROM e JOIN r{k - 1} r ON r.id = e.src JOIN od ON od.src = e.src
  GROUP BY e.dst),
r{k} AS (
  SELECT v.id, 150000 + (85 * coalesce(s.s, 0)) // 100 AS rank
  FROM v LEFT JOIN s{k} s ON s.id = v.id)""")
    chain = ",\n".join(rounds)
    return f"""WITH v AS (SELECT doc_id AS id FROM documents),
n AS (SELECT count(*) AS n FROM documents),
e AS (SELECT id AS src, (id * 7919 + 1) % (SELECT n FROM n) AS dst FROM v
      UNION ALL
      SELECT id, (id * id + 2) % (SELECT n FROM n) FROM v
      UNION ALL
      SELECT id, (id // 3) % (SELECT n FROM n) FROM v),
od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
r0 AS (SELECT id, 1000000 AS rank FROM v),
{chain}
SELECT id, CAST(rank AS BIGINT) AS rank FROM r{PAGERANK_ITERS}"""


SPARK_QUERIES.update({"pagerank": q_pagerank})
ORACLES.update({"pagerank": _pagerank_oracle()})


def q_triangle_count(spark, sf_dir):
    """Exact triangle census (r6) over a deterministic document graph —
    two ring rules guarantee closures, a quadratic-residue rule adds
    irregular chords, an integer-division rule adds hubs (which the
    degree orientation must neutralize: their edges all point inward).
    One row out: nodes / edges / wedges / triangles."""
    from .operators.cluster import triangle_count
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()  # one scalar job (the pagerank pattern); ids 0..N-1
    rules = [(F.col("doc_id") + 1) % n,
             (F.col("doc_id") + 2) % n,
             (F.col("doc_id") * F.col("doc_id") + 2) % n,
             F.expr("doc_id div 7") % n]
    raw = None
    for dst in rules:
        e = docs.select(F.col("doc_id").alias("a"), dst.alias("b"))
        raw = e if raw is None else raw.unionByName(e)
    return triangle_count(raw)


_TRIANGLE_ORACLE = """WITH v AS (SELECT doc_id AS id FROM documents),
n AS (SELECT count(*) AS n FROM v),
raw AS (
  SELECT id AS a, (id + 1) % (SELECT n FROM n) AS b FROM v
  UNION ALL SELECT id, (id + 2) % (SELECT n FROM n) FROM v
  UNION ALL SELECT id, (id * id + 2) % (SELECT n FROM n) FROM v
  UNION ALL SELECT id, (id // 7) % (SELECT n FROM n) FROM v),
und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        FROM raw WHERE a <> b),
deg AS (SELECT x AS id, count(*) AS d FROM (
          SELECT a AS x FROM und UNION ALL SELECT b FROM und) GROUP BY x),
o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                  THEN u.a ELSE u.b END AS src,
             CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                  THEN u.b ELSE u.a END AS dst
      FROM und u JOIN deg da ON da.id = u.a JOIN deg db ON db.id = u.b),
w AS (SELECT least(o1.dst, o2.dst) AS x, greatest(o1.dst, o2.dst) AS y
      FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst < o2.dst),
t AS (SELECT count(*) AS n_tri
      FROM w JOIN und ON und.a = w.x AND und.b = w.y)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM w) AS BIGINT) AS n_wedges,
       CAST((SELECT n_tri FROM t) AS BIGINT) AS n_triangles"""

SPARK_QUERIES.update({"triangle_count": q_triangle_count})
ORACLES.update({"triangle_count": _TRIANGLE_ORACLE})


SEMDEDUP_MIN_SCORE = 300_000  # quantized dot ~ cos 0.3 on unit vectors:
# at the gate SF this leaves 223 components of 500 vectors — real merge
# structure without collapsing the corpus into one ball


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication (r5): k-means clusters
    (integer Lloyd, same training as ann_ivf_kmeans), within-cluster
    near-dup pairs by integer-dot threshold, connected components, min-id
    survivor per component.  Clustering bounds the pairwise term — never
    all-pairs; the oracle replays training, assignment, pairing, and the
    transitive closure as one chained-CTE query."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, KMEANS_K, iters=KMEANS_ITERS,
                                     min_score=SEMDEDUP_MIN_SCORE)


def _semantic_dedup_oracle():
    return f"""WITH RECURSIVE {_kmeans_assign_ctes()},
pairs AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
  WHERE CAST(list_dot_product(ea.v, eb.v) AS BIGINT) >= {SEMDEDUP_MIN_SCORE}),
sym AS (SELECT id1 AS id, id2 AS nbr FROM pairs
        UNION ALL SELECT id2 AS id, id1 AS nbr FROM pairs),
verts AS (SELECT vec_id AS id FROM e),
reach(id, comp) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.id, r.comp FROM sym s JOIN reach r ON r.id = s.nbr),
comps AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid, c.component,
       a.vec_id = c.component AS is_survivor
FROM assign a JOIN comps c ON c.id = a.vec_id"""


SEMDEDUP_MAX_CLUSTER = 62  # bites at BOTH test SFs (cluster sizes run
# 58-70 at sf0.001 and 58-65 at sf0.01), so the capped twin provably
# exercises the drop path, not a no-op cap


def q_semantic_dedup_capped(spark, sf_dir):
    """semantic_dedup with the max_cluster guard engaged (VERDICT r6
    task 5 — the lsh_pairs/lsh_pairs_capped precedent): clusters holding
    more than SEMDEDUP_MAX_CLUSTER members are excluded from pair
    generation BEFORE the within-cluster self-join, bounding the
    quadratic term at max_cluster² per cluster; their members surface as
    singleton components.  The dropped mass is observable via
    semantic_oversize_clusters (pytest-pinned against this cap)."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, KMEANS_K, iters=KMEANS_ITERS,
                                     min_score=SEMDEDUP_MIN_SCORE,
                                     max_cluster=SEMDEDUP_MAX_CLUSTER)


def _semantic_dedup_capped_oracle():
    return f"""WITH RECURSIVE {_kmeans_assign_ctes()},
small AS (
  SELECT cid FROM assign GROUP BY cid
  HAVING count(*) <= {SEMDEDUP_MAX_CLUSTER}),
pairs AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2
  FROM assign a JOIN small sm ON sm.cid = a.cid
  JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
  WHERE CAST(list_dot_product(ea.v, eb.v) AS BIGINT) >= {SEMDEDUP_MIN_SCORE}),
sym AS (SELECT id1 AS id, id2 AS nbr FROM pairs
        UNION ALL SELECT id2 AS id, id1 AS nbr FROM pairs),
verts AS (SELECT vec_id AS id FROM e),
reach(id, comp) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.id, r.comp FROM sym s JOIN reach r ON r.id = s.nbr),
comps AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid, c.component,
       a.vec_id = c.component AS is_survivor
FROM assign a JOIN comps c ON c.id = a.vec_id"""


def q_semantic_oversize(spark, sf_dir):
    """The observable dropped-mass report for q_semantic_dedup_capped
    (the lsh_oversize mirror): one (cid, n_members, representative) row
    per cluster the cap excluded from pair generation."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.semantic_oversize_clusters(
        emb, SEMDEDUP_MAX_CLUSTER, KMEANS_K, iters=KMEANS_ITERS)


def _semantic_oversize_oracle():
    return f"""WITH {_kmeans_assign_ctes()}
SELECT CAST(cid AS BIGINT) AS cid,
       CAST(count(*) AS BIGINT) AS n_members,
       min(vec_id) AS representative
FROM assign GROUP BY cid
HAVING count(*) > {SEMDEDUP_MAX_CLUSTER}"""


SPARK_QUERIES.update({"ann_ivf": q_ann_ivf, "ann_ivf_probe2": q_ann_ivf_probe2,
                      "ann_ivf_kmeans": q_ann_ivf_kmeans,
                      "ann_pq": q_ann_pq,
                      "semantic_dedup": q_semantic_dedup,
                      "semantic_dedup_capped": q_semantic_dedup_capped,
                      "semantic_oversize": q_semantic_oversize,
                      "cell_rollup": q_cell_rollup})
ORACLES.update({"ann_ivf": _ann_ivf_oracle(),
                "ann_ivf_probe2": _ann_ivf_probe2_oracle(),
                "ann_ivf_kmeans": _ann_ivf_kmeans_oracle(),
                "ann_pq": _ann_pq_oracle(),
                "semantic_dedup": _semantic_dedup_oracle(),
                "semantic_dedup_capped": _semantic_dedup_capped_oracle(),
                "semantic_oversize": _semantic_oversize_oracle(),
                "cell_rollup": _cell_rollup_oracle()})
