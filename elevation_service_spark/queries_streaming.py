"""Driver-contract queries that exercise the STREAMING surface under the
hard correctness gate (VERDICT r01 'What's missing' #2).

Each query runs a real Structured Streaming job (file source →
transformations → sink, availableNow trigger), drains it, and returns the
drained result as a batch DataFrame so the driver can hash-compare it
against a DuckDB oracle:

- ``elevation_stream``: the stateless stream-static flagship — derived
  points streamed from files, broadcast-tile bilinear enrichment.  Pure
  append-mode projection, so the drained output is row-for-row the batch
  result: the FULL bilinear oracle applies.
- ``sessionize_stream``: the stateful applyInPandasWithState gap
  sessionizer.  Determinism trick: a global far-future sentinel event per
  user is appended to the input, which closes every real session through
  the GAP RULE (an event > gap after the last one) rather than through
  watermark timeouts — so the emitted set of closed sessions is
  independent of file→batch slicing and equals the batch sessionization
  exactly.  The sentinel sessions themselves stay open in state and are
  never emitted.
- ``tile_stats_stream``: watermarked event-time windowed aggregation in
  append mode; a sentinel row pushes the watermark past every real
  window, so all of them flush deterministically (the sentinel's own
  window never does).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.lookup import enrich_points
from .sources.tiles import fixture_tiles_df
from .queries import load, _derived_points, _BILINEAR_ORACLE
from .queries_training import _USER_FUNNEL_ORACLE as _FUNNEL_ORACLE_REF


def _drain(stream_df: DataFrame, out: str, ckpt: str, timeout_s: int = 600,
           expect_single_data_batch: bool = False):
    q = (stream_df.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    # awaitTermination(timeout) RETURNS False on timeout instead of raising
    # — reading the sink then would hash-compare a half-written result
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming drain did not finish within {timeout_s}s "
            f"(checkpoint {ckpt}); refusing to read a partial sink")
    if expect_single_data_batch:
        # the stream-stream-join and dedup oracles are closed forms that
        # hold ONLY when availableNow drains all data in one micro-batch
        # (a multi-batch drain advances the watermark mid-stream and
        # legitimately changes the emitted set).  A Spark upgrade or a
        # maxFilesPerTrigger set elsewhere must fail HERE with a clear
        # message, not downstream as an inscrutable hash mismatch
        # (ADVICE r4).
        data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if len(data_batches) != 1:
            raise RuntimeError(
                f"streaming drain ran {len(data_batches)} data micro-batches "
                "(expected exactly 1): the closed-form oracle no longer "
                "describes this drain — check trigger/maxFilesPerTrigger/"
                "Spark availableNow semantics")


def q_elevation_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of elevation_hgt: identical rows, identical oracle."""
    base = tempfile.mkdtemp(prefix="sparkgraft_estream_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    pts = _derived_points(spark, sf_dir)
    pts.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(pts.schema).parquet(src)
    enriched = enrich_points(stream, fixture_tiles_df(spark),
                             strategy="broadcast")
    _drain(enriched.select("pid", "tile_key", "lat", "lon",
                           "elevation", "status"), out, ckpt)
    return spark.read.parquet(out)


from .streaming.stateful import GAP_US as _GAP_US  # noqa: E402

GAP_S = _GAP_US // 1_000_000  # derived, cannot drift from the operator


def q_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization drained to closed sessions; the
    oracle recomputes the same sessions from the batch lag+cumsum form."""
    from .streaming.stateful import sessionize_stream
    base = tempfile.mkdtemp(prefix="sparkgraft_sstream_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    # the parquet ts is NTZ; the cast below interprets it in the SESSION
    # zone — force UTC so unix_micros equals the oracle's epoch_us
    # regardless of the host session's zone (same guard as q_sessionize)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"))
    # ONE global sentinel timestamp for every user: per-user sentinels
    # would spread the watermark past the earlier users' sentinel + gap and
    # fire their timeouts, emitting the sentinel sessions themselves
    gmax = events.agg(F.max(F.unix_micros(F.col("ts"))).alias("mx"))
    sentinels = (events.select("user_id").distinct()
                 .crossJoin(F.broadcast(gmax))
                 .select("user_id",
                         F.timestamp_micros(F.col("mx")
                                            + F.lit(10 * 86400 * 1_000_000)
                                            + F.lit(GAP_S * 2_000_000)).alias("ts")))
    events.unionByName(sentinels).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    _drain(sessionize_stream(stream), out, ckpt)
    return spark.read.parquet(out)


_SESSIONIZE_STREAM_ORACLE = f"""WITH base AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events),
flagged AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us, 1) OVER w > {GAP_S} * 1000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
sess AS (
  SELECT user_id, ts_us,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
  FROM flagged)
SELECT user_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, seq"""



def q_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful STREAMING funnel (r6): every user's final ordered
    view->click->purchase result from the incremental bounded-state
    operator — gated against the IDENTICAL batch oracle as user_funnel
    (batch-stream parity is the contract).  Sentinel events of a
    non-step type, placed far past every real timestamp, advance the
    watermark so each user's quiet period elapses and the final row is
    emitted; the sentinels themselves fold nothing."""
    from .streaming.stateful import FUNNEL_QUIET_US, funnel_stream
    base = tempfile.mkdtemp(prefix="sparkgraft_fstream_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type")
    gmax = events.agg(F.max(F.unix_micros(F.col("ts"))).alias("mx"))
    sentinels = (events.select("user_id").distinct()
                 .crossJoin(F.broadcast(gmax))
                 .select("user_id",
                         F.timestamp_micros(
                             F.col("mx") + F.lit(10 * 86400 * 1_000_000)
                             + F.lit(2 * FUNNEL_QUIET_US)).alias("ts"),
                         F.lit("sentinel").alias("event_type")))
    events.unionByName(sentinels).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    _drain(funnel_stream(stream), out, ckpt)
    return spark.read.parquet(out)


BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def q_tile_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked event-time windowed per-tile rollup on a stream:
    derived points get deterministic event times spanning two 1-hour
    windows; a far-future sentinel point advances the watermark past every
    real window so append mode emits them all (the sentinel's own window
    stays open and unemitted).  Oracle: the same counts grouped by the
    epoch-aligned hour, computed batch-side by DuckDB."""
    from .streaming.enrich_stream import tile_stats_stream
    base = tempfile.mkdtemp(prefix="sparkgraft_wstream_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    pts = _derived_points(spark, sf_dir).select(
        "pid", "lat", "lon",
        F.timestamp_micros(F.lit(BASE_US)
                           + (F.col("pid") % 7200) * 1_000_000).alias("warc_ts"))
    sentinel = pts.limit(1).select(
        "pid", "lat", "lon",
        F.timestamp_micros(F.lit(BASE_US + 10 * 86400 * 1_000_000)).alias("warc_ts"))
    pts.unionByName(sentinel).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(pts.schema).parquet(src)
    enriched = enrich_points(stream, fixture_tiles_df(spark),
                             strategy="broadcast")
    stats = tile_stats_stream(enriched, window="1 hour",
                              watermark="10 minutes")
    _drain(stats.select(F.unix_micros("window_start").alias("window_start_us"),
                        "tile_key", "n_points", "n_ok"), out, ckpt)
    return spark.read.parquet(out)


_TILE_STATS_STREAM_ORACLE = f"""WITH {{pts_cte}},
ts AS (
  SELECT tile_key,
         {BASE_US} + (pid % 7200) * 1000000 AS ts_us
  FROM pts)
SELECT (ts_us // 3600000000) * CAST(3600000000 AS BIGINT) AS window_start_us,
       tile_key,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(*) AS BIGINT) AS n_ok
FROM ts GROUP BY 1, 2"""


def _tile_stats_stream_oracle() -> str:
    from .queries import _PTS_CTE
    return _TILE_STATS_STREAM_ORACLE.format(pts_cte=_PTS_CTE)


SSJ_WINDOW_H = 6
# ONE source of truth for the join watermark delay: interpolated into both
# withWatermark() strings AND the outer oracle's wm CTE (a bare literal in
# any one of them would silently break hash parity if the others changed)
SSJ_WATERMARK_MIN = 60


def _ssj(spark: SparkSession, sf_dir: str, how: str, prefix: str) -> DataFrame:
    """Shared builder for the stream-stream interval joins: events split
    by id parity into two watermarked file-source streams, joined on
    user_id with the event-time bound, drained via availableNow."""
    base = tempfile.mkdtemp(prefix=prefix)
    src_a, src_b, out, ckpt = (os.path.join(base, d)
                               for d in ("a", "b", "out", "ckpt"))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    ev.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(src_a)
    ev.filter(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(src_b)
    wm = f"{SSJ_WATERMARK_MIN} minutes"
    sa = (spark.readStream.schema(ev.schema).parquet(src_a)
          .withWatermark("ts", wm).alias("a"))
    sb = (spark.readStream.schema(ev.schema).parquet(src_b)
          .withWatermark("ts", wm).alias("b"))
    j = sa.join(sb, F.expr(
        "a.user_id = b.user_id AND b.ts >= a.ts "
        f"AND b.ts <= a.ts + interval {SSJ_WINDOW_H} hours"), how)
    out_df = j.select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("a_id"), F.col("b.event_id").alias("b_id"),
        F.unix_micros(F.col("a.ts")).alias("a_ts_us"),
        F.unix_micros(F.col("b.ts")).alias("b_ts_us"))
    _drain(out_df, out, ckpt, expect_single_data_batch=True)
    return spark.read.parquet(out)


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join (r4 — the remaining core Structured
    Streaming surface): inner join on user_id with an event-time bound
    (b within [a.ts, a.ts + 6h]).  Both sides carry watermarks (the
    state-cleanup contract a production deployment needs — without the
    time bound + watermarks, stream-stream join state grows forever);
    determinism under the gate comes from availableNow draining each side
    in one batch, so the watermark never classifies a row late and the
    emitted inner-join set equals the batch join exactly — the oracle."""
    return _ssj(spark, sf_dir, "inner", "sparkgraft_ssjoin_")


_SSJ_ORACLE = f"""WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
a AS (SELECT * FROM e WHERE event_id % 2 = 0),
b AS (SELECT * FROM e WHERE event_id % 2 = 1)
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       a.ts_us AS a_ts_us, b.ts_us AS b_ts_us
FROM a JOIN b ON b.user_id = a.user_id
  AND b.ts_us >= a.ts_us
  AND b.ts_us <= a.ts_us + {SSJ_WINDOW_H} * 3600000000"""


def q_stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join (r4): watermark-driven null
    emission — the semantics a production join needs for "no match ever
    arrived".  Null rows for an unmatched left emit only once the global
    watermark proves no admissible right can still match; under
    availableNow the final no-data batch performs that eviction, so the
    emitted set is CLOSED-FORM: matched pairs plus unmatched lefts with
    ``a.ts + window < wm`` where wm = min(max_a, max_b) - delay (the
    global watermark is the MIN across both inputs' per-side watermarks,
    ms-floored; the strict `<` and the floor are pinned at the +-1ms
    boundary by tests/test_streaming.py::test_ssj_outer_watermark_boundary,
    so a Spark watermark-semantics drift fails that test, not this hash).
    Lefts newer than that stay in state, unemitted — exactly what a
    restarted production query would still owe."""
    return _ssj(spark, sf_dir, "left_outer", "sparkgraft_ssjoino_")


_SSJ_OUTER_ORACLE = f"""WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
a AS (SELECT * FROM e WHERE event_id % 2 = 0),
b AS (SELECT * FROM e WHERE event_id % 2 = 1),
wm AS (SELECT ((least((SELECT max(ts_us) FROM a),
                      (SELECT max(ts_us) FROM b)) // 1000)
               - {SSJ_WATERMARK_MIN} * 60000) * 1000 AS wm_us),
m AS (
  SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
         a.ts_us AS a_ts_us, b.ts_us AS b_ts_us
  FROM a JOIN b ON b.user_id = a.user_id
    AND b.ts_us >= a.ts_us
    AND b.ts_us <= a.ts_us + {SSJ_WINDOW_H} * 3600000000)
SELECT * FROM m
UNION ALL
SELECT a.user_id, a.event_id AS a_id, CAST(NULL AS BIGINT) AS b_id,
       a.ts_us AS a_ts_us, CAST(NULL AS BIGINT) AS b_ts_us
FROM a, wm
WHERE a.event_id NOT IN (SELECT a_id FROM m)
  AND a.ts_us + {SSJ_WINDOW_H} * 3600000000 < wm.wm_us"""


DEDUP_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
DEDUP_BOILER = "the same boilerplate footer repeated across the crawl"


def q_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING exact dedup (r4): the on-the-fly crawl dedup an LLM-data
    pipeline runs as batches arrive — documents streamed from files,
    deduplicated on their content fingerprint with
    dropDuplicatesWithinWatermark (bounded state: fingerprints expire once
    the watermark passes their event time + delay, unlike a plain
    dropDuplicates whose state grows with the corpus forever).  Emitted
    set = one row per distinct fingerprint; projecting ONLY the
    fingerprint makes the output independent of which duplicate arrived
    first.  Oracle equivalence to the batch DISTINCT ALSO depends on
    availableNow draining everything in ONE micro-batch (same contract as
    the stream-stream joins): the synthetic event times span more than the
    watermark delay, so a multi-batch drain (e.g. maxFilesPerTrigger)
    would expire early keys from state and legitimately re-emit later
    duplicates — correct streaming semantics, different set."""
    base = tempfile.mkdtemp(prefix="sparkgraft_dstream_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # a third of the stream is identical boilerplate (the documents table
    # has no exact dups of its own) so the dedup state does real work
    text = F.when(F.col("doc_id") % 3 == 0, F.lit(DEDUP_BOILER)) \
            .otherwise(F.col("text"))
    docs = load(spark, sf_dir, "documents").select(
        F.md5(text).alias("fingerprint"),
        F.timestamp_micros(F.lit(DEDUP_BASE_US)
                           + F.col("doc_id") * 1_000_000).alias("ts"))
    docs.write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(docs.schema).parquet(src)
              .withWatermark("ts", "1 hour"))
    deduped = stream.dropDuplicatesWithinWatermark(["fingerprint"])
    _drain(deduped.select("fingerprint"), out, ckpt,
           expect_single_data_batch=True)
    return spark.read.parquet(out)


_DEDUP_STREAM_ORACLE = f"""SELECT DISTINCT md5(
  CASE WHEN doc_id % 3 = 0 THEN '{DEDUP_BOILER}' ELSE text END)
  AS fingerprint FROM documents"""


def q_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING corpus maintenance (r5): update batches drained through
    foreachBatch, each applying the MERGE-style latest-wins upsert
    (operators/merge.upsert_latest) into a parquet target — batch N's
    merge reads batch N-1's result.  Batch order is forced deterministic
    by TWO sequential availableNow runs over one checkpoint (the
    test_stateful pattern): run 1 merges the v1 batch, run 2 the v2 batch
    (updates + brand-new keys).  The target swap is write-new-then-rename,
    so the lazy merge reads the OLD target while writing.  Versions are
    strictly increasing per key, so the closed-form oracle is simply
    highest-version-wins across base ∪ batch1 ∪ batch2 — sequencing
    cannot change it, which is what makes the drain hash-gateable."""
    import shutil

    from .operators.merge import upsert_latest
    base_dir = tempfile.mkdtemp(prefix="sparkgraft_ustream_")
    src = os.path.join(base_dir, "src")
    target = os.path.join(base_dir, "target")
    ckpt = os.path.join(base_dir, "ckpt")
    os.makedirs(src)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source")
    docs.withColumn("version", F.lit(0).cast("long")) \
        .write.mode("overwrite").parquet(target)
    schema = spark.read.parquet(target).schema

    def merge_batch(batch_df, _bid):
        cur = batch_df.sparkSession.read.parquet(target)
        merged = upsert_latest(cur, batch_df)
        tmp = target + "_next"
        merged.write.mode("overwrite").parquet(tmp)
        old = target + "_old"
        os.rename(target, old)
        os.rename(tmp, target)
        shutil.rmtree(old, ignore_errors=True)

    def drain_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stream.writeStream.foreachBatch(merge_batch)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("upsert_stream drain did not finish in 600s")

    def land_batch(df, name):
        # the parquet FILE source lists a flat dir (no recursion): write
        # the batch aside, then move its part-files into src under a
        # unique prefix
        import glob
        tmp = os.path.join(base_dir, f"stage_{name}")
        df.write.parquet(tmp)
        for i, p in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*")))):
            os.rename(p, os.path.join(src, f"{name}-{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    land_batch(docs.filter(F.col("doc_id") % 3 == 0)
               .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
               .withColumn("version", F.lit(1).cast("long")), "b1")
    drain_once()
    b2 = (docs.filter(F.col("doc_id") % 5 == 0)
          .withColumn("text", F.concat(F.lit("v3 "), F.col("text")))
          .withColumn("version", F.lit(2).cast("long")))
    b2new = (docs.filter(F.col("doc_id") % 7 == 0)
             .select((F.col("doc_id") + 2_000_000).alias("doc_id"),
                     F.concat(F.lit("new "), F.col("text")).alias("text"),
                     "lang", "source")
             .withColumn("version", F.lit(2).cast("long")))
    land_batch(b2.unionByName(b2new), "b2")
    drain_once()
    return (spark.read.parquet(target)
            .select("doc_id", "version",
                    F.length("text").cast("long").alias("text_len"),
                    "lang", "source"))


_UPSERT_STREAM_ORACLE = """WITH u AS (
  SELECT doc_id, text, lang, source, 0 AS version FROM documents
  UNION ALL
  SELECT doc_id, 'v2 ' || text, lang, source, 1
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, 'v3 ' || text, lang, source, 2
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 2000000, 'new ' || text, lang, source, 2
  FROM documents WHERE doc_id % 7 = 0),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY version DESC) AS rn FROM u)
SELECT doc_id, CAST(version AS BIGINT) AS version,
       CAST(length(text) AS BIGINT) AS text_len, lang, source
FROM r WHERE rn = 1"""


def q_upsert_stream_resumable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crash-resumable streaming MERGE (r6): the upsert_stream drain
    routed through the versioned commit-log sink
    (operators/merge.versioned_merge_sink), with BOTH foreachBatch
    failure modes injected mid-stream:

    - after drain 1, the sink is re-invoked with the SAME (batch_df,
      batch_id) — Spark's replay-after-failed-epoch contract — and must
      no-op (marker exists);
    - before drain 2, an ORPHAN v99 snapshot directory is planted with
      no commit marker — a crash between data write and commit — and
      must be invisible to readers and merges.

    The final merged state must still equal the closed-form
    highest-version-wins oracle (same oracle as upsert_stream: the crash
    machinery must be semantically invisible, which is exactly the
    property under gate)."""
    import shutil

    from .operators.merge import versioned_merge_sink
    base_dir = tempfile.mkdtemp(prefix="sparkgraft_vstream_")
    src = os.path.join(base_dir, "src")
    target = os.path.join(base_dir, "target")
    ckpt = os.path.join(base_dir, "ckpt")
    os.makedirs(src)
    apply_fn, read_latest, seed = versioned_merge_sink(target)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source")
    seed(docs.withColumn("version", F.lit(0).cast("long")))
    schema = read_latest(spark).schema

    def drain_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stream.writeStream.foreachBatch(apply_fn)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("resumable drain did not finish in 600s")

    def land_batch(df, name):
        import glob
        tmp = os.path.join(base_dir, f"stage_{name}")
        df.write.parquet(tmp)
        for i, p in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*")))):
            os.rename(p, os.path.join(src, f"{name}-{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    b1 = (docs.filter(F.col("doc_id") % 3 == 0)
          .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
          .withColumn("version", F.lit(1).cast("long")))
    land_batch(b1, "b1")
    drain_once()
    v1_rows = read_latest(spark).count()
    # failure mode 1: replay after commit — must be a no-op
    apply_fn(b1, 0)
    if read_latest(spark).count() != v1_rows:
        raise RuntimeError("post-commit replay mutated the target")
    # failure mode 2: orphan snapshot with no commit marker
    docs.limit(5).withColumn("version", F.lit(99).cast("long")) \
        .write.mode("overwrite").parquet(os.path.join(target, "v99"))
    b2 = (docs.filter(F.col("doc_id") % 5 == 0)
          .withColumn("text", F.concat(F.lit("v3 "), F.col("text")))
          .withColumn("version", F.lit(2).cast("long")))
    b2new = (docs.filter(F.col("doc_id") % 7 == 0)
             .select((F.col("doc_id") + 2_000_000).alias("doc_id"),
                     F.concat(F.lit("new "), F.col("text")).alias("text"),
                     "lang", "source")
             .withColumn("version", F.lit(2).cast("long")))
    land_batch(b2.unionByName(b2new), "b2")
    drain_once()
    return (read_latest(spark)
            .select("doc_id", "version",
                    F.length("text").cast("long").alias("text_len"),
                    "lang", "source"))


def q_hll_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed HLL (r7 — the sketches x streaming
    composition): per 1-hour event-time window, the distinct-user
    register table (bucket, max_rank) under a watermark — the
    unique-visitors-per-window sketch a crawl/traffic pipeline keeps
    when exact per-window distinct state is too big.  State is bounded
    by sketch geometry x open windows (<= 2^p rows each), NOT by user
    count; windows seal and emit in append mode as the watermark
    passes.  A far-future sentinel (the tile_stats_stream pattern)
    advances the watermark past every real window; the sentinel's own
    window stays open and unemitted.  Oracle: DuckDB replays buckets,
    the shared rank CASE ladder, and the per-hour grouping closed-form
    — hll_rank_case_sql is the ONE definition both engines compile."""
    from .operators.sketch import HLL_HASH_BITS, HLL_P, hll_rank_case_sql
    base = tempfile.mkdtemp(prefix="sparkgraft_hllstream_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = load(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("user_id").cast("string").alias("uid"))
    gmax = events.agg(F.max(F.unix_micros("ts")).alias("mx"))
    sentinel = (events.limit(1).crossJoin(F.broadcast(gmax))
                .select(F.timestamp_micros(
                            F.col("mx") + F.lit(10 * 86400 * 1_000_000))
                        .alias("ts"), "uid"))
    events.unionByName(sentinel).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    m = 1 << HLL_P
    h = F.conv(F.substring(F.md5(F.col("uid")), 1, 13), 16, 10).cast("long")
    staged = (stream.withWatermark("ts", "10 minutes")
              .select("ts", h.alias("_h"))
              .select("ts", (F.col("_h") % m).cast("long").alias("bucket"),
                      F.expr(f"_h div {m}").alias("_w"))
              .select("ts", "bucket",
                      F.expr(hll_rank_case_sql("_w", HLL_HASH_BITS - HLL_P))
                      .cast("long").alias("rank")))
    regs = (staged.groupBy(F.window("ts", "1 hour").alias("w"), "bucket")
            .agg(F.max("rank").alias("max_rank")))
    _drain(regs.select(F.unix_micros("w.start").alias("window_start_us"),
                       "bucket", "max_rank"), out, ckpt)
    return spark.read.parquet(out)


def _hll_stream_oracle() -> str:
    from .operators.sketch import HLL_HASH_BITS, HLL_P, hll_rank_case_sql
    m = 1 << HLL_P
    return f"""WITH b AS (
  SELECT (epoch_us(ts) // 3600000000) * CAST(3600000000 AS BIGINT)
           AS window_start_us,
         h % {m} AS bucket, h // {m} AS w
  FROM (SELECT ts,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
                    AS BIGINT) AS h
        FROM events))
SELECT window_start_us, CAST(bucket AS BIGINT) AS bucket,
       CAST(max({hll_rank_case_sql('w', HLL_HASH_BITS - HLL_P)}) AS BIGINT)
         AS max_rank
FROM b GROUP BY window_start_us, bucket"""


SPARK_QUERIES = {
    "elevation_stream": q_elevation_stream,
    "sessionize_stream": q_sessionize_stream,
    "tile_stats_stream": q_tile_stats_stream,
    "stream_stream_join": q_stream_stream_join,
    "stream_stream_join_outer": q_stream_stream_join_outer,
    "dedup_stream": q_dedup_stream,
    "upsert_stream": q_upsert_stream,
    "upsert_stream_resumable": q_upsert_stream_resumable,
    "funnel_stream": q_funnel_stream,
    "hll_stream": q_hll_stream,
}
ORACLES = {
    "elevation_stream": _BILINEAR_ORACLE,
    "sessionize_stream": _SESSIONIZE_STREAM_ORACLE,
    "tile_stats_stream": _tile_stats_stream_oracle(),
    "stream_stream_join": _SSJ_ORACLE,
    "stream_stream_join_outer": _SSJ_OUTER_ORACLE,
    "dedup_stream": _DEDUP_STREAM_ORACLE,
    "upsert_stream": _UPSERT_STREAM_ORACLE,
    # identical oracle BY DESIGN: the crash machinery must be invisible
    "upsert_stream_resumable": _UPSERT_STREAM_ORACLE,
    "funnel_stream": _FUNNEL_ORACLE_REF,
    "hll_stream": _hll_stream_oracle(),
}
