#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput": {...}}

--scaling mode: run the flagship enrichment job at local[8] and local[32]
on identical input and report throughput at both plus scaling efficiency
(thr_32 / thr_8) / 4 — the in-sandbox stand-in for the north rule's
N vs 4N executor criterion (BASELINE.md).  Results land in
BENCH/BASELINE.md via --scaling --write-md.

Each timed query is forced with a noop sink (full execution, no driver
collect).  One warm-up of the flagship per session is excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _stage_totals(spark):
    """Cumulative stage-level execution metrics from the AppStatusStore
    (works for noop-sink writes, where the executed-plan walker in
    tests/test_spatial.py can't see the write's QueryExecution).  Deltas
    of these sums around each query make bench regressions mechanically
    attributable: same plan + same shuffle bytes + same task count but
    2x wall time = host weather, not a plan change (VERDICT r4 #1).

    Depends on AppStatusStore internals + Scala default-arg name mangling
    (`stageList$default$N`), which a Spark upgrade can break — so any
    failure degrades to None (plan_metrics become null with a stderr
    warning) instead of crashing the bench mid-suite (ADVICE r5)."""
    sc = spark.sparkContext
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty()  # flush async bus
    except Exception:
        pass
    try:
        store = sc._jsc.sc().statusStore()
        jlist = sc._gateway.jvm.java.util.ArrayList()
        defaults = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
        lst = store.stageList(jlist, *defaults)
        tot = {"shuffle_write_bytes": 0, "tasks": 0, "executor_run_ms": 0}
        it = lst.iterator()
        while it.hasNext():
            s = it.next()
            tot["shuffle_write_bytes"] += s.shuffleWriteBytes()
            tot["tasks"] += s.numCompleteTasks()
            tot["executor_run_ms"] += s.executorRunTime()
        return tot
    except Exception as exc:  # pragma: no cover - Spark-internals drift
        print(f"WARN: AppStatusStore stage metrics unavailable ({exc!r}); "
              "plan_metrics will be null", file=sys.stderr)
        return None


# --- bench-scale flagship: 8 points per lineitem row (sf0.1 -> 600k rows) ---

_PID = "(l_orderkey * 8 + l_linenumber)"
_BLAT = (f"(CASE CAST({_PID} % 5 AS INT) WHEN 0 THEN 57 WHEN 1 THEN -34 "
         f"WHEN 2 THEN 0 WHEN 3 THEN -1 ELSE 59 END) "
         f"+ (({_PID} * 7919) % 960 + 20) / CAST(1000 AS DOUBLE)")
_BLON = (f"(CASE CAST({_PID} % 5 AS INT) WHEN 0 THEN 11 WHEN 1 THEN -71 "
         f"WHEN 2 THEN 0 WHEN 3 THEN -1 ELSE 179 END) "
         f"+ (({_PID} * 104729) % 960 + 20) / CAST(1000 AS DOUBLE)")
# skewed variant: ~50% of points land on the hot tile N57E011
_SLAT = (f"(CASE WHEN {_PID} % 2 = 0 THEN 57 ELSE (CASE CAST({_PID} % 4 AS INT) "
         f"WHEN 0 THEN -34 WHEN 1 THEN 0 WHEN 2 THEN -1 ELSE 59 END) END) "
         f"+ (({_PID} * 7919) % 960 + 20) / CAST(1000 AS DOUBLE)")
_SLON = (f"(CASE WHEN {_PID} % 2 = 0 THEN 11 ELSE (CASE CAST({_PID} % 4 AS INT) "
         f"WHEN 0 THEN -71 WHEN 1 THEN 0 WHEN 2 THEN -1 ELSE 179 END) END) "
         f"+ (({_PID} * 104729) % 960 + 20) / CAST(1000 AS DOUBLE)")


def _bench_points(spark, sf_dir, skewed=False, multiplier=1):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    if multiplier > 1:
        li = li.withColumn("_m", F.explode(F.array(*[F.lit(i) for i in range(multiplier)]))) \
               .withColumn("l_orderkey", F.col("l_orderkey") * multiplier + F.col("_m"))
    lat, lon = (_SLAT, _SLON) if skewed else (_BLAT, _BLON)
    # small parquet inputs arrive as ~1 split; the kernel stage is
    # CPU-bound, so spread it across the cores explicitly (at real scale
    # the scan itself provides the partitions)
    return (li.select(F.expr(_PID).alias("pid"),
                      F.expr(lat).alias("lat"), F.expr(lon).alias("lon"))
            .repartition(CPUS * 2))


def _gz_tiles(spark):
    # compressed wire format: what a real deployment broadcasts/shuffles
    # (decode is cached per worker); the mixed raw/png encodings are
    # correctness-tested elsewhere
    from elevation_service_spark.sources.tiles import fixture_tiles_df
    from elevation_service_spark import fixtures
    return fixture_tiles_df(spark, encodings={t[0]: "hgt.gz" for t in fixtures.FIXTURE_TILES})


def q_flagship_enrich(spark, sf_dir):
    """extract-scale elevation enrichment: N points -> tile join -> bilinear
    (broadcast strategy; the 100 TB plan shape: map-only over points)."""
    from elevation_service_spark.operators.lookup import enrich_points
    return enrich_points(_bench_points(spark, sf_dir), _gz_tiles(spark),
                         strategy="broadcast", prune_tiles=False)


def q_enrich_cogroup_salted(spark, sf_dir):
    """same job, skewed input (50% hot tile), shuffle strategy + salting."""
    from elevation_service_spark.operators.lookup import enrich_points
    return enrich_points(_bench_points(spark, sf_dir, skewed=True),
                         _gz_tiles(spark), strategy="cogroup",
                         salt_factor=None)  # adaptive hotspot salting


def q_bench_extract(spark, sf_dir):
    """vectorized regex extraction over constructed page text (one mention
    per row) at lineitem scale."""
    from elevation_service_spark.operators.extract import extract_coords
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    text = (f"'alpha geo:' || CAST(CAST({_PID} % 80 AS INT) AS STRING) || '.' "
            f"|| lpad(CAST(CAST({_PID} % 9000 + 500 AS INT) AS STRING), 4, '0') "
            f"|| ',' || CAST(CAST({_PID} % 170 AS INT) AS STRING) || '.' "
            f"|| lpad(CAST(CAST({_PID} % 9000 + 500 AS INT) AS STRING), 4, '0') "
            f"|| ' omega v1.2, 3.4.5'")
    pages = li.select(F.expr(_PID).alias("pid"), F.expr(text).alias("text"))
    return extract_coords(pages, keep_cols=("pid",))


def q_lsh_capped_pathological(spark, sf_dir):
    """LSH near-dup candidates over a corpus with an injected pathological
    bucket: a third of the documents share one boilerplate text, which
    uncapped would emit ~(N/3)^2/2 candidate pairs from a single band
    bucket.  max_bucket drops the oversize buckets before the self-join,
    so this row measures the BOUNDED path staying flat as the hot bucket
    grows (the m^2 blowup never materializes)."""
    from elevation_service_spark.operators.dedup import lsh_candidate_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    boiler = F.lit("the same boilerplate footer navigation copyright "
                   "text repeated across the crawl")
    docs = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, boiler)
         .otherwise(F.col("text")).alias("text"))
    return lsh_candidate_pairs(docs, max_bucket=64)


def q_knn_hotcell(spark, sf_dir):
    """Degenerate-cell guard (VERDICT r2 #6): one million samples inside a
    SINGLE 0.25-degree grid cell, 10 queries in the same cell — every
    sample is a ring-1 candidate for every query.  The two-level sharded
    top-k (knn.TOPK_SHARDS) bounds any one aggregation group's
    collect_list state to ~candidates/shards, so the row measures the
    guarded path completing flat instead of OOMing one group."""
    from elevation_service_spark.operators.knn import knn_join
    n = 1_000_000
    samples = spark.range(0, n, 1, CPUS * 2).select(
        F.col("id").alias("sid"),
        (F.lit(57.0) + (F.col("id") % 1000) / 10000.0).alias("lat"),
        (F.lit(11.0) + ((F.col("id") * 7919) % 1000) / 10000.0).alias("lon"))
    queries = spark.range(0, 10).select(
        F.col("id").alias("qid"),
        (F.lit(57.0) + F.col("id") / 1000.0).alias("lat"),
        (F.lit(11.0) + F.col("id") / 1000.0).alias("lon"))
    return knn_join(queries, samples, k=5)


def q_knn_hotcell_chained(spark, sf_dir):
    """The same degenerate-cell shape through topk="chained" (r7): k
    chained min(struct) rounds — TRUE map-side partial aggregation, so
    the 10M candidate structs never shuffle (the collect_list form
    moves ~136-143 MB here).  Measured at integration (alternating
    reps): 36-54 exec-s / 0 shuffle vs 63-75 / 136 MB, identical rows.
    This row keeps the crossover measured round-over-round; the
    headline knn_hotcell row stays on the default so the guard path a
    naive caller gets is still what's tracked."""
    from elevation_service_spark.operators.knn import knn_join
    n = 1_000_000
    samples = spark.range(0, n, 1, CPUS * 2).select(
        F.col("id").alias("sid"),
        (F.lit(57.0) + (F.col("id") % 1000) / 10000.0).alias("lat"),
        (F.lit(11.0) + ((F.col("id") * 7919) % 1000) / 10000.0).alias("lon"))
    queries = spark.range(0, 10).select(
        F.col("id").alias("qid"),
        (F.lit(57.0) + F.col("id") / 1000.0).alias("lat"),
        (F.lit(11.0) + F.col("id") / 1000.0).alias("lon"))
    return knn_join(queries, samples, k=5, topk="chained")


def q_dedup_pipeline_capped(spark, sf_dir):
    """The production near-dup shape end-to-end in ONE tokenize pass:
    fused minhash+simhash aggregate -> banded LSH with the oversize-bucket
    cap applied pre-join -> hamming verification through the band self-join
    (simhash rides the explode; no second corpus scan).  Bounded output on
    the dup-dense corpus where uncapped pairs grow quadratically."""
    from elevation_service_spark.operators.dedup import simhash_near_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_pairs(docs, max_bucket=64)


def _big_pip_inputs(spark):
    """One 10k-vertex polygon x 200k candidate points in its bbox — the
    adversarial group-delivery shape (VERDICT r3 #1)."""
    import math
    n_vert = 10_000
    ring = [[0.5 + 0.45 * math.cos(2 * math.pi * i / n_vert),
             0.5 + 0.45 * math.sin(2 * math.pi * i / n_vert)]
            for i in range(n_vert)]
    ring.append(ring[0])
    gj = json.dumps({"type": "Polygon", "coordinates": [ring]})
    polys = spark.createDataFrame(
        [("BIG", gj, 0.05, 0.05, 0.95, 0.95)],
        ["poly_id", "geojson", "minx", "miny", "maxx", "maxy"])
    pts = spark.range(200_000).selectExpr(
        "id AS pid",
        "0.05 + ((id * 7919) % 9000) / 10000.0 AS lat",
        "0.05 + ((id * 104729) % 9000) / 10000.0 AS lon")
    return pts, polys


def q_pip_bucketed_big(spark, sf_dir):
    """The redesigned group-delivery bucketed PIP (VERDICT r3 #1) at an
    adversarial shape: one 10k-vertex polygon x 200k candidate points in
    its bbox.  The r3 form moved ~32 GB of ring bytes through the shuffle
    here (O(candidates x vertices)); the group form shuffles only point
    coords and joins rings onto O(cells x shards) group rows, so this row
    tracks that staying flat round-over-round.

    r7 (VERDICT r6 task 3): the HEADLINE row runs the operator DEFAULT,
    now ``shards_per_cell="auto"`` — the static dial flipped twice (r5:
    8 beat 32; r6 window: 32 beat 8), so the operator derives the split
    at runtime from each group's measured candidate count vs its ring
    vertex count.  The two static controls below keep both legacy
    regimes measured so the auto row is judged against the best static
    setting every round, not a remembered one."""
    from elevation_service_spark.operators.pip import pip_assign_bucketed
    pts, polys = _big_pip_inputs(spark)
    return pip_assign_bucketed(pts, polys)  # operator default: auto


def q_pip_bucketed_big_shards8(spark, sf_dir):
    """Static shards_per_cell=8 control — the r5 winner (16.6 s executor
    vs 41.0 s at 32 in the r5 driver window)."""
    from elevation_service_spark.operators.pip import pip_assign_bucketed
    pts, polys = _big_pip_inputs(spark)
    return pip_assign_bucketed(pts, polys, shards_per_cell=8)


def q_pip_bucketed_big_shards32(spark, sf_dir):
    """Static shards_per_cell=CPUS control — the pre-r5-kernel winner and
    the r6-window winner (36.8 s executor vs 45.1 s at 8); the spread
    between the three pip_bucketed_big rows is the measured value of the
    runtime dial."""
    from elevation_service_spark.operators.pip import pip_assign_bucketed
    pts, polys = _big_pip_inputs(spark)
    return pip_assign_bucketed(pts, polys, shards_per_cell=CPUS)


def streaming_drain_bench(spark, sf_dir):
    """Streaming-surface throughput (VERDICT r3 #7): the stateless
    stream-static flagship — bench-scale points streamed from a parquet
    file source through the broadcast bilinear enrich into a noop
    STREAMING sink (availableNow trigger, full drain).  Source write is
    excluded; the timed span is the drain the production POST /geojson
    stream pays.  Returns rows, wall-clock, rows/s."""
    import shutil
    import tempfile

    from elevation_service_spark.operators.lookup import enrich_points

    base = tempfile.mkdtemp(prefix="sparkgraft_benchstream_")
    try:
        src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
        pts = _bench_points(spark, sf_dir)
        pts.write.mode("overwrite").parquet(src)
        n = spark.read.parquet(src).count()
        stream = spark.readStream.schema(pts.schema).parquet(src)
        enriched = enrich_points(stream, _gz_tiles(spark), strategy="broadcast")
        t0 = time.time()
        q = (enriched.writeStream.format("noop")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("streaming bench drain did not finish in 600s")
        sec = round(time.time() - t0, 3)
        return {"rows": n, "sec": sec, "rows_per_sec": round(n / sec, 1)}
    finally:
        shutil.rmtree(base, ignore_errors=True)  # bench-scale copy + ckpt


def _registry_queries():
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    names = ["elevation_terrarium", "geojson_augment", "knn", "pip",
             "minhash_signatures", "simhash", "text_stats", "fingerprint",
             "ann_topk", "pricing_summary", "top_customers", "events_running",
             "sessionize",
             # r5 operator families, tracked round-over-round from here on
             "tile_slope", "semantic_dedup", "bigram_lm", "pagerank",
             # r6 capabilities
             "polygon_stats", "tile_pyramid", "robots_filter",
             "paragraph_dedup", "geohash", "inverted_index",
             # r6 late capabilities (first numbers this window)
             "bpe_merges", "user_funnel", "tile_flowacc", "collocations",
             "tile_viewshed", "crawl_frontier", "weighted_sample",
             # r7 capabilities (semantic_dedup_capped shares semantic_dedup's
             # tracked cost; hll_stream is a streaming drain, tracked via
             # elevation_stream)
             "tile_watershed", "quantile_sketch", "table_profile"]
    return {n: qs[n] for n in names}


BENCH_QUERIES = {
    "flagship_enrich": q_flagship_enrich,
    "enrich_cogroup_salted": q_enrich_cogroup_salted,
    "extract_coords_bulk": q_bench_extract,
    "lsh_capped_pathological": q_lsh_capped_pathological,
    "knn_hotcell": q_knn_hotcell,
    "knn_hotcell_chained": q_knn_hotcell_chained,
    "dedup_pipeline_capped": q_dedup_pipeline_capped,
    "pip_bucketed_big": q_pip_bucketed_big,
    "pip_bucketed_big_shards8": q_pip_bucketed_big_shards8,
    "pip_bucketed_big_shards32": q_pip_bucketed_big_shards32,
}


def run_suite(spark, sf_dir):
    times, plan_metrics = {}, {}
    # warm-up (JIT, ALL python workers, tile build) — excluded.  A limited
    # warm-up only spins up one worker; the full job warms all of them.
    _force(q_flagship_enrich(spark, sf_dir))
    # warm the PIP kernel shape too (r7): the FIRST pip_bucketed_big row
    # of a suite measured 33.9-55.8 exec-s for the IDENTICAL 110-task
    # plan that repeats at 20 s — a first-of-shape warm-up cost that
    # landed on whichever dial ran first and drove the r5/r6 "the dial
    # flipped again" confusion.  One untimed run makes the three dial
    # rows comparable.
    _force(q_pip_bucketed_big_shards8(spark, sf_dir))
    all_queries = dict(BENCH_QUERIES)
    all_queries.update(_registry_queries())
    before = _stage_totals(spark)
    for name, fn in all_queries.items():
        # the headline flagship row is best-of-2 (r7): a one-off ~10 s
        # scheduler stall was observed once on a certified-quiet host
        # (wall 11.9 s, exec-ms unchanged at ~25 s, plan pinned; the same
        # query repeats at 1.8-2.1 s) — the headline should measure the
        # engine, not a transient; both walls are recorded for honesty.
        reps = 2 if name == "flagship_enrich" else 1
        walls, metrics = [], None
        for _ in range(reps):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
            after = _stage_totals(spark)
            delta = (None if before is None or after is None
                     else {k: after[k] - before[k] for k in after})
            before = after
            if metrics is None or (delta and walls[-1] == min(walls)):
                metrics = delta
        times[name] = min(walls)
        if metrics is not None and reps > 1:
            metrics = dict(metrics, walls=walls)
        plan_metrics[name] = metrics
    return times, plan_metrics


def flagship_rows(spark, sf_dir) -> int:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()


_RANGE_LAT = _BLAT.replace("(l_orderkey * 8 + l_linenumber)", "id")
_RANGE_LON = _BLON.replace("(l_orderkey * 8 + l_linenumber)", "id")


def _range_points(spark, n, parts=256):
    """Map-only point generator: the 100 TB plan shape (points come off the
    scan already partitioned; no repartition shuffle, no explode).  Fixed
    partition count -> identical plans at every parallelism level."""
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("pid"),
        F.expr(_RANGE_LAT).alias("lat"), F.expr(_RANGE_LON).alias("lon"))


def _hardware_ceiling(n1, n2, work=3_000_000):
    """Pure-CPU multiprocessing scaling on this box — the ceiling any
    Spark job can reach.  The sandbox VM's vCPUs are overcommitted, so
    N->4N wall-clock scaling is bounded by the host, not by the engine;
    reporting the ceiling makes the Spark efficiency interpretable."""
    import multiprocessing as mp

    def run(procs):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_burn, [work] * procs * 4)
        return procs * 4 * work / (time.time() - t0)

    t1, t2 = run(n1), run(n2)
    return round((t2 / t1) / (n2 / n1), 3)


def _burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def scaling_run(sf_dir, runs=3, multiplier=16, pair=(8, 32)):
    """Flagship enrichment at local[N] vs local[4N] on identical input.
    The job is the CPU-bound kernel path: map-only derived points,
    gzip-compressed tile broadcast (KBs), no pre-pass — so core count is
    the only resource that changes between runs."""
    from elevation_service_spark.session import get_spark
    from elevation_service_spark.operators.lookup import enrich_points
    from elevation_service_spark.sources.tiles import fixture_tiles_df
    from elevation_service_spark import fixtures

    gz = {t[0]: "hgt.gz" for t in fixtures.FIXTURE_TILES}

    def job(spark, n):
        return enrich_points(_range_points(spark, n),
                             fixture_tiles_df(spark, encodings=gz),
                             strategy="broadcast", prune_tiles=False)

    n1, n2 = pair
    results = {}
    n_points = None
    for cpus in (n1, n2):
        spark = get_spark(app=f"bench-scaling-{cpus}", cpus=cpus)
        if n_points is None:
            n_points = flagship_rows(spark, sf_dir) * multiplier
        _force(job(spark, n_points))  # warm-up, excluded
        ts = []
        for _ in range(runs):
            t0 = time.time()
            _force(job(spark, n_points))
            ts.append(time.time() - t0)
        best = min(ts)
        results[cpus] = {"times": [round(t, 3) for t in ts],
                         "best_sec": round(best, 3),
                         "throughput_pts_per_sec": round(n_points / best, 1)}
        spark.stop()
    thr1 = results[n1]["throughput_pts_per_sec"]
    thr2 = results[n2]["throughput_pts_per_sec"]
    eff = (thr2 / thr1) / (n2 / n1)
    hw = _hardware_ceiling(n1, n2)
    out = {"n_points": n_points, "pair": [n1, n2],
           f"local{n1}": results[n1], f"local{n2}": results[n2],
           "scaling_efficiency": round(eff, 3),
           "hardware_ceiling_efficiency": hw,
           "efficiency_vs_hardware_ceiling": round(eff / hw, 3) if hw else None}
    # every attempt lands in the unfiltered log (r6: previously appended by
    # hand, which silently lost runs)
    try:
        log = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "scaling_attempts.jsonl")
        with open(log, "a") as f:
            f.write(json.dumps(out) + "\n")
    except OSError as exc:  # read-only checkout etc. — never fail the run
        print(f"WARN: could not append scaling attempt ({exc})",
              file=sys.stderr)
    return out


def _host_cpu_score(work: int = 3_000_000) -> float:
    """Single-thread integer-loop throughput (M ops/s) — a host-weather
    probe recorded next to every suite run.  This VM's vCPUs are shared
    with sibling VMs, so identical suites measure 1.5-6x apart depending
    on contention invisible to `ps`; the score lets a reader normalize
    across runs (BENCH/BASELINE.md 'variance disclosure')."""
    t0 = time.time()
    _burn(work)
    return round(work / (time.time() - t0) / 1e6, 1)


def _parallel_cpu_score_best(reps: int = 3) -> float:
    """Best of ``reps`` parallel probes, ~2 s apart: one momentary burst
    (observed: 79.6 Mops pre-probe on a window whose suite then ran the
    build's best flagship number) must not doom an otherwise-quiet
    window; SUSTAINED contention still fails all reps.  Best-of matches
    the ratchet's capacity semantics."""
    best = 0.0
    for i in range(reps):
        if i:
            time.sleep(2)
        best = max(best, _parallel_cpu_score())
    return best


def _parallel_cpu_score(procs: int | None = None,
                        work: int = 2_000_000) -> float:
    """ALL-core aggregate integer-loop throughput (M ops/s).  The
    single-thread probe is insensitive to multi-core contention on this
    overcommitted box — BENCH_r06 probed a healthy 13.9/16.6 single-thread
    while pinned-plan queries ran 2-3.5x slow — because one burning thread
    usually wins a vCPU even under load.  CPUS competing burns share the
    physical cores with whatever else is running, so sibling-VM or
    just-exited-process contention shows up directly as lost aggregate
    throughput."""
    import multiprocessing as mp

    procs = procs or CPUS
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, [work] * procs)
    return round(procs * work / (time.time() - t0) / 1e6, 1)


_WINDOW_REF = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "window_reference.json")


def _window_check() -> dict:
    """Certify the measurement window BEFORE the suite runs (VERDICT r6
    tasks 1-2: a contended window must never silently become the round's
    number of record).  Two mechanical preconditions:

    1. cooldown — wait (up to SPARK_GRAFT_BENCH_COOLDOWN_S, default 180 s)
       for the 1-min loadavg to fall below SPARK_GRAFT_BENCH_LOAD_MAX
       (default 2.0): a heavyweight process that just exited (e.g. the
       20-min pytest suite) leaves elevated load + page-cache churn that
       inflates wall 3-4x with identical plan metrics (CLAUDE.md hygiene
       rule, now enforced instead of remembered);
    2. probe — all-core parallel burn vs the best-seen (= least-contended)
       reference in BENCH/window_reference.json; below 0.8x the reference
       the window is contended.  The reference is self-calibrating: it
       only ever ratchets UP, so a bad window can never certify itself.

    The run proceeds either way — the driver always needs its JSON line —
    but the artifact carries ``window.ok`` / ``window_ok`` so a hot run is
    loudly tagged rather than trusted."""
    max_wait = int(os.environ.get("SPARK_GRAFT_BENCH_COOLDOWN_S", "180"))
    load_max = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "2.0"))
    waited = 0
    load = os.getloadavg()[0]
    while load > load_max and waited < max_wait:
        time.sleep(10)
        waited += 10
        load = os.getloadavg()[0]
    single = _host_cpu_score()
    par = _parallel_cpu_score_best()
    ref = None
    try:
        with open(_WINDOW_REF) as f:
            ref = json.load(f)
    except (OSError, ValueError):
        pass
    problems = []
    if load > load_max:
        problems.append(f"loadavg1 {load:.2f} > {load_max} after "
                        f"{waited}s cooldown")
    if ref and par < 0.8 * ref["parallel_mops"]:
        problems.append(f"parallel probe {par} Mops < 0.8x best-seen "
                        f"{ref['parallel_mops']}")
    best = {"parallel_mops": max(par, ref["parallel_mops"] if ref else 0.0),
            "single_mops": max(single, ref["single_mops"] if ref else 0.0)}
    try:
        with open(_WINDOW_REF, "w") as f:
            json.dump(best, f)
    except OSError as exc:  # read-only checkout — probe still reported
        print(f"WARN: could not update window reference ({exc})",
              file=sys.stderr)
    out = {"ok": not problems,
           "reason": "; ".join(problems) if problems else "quiet",
           "loadavg1": round(load, 2), "cooldown_waited_s": waited,
           "single_mops": single, "parallel_mops": par,
           "ref_parallel_mops": ref["parallel_mops"] if ref else None}
    if problems:
        print(f"WARN: bench window NOT certified: {out['reason']}",
              file=sys.stderr)
    return out


def main():
    if "--scaling" in sys.argv:
        pair_env = os.environ.get("SPARK_GRAFT_SCALING_PAIR", "8,32")
        n1, n2 = (int(x) for x in pair_env.split(","))
        out = scaling_run(SF_DIR, pair=(n1, n2),
                          runs=int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3")))
        print(json.dumps(out))
        return
    from elevation_service_spark.session import get_spark
    window = _window_check()
    cpu_before = window["single_mops"]
    # retain every stage for the whole suite: _stage_totals computes deltas
    # of CUMULATIVE sums, and the default 1000-stage eviction would make
    # the sums shrink mid-suite (negative deltas) once ~80 queries ran
    spark = get_spark(app="bench", cpus=CPUS,
                      extra_conf={"spark.ui.retainedStages": "100000",
                                  "spark.ui.retainedJobs": "100000"})
    n = flagship_rows(spark, SF_DIR)
    t_total0 = time.time()
    times, plan_metrics = run_suite(spark, SF_DIR)
    total = round(time.time() - t_total0, 3)
    cpu_after = _host_cpu_score()
    flag = times.get("flagship_enrich") or 1e-9
    # measured (not asserted) per-worker grid-cache locality: one more
    # flagship pass with accumulators, forced via an aggregate over the
    # UDF output (count() would prune the UDF projection entirely)
    from elevation_service_spark.operators.lookup import (
        enrich_points, grid_cache_accumulators)
    accs = grid_cache_accumulators(spark)
    mdf = enrich_points(_bench_points(spark, SF_DIR), _gz_tiles(spark),
                        strategy="broadcast", prune_tiles=False,
                        cache_metrics=accs)
    mdf.agg(F.sum(F.col("elevation").isNotNull().cast("long"))).collect()
    cache = {k: a.value for k, a in accs.items()}
    lookups = cache["hits"] + cache["misses"]
    cache["hit_rate"] = round(cache["hits"] / lookups, 4) if lookups else None
    # reported only under "streaming" — the suite `value` above was already
    # closed, and duplicating the number into `queries` made value != sum
    stream_stats = streaming_drain_bench(spark, SF_DIR)
    full = {
        "metric": "headline suite wall-clock (flagship elevation enrichment + operator set)",
        "value": total,
        "unit": "sec",
        "queries": times,
        # per-query stage-metric deltas (shuffle write bytes, completed
        # tasks, summed executor run ms) captured from the AppStatusStore
        # around each timed run: same plan metrics + different wall time
        # across rounds = host weather, not a plan change (VERDICT r4 #1)
        "plan_metrics": plan_metrics,
        "sf": SF_DIR,
        "cpus": CPUS,
        "flagship_points": n,
        "flagship_lookups_per_sec": round(n / flag, 1),
        # per-worker decoded-grid cache counters for the flagship job
        # (locality evidence: a handful of misses per worker, hits ~ batches)
        "grid_cache": cache,
        # streaming surface: stateless enrich drain (file source -> noop
        # streaming sink, availableNow) at bench scale
        "streaming": {"elevation_stream": stream_stats},
        # single-thread M ops/s before/after the suite — host-weather probe
        # for cross-run normalization (shared-vCPU box; see BENCH/BASELINE.md)
        "host_cpu_mops": [cpu_before, cpu_after],
        # mechanical window certification (cooldown + all-core probe vs
        # best-seen reference + post-suite re-probe); ok=false means the
        # numbers are weather-suspect and must not be read as regressions
        "window": window,
    }
    # full metrics object (plan_metrics and all) goes to a file; the driver
    # captures only the LAST ~2000 chars of stdout, and r5's one-line JSON
    # outgrew that window ("parsed": null in BENCH_r05.json).  The stdout
    # line printed LAST is a compact subset guaranteed to fit (VERDICT r5 #2).
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH", "last_run.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    compact = {
        "metric": full["metric"],
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "cpus": CPUS,
        "flagship_points": n,
        "flagship_lookups_per_sec": full["flagship_lookups_per_sec"],
        "stream_rows_per_sec": stream_stats["rows_per_sec"],
        "grid_cache_hit_rate": cache["hit_rate"],
        "host_cpu_mops": [cpu_before, cpu_after],
        "window_ok": window["ok"],
        "full_metrics": "BENCH/last_run.json",
    }
    # post-suite re-probe AFTER spark.stop(): weather that moved in
    # MID-run (the r6 failure mode) degrades the trailing score even when
    # the leading probe was clean.  Probing with the Spark JVM still up
    # measured consistently ~0.55-0.8x the pre-probe on CLEAN windows
    # (idle executor threads + GC compete with the burns), so the host is
    # probed, not host+JVM.
    spark.stop()
    par_after = _parallel_cpu_score_best()
    floor = 0.8 * max(window["parallel_mops"],
                      window["ref_parallel_mops"] or 0.0)
    if par_after < floor:
        window["ok"] = False
        sep = "" if window["reason"] == "quiet" else window["reason"] + "; "
        window["reason"] = (sep + f"post-suite parallel probe {par_after} "
                            f"Mops < 0.8x window best {round(floor / 0.8, 1)}")
        print(f"WARN: bench window degraded mid-run: {window['reason']}",
              file=sys.stderr)
    window["parallel_mops_after"] = par_after
    compact["window_ok"] = full["window"]["ok"]
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    line = json.dumps(compact)
    if len(line) > 1800:  # belt-and-braces: never outgrow the capture again
        compact["queries"] = {k: round(v, 2) for k, v in times.items()}
        for drop in ("grid_cache_hit_rate", "host_cpu_mops", "metric"):
            line = json.dumps(compact)
            if len(line) <= 1800:
                break
            compact.pop(drop, None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
