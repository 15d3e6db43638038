"""Deterministic sampling / splitting for training-data pipelines.

`df.sample()` is seed-dependent *per partitioning* (a repartition changes
which rows survive), which breaks reproducibility guarantees for training
subsets.  These operators derive the decision from a content hash of a
key column instead — the same row lands in the same sample/split on any
cluster, any partitioning, any engine:

- ``deterministic_sample``: keep rows whose hash bucket (md5-derived,
  uniform over [0, 10000)) falls below rate_bp basis points.
- ``hash_split``: label every row train/val/test (or any weighted split)
  by hash range — disjoint, exhaustive, stable under re-runs.

Both are pure per-row JVM expressions (zero shuffle) and are recomputable
by the DuckDB oracles exactly (same md5-prefix trick as
dedup.token_code_col; reference: Spark's own sampleBy caveats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 10_000  # basis-point resolution


def _check_salt(salt: str) -> str:
    """Salts are interpolated into oracle SQL literals: restrict to
    [A-Za-z0-9_] so a quote/backslash can never silently desynchronize the
    Spark and DuckDB sides (ADVICE r2)."""
    import re
    if not re.fullmatch(r"[A-Za-z0-9_]*", salt):
        raise ValueError(f"salt must match [A-Za-z0-9_]*, got {salt!r}")
    return salt


def hash_bucket_col(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 10000) from md5 of the key (plus an optional
    salt so independent samples of the same table decorrelate)."""
    h = F.substring(F.md5(F.concat(key.cast("string"), F.lit(_check_salt(salt)))), 1, 15)
    return (F.conv(h, 16, 10).cast("long") % F.lit(SAMPLE_BUCKETS)).cast("int")


def hash_bucket_sql(key_sql: str, salt: str = "") -> str:
    """DuckDB twin of hash_bucket_col."""
    return ("CAST(CAST(('0x' || substr(md5(CAST(" + key_sql
            + f" AS STRING) || '{_check_salt(salt)}'), 1, 15)) AS BIGINT) "
            f"% {SAMPLE_BUCKETS} AS INT)")


def deterministic_sample(df: DataFrame, key: str, rate_bp: int,
                         salt: str = "") -> DataFrame:
    """Rows whose bucket < rate_bp (rate in basis points: 100 = 1%).
    Partitioning-independent, rerun-stable, engine-portable."""
    return df.filter(hash_bucket_col(F.col(key), salt) < F.lit(rate_bp))


def hash_split(df: DataFrame, key: str, splits: dict[str, int],
               salt: str = "", label_col: str = "split") -> DataFrame:
    """Add a split label by hash range.  splits maps label -> weight in
    basis points and must sum to 10000 (disjoint + exhaustive), e.g.
    {"train": 9000, "val": 500, "test": 500}."""
    if sum(splits.values()) != SAMPLE_BUCKETS:
        raise ValueError(f"split weights must sum to {SAMPLE_BUCKETS} bp, "
                         f"got {sum(splits.values())}")
    bucket = hash_bucket_col(F.col(key), salt)
    expr, lo = None, 0
    for label, w in splits.items():
        hi = lo + w
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo = hi
    return df.withColumn(label_col, expr)


def stratified_sample(df: DataFrame, group_col: str, key: str, k: int,
                      salt: str = "") -> DataFrame:
    """Exactly min(k, group size) rows per group, chosen by md5 order of
    the key — the class-balanced subset a curation pipeline draws when
    sources are wildly imbalanced.  Deterministic on any partitioning and
    engine-portable (ordering is a content hash, ties by key).

    TWO-PHASE top-k (VERDICT r5 #6 — the r5 single key-partitioned window
    sent a pathological group, e.g. half the corpus from one source, to
    ONE task): phase 1 takes the top-k per (group, input-partition) — the
    window key includes spark_partition_id(), so the shuffle spreads a
    hot group over as many reducers as the scan has splits and no task
    ever holds more than one partition's share of one group; phase 2
    re-ranks only the survivors (<= k rows per group per input split —
    k x splits rows per group, data-size-independent) with the plain
    per-group window.  The result is EXACTLY the single-window form's:
    every member of a group's global (hash, key)-order top-k is also in
    the top-k of its own input partition, so phase 1 always retains a
    superset of the answer and never drops a winner — partitioning moves
    around WHICH superset, never the final rows.

    ``_rn``/``_sp`` are reserved working names (same contract as
    merge.upsert_latest, ADVICE r5: silently clobbering a caller column
    is the bug class this file guards against elsewhere)."""
    from pyspark.sql import Window
    for c in ("_rn", "_sp"):
        if c in df.columns:
            raise ValueError(f"stratified_sample reserves column name {c!r}; "
                             "rename it before sampling")
    h = F.md5(F.concat(F.col(key).cast("string"), F.lit(_check_salt(salt))))
    w1 = Window.partitionBy(group_col, "_sp").orderBy(h.asc(), F.col(key).asc())
    w2 = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
    return (df.withColumn("_sp", F.spark_partition_id())
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= int(k)).drop("_rn")
            .withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= int(k)).drop("_rn", "_sp"))


def weighted_systematic_sample(df: DataFrame, key: str, weight_col: str,
                               k: int, salt: str = "") -> DataFrame:
    """Deterministic WEIGHTED sample of k picks by systematic (grid)
    selection over the cumulative-weight line: rows are laid out in
    md5(key)-order, each covering [S_j, S_j + w_j); pick i selects the
    row whose interval contains position p_i = i*W div k.  A row with
    weight above W/k can win several picks (multiplicity IS the correct
    weighted-sampling behaviour); expected pick count is exactly
    proportional to weight.  Deterministic on any partitioning, any
    engine — the weighted counterpart of deterministic_sample, without
    exp/ln (the classic A-Res/exponential-race keys need libm, which the
    oracle-exactness policy bans).

    Scale shape — NO global window: the order key's first two hex chars
    split the line into 256 ORDER-PREFIX buckets; per-bucket totals
    (<= 256 rows) come to the driver once, prefix-summed into offsets
    (the _adaptive_salt_map bounded-collect contract); within-bucket
    cumulative sums are a bucket-PARTITIONED window; each of the k grid
    positions is assigned its bucket ON THE DRIVER from the offsets, so
    the stab join is a broadcast equi-join on bucket with a range
    residual — never a k x n nested loop, never a partition-less
    Window.  Rows with non-positive weight are excluded by contract.
    Returns (pick_idx, id, w) — exactly k rows whenever W > 0."""
    spark = df.sparkSession
    out_schema = "pick_idx int, id long, w long"
    lined, btot, offs, total = _hash_order_prefix(df, key, weight_col, salt)
    if total == 0:
        return spark.createDataFrame([], out_schema)
    buckets = sorted(btot)
    positions, bi = [], 0
    for i in range(int(k)):
        p = i * total // int(k)
        while offs[buckets[bi]] + btot[buckets[bi]] <= p:
            bi += 1  # positions are ascending: single forward scan
        positions.append((i, p, buckets[bi]))
    pos_df = spark.createDataFrame(positions, "pick_idx int, pos long, _bk string")
    return (lined.join(
        F.broadcast(pos_df),
        (lined["_bk"] == pos_df["_bk"]) & (pos_df["pos"] >= F.col("_s"))
        & (pos_df["pos"] < F.col("_s") + F.col("w")))
        .select("pick_idx", "id", "w"))


def _hash_order_prefix(df: DataFrame, key: str, weight_col: str,
                       salt: str = ""):
    """Shared cumulative-weight-line machinery (weighted sample + shard
    packing): rows in md5(key)-order with their GLOBAL start offset
    ``_s``, built WITHOUT a partition-less window — 256 hex-prefix
    buckets, a <= 256-row driver offset collect, and a bucket-PARTITIONED
    cumulative window.  Returns (lined_df[id, w, _hx, _bk, _s], per-
    bucket totals, bucket offsets, grand total).  Non-positive weights
    are excluded by contract."""
    from pyspark.sql import Window
    base = (df.select(
        F.col(key).cast("long").alias("id"),
        F.col(weight_col).cast("long").alias("w"),
        F.md5(F.concat(F.col(key).cast("string"),
                       F.lit(_check_salt(salt)))).alias("_hx"))
        .filter(F.col("w") > 0)
        .withColumn("_bk", F.substring("_hx", 1, 2)))
    btot = {r["_bk"]: int(r["tw"]) for r in
            base.groupBy("_bk").agg(F.sum("w").alias("tw")).collect()}
    total = sum(btot.values())
    offs, acc = {}, 0
    for b in sorted(btot):  # hex-prefix order == full-hash order prefix
        offs[b] = acc
        acc += btot[b]
    w_in = (Window.partitionBy("_bk").orderBy("_hx", "id")
            .rowsBetween(Window.unboundedPreceding, 0))
    offs_df = df.sparkSession.createDataFrame(
        [(b, o) for b, o in offs.items()] or [("", 0)],
        "_bk string, off long")
    lined = (base.join(F.broadcast(offs_df), "_bk")
             .withColumn("_s", F.sum("w").over(w_in) - F.col("w")
                         + F.col("off")))
    return lined, btot, offs, total


def shard_plan(df: DataFrame, key: str, weight_col: str,
               shard_size: int, salt: str = "") -> DataFrame:
    """Token-budget SHARD PACKING: lay documents on the cumulative-weight
    (token) line in md5(key) order and cut it every ``shard_size``
    units — shard_id = floor(start_offset / shard_size).  The training-
    shard planner: every shard holds ~shard_size tokens (±1 document),
    assignment is deterministic on any partitioning and engine, and
    adding documents never reshuffles earlier shards' RELATIVE order
    (the md5 line is stable).  Returns the per-shard manifest
    (shard, n_docs, w_sum, w_min, w_max) — the bounded artifact a shard
    writer consumes.

    Scale shape: the shared _hash_order_prefix machinery (no global
    window, bounded driver offsets) + ONE map-side-combinable rollup."""
    if int(shard_size) <= 0:
        raise ValueError("shard_size must be positive")
    lined, _, _, total = _hash_order_prefix(df, key, weight_col, salt)
    return (lined.select(
        F.expr(f"_s div {int(shard_size)}").alias("shard"),
        "id", "w")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("w").cast("long").alias("w_sum"),
             F.min("w").cast("long").alias("w_min"),
             F.max("w").cast("long").alias("w_max")))
