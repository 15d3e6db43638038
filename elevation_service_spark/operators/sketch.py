"""Mergeable frequency / membership sketches over token streams: a
count-min sketch and a Bloom filter, both as plain DataFrames of cells —
the sketch tier a training-data pipeline uses when exact per-token state
is too big (heavy-hitter screening, seen-before membership).

Determinism: every hash is the repo's portable md5-derived integer
(operators/dedup.token_code_col recipe) with a per-row salt, so both
sketches — construction AND lookup — are bit-replayable by the DuckDB
oracles.  Scale shape: construction is ONE token pass + one
map-side-combined groupBy whose result is bounded by the sketch geometry
(depth x width cells / <= n_bits rows), NOT by the corpus; sketches merge
across shards/batches by unioning cell tables and re-summing (CMS) or
re-distincting (Bloom) — the standard mergeability contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 512
BLOOM_BITS = 8192
BLOOM_HASHES = 3


def hash_mod(col: Column, salt: str, mod: int) -> Column:
    """Portable salted hash in [0, mod): top-60-bit md5 int mod `mod`
    (the token_code_col recipe; DuckDB twin:
    ('0x' || substr(md5(tok || salt), 1, 15))::BIGINT % mod)."""
    hex60 = F.substring(F.md5(F.concat(col, F.lit(salt))), 1, 15)
    return (F.conv(hex60, 16, 10).cast("long") % F.lit(int(mod)))


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))


def cms_build(docs: DataFrame, text_col: str = "text",
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(row, bucket, cnt) — the count-min matrix as a table: every token
    occurrence lands in `depth` cells, one map-side-combined groupBy.
    Result size <= depth*width whatever the corpus size."""
    cells = _tokens(docs, text_col).select(
        F.posexplode(F.array(*[hash_mod(F.col("tok"), f"cms{r}", width)
                               for r in range(depth)])).alias("row", "bucket"))
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup(cms: DataFrame, probes: DataFrame, tok_col: str = "tok",
               depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(tok, est) — est = min over the probe's depth cells (absent cell =
    0).  CMS guarantee: est >= true count, overestimates only."""
    pcells = probes.select(
        F.col(tok_col).alias("tok"),
        F.posexplode(F.array(*[hash_mod(F.col(tok_col), f"cms{r}", width)
                               for r in range(depth)])).alias("row", "bucket"))
    return (pcells.join(cms, ["row", "bucket"], "left")
            .groupBy("tok")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long")
                 .alias("est")))


def bloom_build(docs: DataFrame, text_col: str = "text",
                n_bits: int = BLOOM_BITS,
                n_hashes: int = BLOOM_HASHES) -> DataFrame:
    """(bit) — the set bits of a Bloom filter over the corpus vocabulary;
    <= n_bits rows regardless of corpus size."""
    return (_tokens(docs, text_col)
            .select(F.explode(F.array(*[hash_mod(F.col("tok"), f"bloom{r}",
                                                 n_bits)
                                        for r in range(n_hashes)]))
                    .alias("bit"))
            .distinct())


def bloom_lookup(bits: DataFrame, probes: DataFrame, tok_col: str = "tok",
                 n_bits: int = BLOOM_BITS,
                 n_hashes: int = BLOOM_HASHES) -> DataFrame:
    """(tok, is_member) — member iff ALL the probe's hash bits are set
    (no false negatives; false-positive rate set by the geometry)."""
    pbits = probes.select(
        F.col(tok_col).alias("tok"),
        F.explode(F.array(*[hash_mod(F.col(tok_col), f"bloom{r}", n_bits)
                            for r in range(n_hashes)])).alias("bit"))
    marked = bits.withColumn("_p", F.lit(1))
    return (pbits.join(marked, "bit", "left")
            .groupBy("tok")
            .agg((F.min(F.coalesce(F.col("_p"), F.lit(0))) == 1)
                 .alias("is_member")))


HLL_P = 6            # 2^6 = 64 registers
HLL_HASH_BITS = 52   # 13-hex-digit md5 prefix


def hll_rank_case_sql(w_expr: str, w_bits: int) -> str:
    """Engine-portable HLL rank (position of the highest set bit from the
    top, i.e. leading zeros + 1) as a pure integer-compare CASE ladder —
    the geohash-staging trick: neither Spark nor DuckDB shares a
    leading-zeros builtin, but both evaluate an ordered CASE of >=
    power-of-two literals identically.  w == 0 (all w_bits zero) maps to
    w_bits + 1, the HLL convention."""
    branches = " ".join(f"WHEN {w_expr} >= {1 << (w_bits - r)} THEN {r}"
                        for r in range(1, w_bits + 1))
    return f"CASE {branches} ELSE {w_bits + 1} END"


def hll_registers(df: DataFrame, key_col: str, p: int = HLL_P) -> DataFrame:
    """(bucket, max_rank) — the HyperLogLog register table as a
    DataFrame: bucket = low p bits of the portable 52-bit md5 hash,
    rank = leading-zero rank of the remaining bits.  Unlike engine-native
    HLL sketches (opaque binary registers), every row is deterministic
    and hash-gateable, and the table IS the mergeable artifact: shards
    merge by union + groupBy(bucket).max(max_rank) — verified by pytest.
    Scale: one map-side-combined groupBy whose result is <= 2^p rows
    whatever the corpus; the shuffle moves at most 2^p rows per task."""
    m = 1 << p
    w_bits = HLL_HASH_BITS - p
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13),
               16, 10).cast("long")
    staged = (df.select(h.alias("_h"))
              .select((F.col("_h") % m).cast("long").alias("bucket"),
                      F.expr(f"_h div {m}").alias("_w"))
              .select("bucket",
                      F.expr(hll_rank_case_sql("_w", w_bits))
                      .cast("long").alias("rank")))
    return staged.groupBy("bucket").agg(F.max("rank").alias("max_rank"))


def hll_estimate(regs: DataFrame, p: int = HLL_P) -> DataFrame:
    """(seen, sum_pow, est_distinct) — the raw HLL harmonic-mean estimate
    from a register table.  sum_pow = S = sum over all 2^p buckets of
    2^(maxrank - rank) (empty bucket = rank 0) is EXACT int64 (<= 2^p
    terms of <= 2^(w_bits+1), fits comfortably); the estimate
    alpha_m * m^2 * 2^maxrank / S is then two IEEE-exact-rounded double
    ops on exact integers — deterministic, no libm, no correction terms
    (consumers apply linear-counting corrections from `seen` if wanted)."""
    m = 1 << p
    maxr = HLL_HASH_BITS - p + 1
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("seen"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"CAST({maxr} - max_rank AS INT))"))
        .cast("long").alias("seen_pow"))
    return (agg.select(
        "seen",
        (F.col("seen_pow")
         + (F.lit(m) - F.col("seen")) * F.lit(1 << maxr)).alias("sum_pow"))
        .select("seen", "sum_pow",
                (F.lit(float(alpha * m * m)) * F.lit(float(1 << maxr))
                 / F.col("sum_pow").cast("double")).alias("est_distinct")))


KMV_K = 128
KMV_HASH_SPACE = 1 << 52  # 13-hex-digit md5 prefix: (k-1)*H fits int64


def kmv_distinct(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """(n_mins, kth_hash, est_distinct) — k-minimum-values distinct-count
    estimator, the hash-gateable alternative to HLL: est = (k-1)*H // h_k
    where h_k is the k-th smallest distinct 52-bit md5 hash.  Unlike
    engine-native HLL sketches (whose registers are implementation
    details), every step — hashing, distinct, top-k, the integer estimate
    — is deterministic and replayed exactly by the DuckDB oracle.  Fewer
    than k distinct values degrade to the exact count up to 52-bit hash
    collisions (~n^2/2^53 — n_mins counts distinct HASHES, so a colliding
    pair among <k keys undercounts by one; the oracle mirrors the same
    hashes, ADVICE r5).  Scale: distinct +
    TakeOrdered(k) — one shuffle of hash values, k tiny; mergeable by
    unioning min-sets and re-taking the k smallest."""
    h = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13),
                16, 10).cast("long"))
    mins = df.select(h.alias("h")).distinct().orderBy("h").limit(int(k))
    est = F.when((F.col("n_mins") < int(k)) | (F.col("kth_hash") <= 0),
                 F.col("n_mins")).otherwise(
        F.expr(f"({int(k)} - 1) * {KMV_HASH_SPACE}L div kth_hash"))
    return (mins.agg(F.count(F.lit(1)).cast("long").alias("n_mins"),
                     F.max("h").alias("kth_hash"))
            .select("n_mins", "kth_hash", est.cast("long").alias("est_distinct")))


QSK_K = 256
QSK_QS_MILLI = (10, 100, 250, 500, 750, 900, 990)


def quantile_sketch(df: DataFrame, value_col: str, id_col: str,
                    k: int = QSK_K,
                    qs_milli: tuple[int, ...] = QSK_QS_MILLI) -> DataFrame:
    """(q_milli, sample_n, est_value) — mergeable rank/quantile sketch
    from a deterministic bottom-k hash sample: the k rows with the
    smallest 52-bit md5(id) hashes are a uniform row sample, and each
    requested quantile is the type-1 SELECTION statistic of the sample
    (value at 1-indexed rank ceil(q·m), m = sample size — both engines
    pick the identical element, the oracle-exactness rule for order
    statistics).

    Why not KLL/GK: their compactor state depends on the ORDER buffers
    merge in, so two partitionings of the same data yield different
    sketches — unreplayable by a SQL oracle and rerun-unstable.  The
    bottom-k sample is partition-independent (a global TakeOrdered over
    content hashes), deterministic, and mergeable exactly like KMV:
    union samples, re-take the k smallest hashes, re-select.  Estimate
    error is the classic sampling bound (~1/sqrt(k) rank error at 95%);
    fewer than k rows degrade to the EXACT type-1 quantiles.

    Scale shape: one narrow (hash, value) projection + TakeOrdered(k) —
    one shuffle of k-row partial tops, never the corpus; the quantile
    selection runs on ONE k-element array row.  Ranks clamp to >= 1;
    hash ties break by value so both engines stay total."""
    h = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13),
                16, 10).cast("long"))
    samp = (df.select(h.alias("_h"),
                      F.col(value_col).cast("long").alias("v"))
            .orderBy("_h", "v").limit(int(k)))
    one = samp.agg(F.sort_array(F.collect_list("v")).alias("vs"))
    m = F.size("vs")
    ests = F.array(*[
        F.struct(F.lit(int(q)).alias("q_milli"),
                 F.try_element_at(
                     F.col("vs"),
                     # integer ceil-rank, same arithmetic as the oracle's
                     # `//` by construction (ADVICE r7: the former
                     # double-divide-then-truncate was equivalent only
                     # while m*q+999 stayed float64-exact)
                     F.greatest(F.lit(1), F.expr(
                         f"(size(vs) * {int(q)} + 999) div 1000").cast("int")))
                 .alias("est_value"))
        for q in qs_milli])
    return (one.select(m.cast("long").alias("sample_n"),
                       F.explode(ests).alias("e"))
            .select(F.col("e.q_milli").alias("q_milli"), "sample_n",
                    F.col("e.est_value").alias("est_value")))
