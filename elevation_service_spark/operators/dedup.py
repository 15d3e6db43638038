"""Deduplication operators for large-scale training-data pipelines.

All stages are built from JVM-side DataFrame primitives (split, explode,
groupBy aggregates) — no Python UDFs — so they stay inside whole-stage
codegen and scale shuffle-wise:

- exact:    one groupBy on md5(text) — single shuffle.
- minhash:  tokens → portable per-row hash code (md5-derived integer; no
            dictionary, no join, no window — see token_codes) → universal
            hashing h_i(x) = (a_i·x + b_i) mod P over integer codes →
            per-doc min per hash — single groupBy(doc) shuffle, map-side
            partial mins.
- LSH:      signature split into bands; docs sharing a band key become
            candidate pairs via a self-equi-join on (band_idx, band_key);
            AQE skew-join handles hot buckets; an optional bucket-size cap
            bounds the quadratic blowup of pathological buckets.
- simhash:  per-bit majority over token hashes, 32-bit fingerprint.
- jaccard:  exact n-gram verification join for LSH candidates.

Integer-only arithmetic throughout → results are engine-portable (the
DuckDB oracles in queries_training.py recompute them exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MINHASH_P = 2147483647  # 2^31 - 1 (prime)
SIMHASH_MULT = 2654435761  # Knuth multiplicative hash
SIMHASH_MOD = 4294967296  # 2^32
NUM_HASHES = 32
BAND_ROWS = 4  # 8 bands x 4 rows


def minhash_params(num_hashes: int = NUM_HASHES) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (shared with the SQL
    oracles — keep in sync with queries_training.py)."""
    return [((i * 2654435761 + 1) % MINHASH_P or 1, (i * 40503 + 7) % MINHASH_P)
            for i in range(num_hashes)]


def tokenize(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(id, pos, tok) — whitespace tokens with document position."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"))


def token_code_col(tok) -> F.Column:
    """Portable integer token code in [0, MINHASH_P): the top 60 bits of
    md5(tok) reduced mod P.  A pure per-row JVM expression (md5 + conv) —
    no dictionary, no join, no window, NO SHUFFLE — so the coding scales
    with the corpus at any vocabulary size (round-1's global-window
    dictionary was a single-partition scale-killer).  DuckDB computes the
    identical value via ``('0x' || substr(md5(tok), 1, 15))::BIGINT % P``,
    keeping every downstream minhash/simhash/winnow oracle exact."""
    hex60 = F.substring(F.md5(tok), 1, 15)
    return (F.conv(hex60, 16, 10).cast("long") % F.lit(MINHASH_P)).cast("long")


# the DuckDB twin of token_code_col, shared by the oracle SQL builders
TOKEN_CODE_SQL = ("CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % "
                  f"{MINHASH_P}")


def token_codes(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, pos, code) — tokens hash-coded per row (see token_code_col)."""
    toks = tokenize(docs, id_col, text_col)
    return toks.select("id", "pos", token_code_col(F.col("tok")).alias("code"))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(fingerprint, n_dups, representative) — exact hash dedup."""
    return (docs.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
            .agg(F.count(F.lit(1)).alias("n_dups"),
                 F.min(F.col(id_col)).alias("representative")))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       num_hashes: int = NUM_HASHES) -> DataFrame:
    """(id, s0..s{n-1}) minhash signature columns over token codes."""
    codes = token_codes(docs, id_col, text_col)
    aggs = [F.min((F.col("code") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"s{i}")
            for i, (a, b) in enumerate(minhash_params(num_hashes))]
    return codes.groupBy("id").agg(*aggs)


def minhash_bands(sigs: DataFrame, band_rows: int = BAND_ROWS) -> DataFrame:
    """(id, band_idx, band_key) — signature rows concatenated per band."""
    sig_cols = [c for c in sigs.columns if c.startswith("s")]
    n_bands = len(sig_cols) // band_rows
    bands = [F.struct(F.lit(bi).alias("band_idx"),
                      F.concat_ws(",", *[F.col(f"s{bi * band_rows + j}").cast("string")
                                         for j in range(band_rows)]).alias("band_key"))
             for bi in range(n_bands)]
    return (sigs.select("id", F.explode(F.array(*bands)).alias("b"))
            .select("id", F.col("b.band_idx").alias("band_idx"),
                    F.col("b.band_key").alias("band_key")))


def lsh_bands(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, band_idx, band_key) — the banded minhash signatures.  Callers
    combining lsh_candidate_pairs and lsh_oversize_buckets on one corpus
    should compute this ONCE (and usually .cache() it) and pass it to
    both via ``bands=`` — tokenize + 32 minhash aggregations is the
    expensive stage and must not run twice."""
    return minhash_bands(minhash_signatures(docs, id_col, text_col))


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        max_bucket: int | None = None,
                        bands: DataFrame | None = None) -> DataFrame:
    """(id1, id2) distinct candidate near-dup pairs (id1 < id2).

    max_bucket bounds the quadratic band-bucket blowup: a band key shared
    by m documents emits m(m-1)/2 pairs, so one boilerplate-heavy bucket at
    crawl scale explodes the join output.  Buckets with more than
    max_bucket members are dropped from pair generation BEFORE the
    self-join (their members are near-duplicates of each other by
    construction — handle them via lsh_oversize_buckets, which returns one
    representative + the member count per dropped bucket, so the dropped
    mass is observable, not silent).  max_bucket=None keeps the exact
    uncapped semantics for oracle verification."""
    if bands is None:
        bands = lsh_bands(docs, id_col, text_col)
    if max_bucket is not None:
        counts = (bands.groupBy("band_idx", "band_key")
                  .agg(F.count(F.lit(1)).alias("_bn"))
                  .filter(F.col("_bn") <= max_bucket)
                  .select("band_idx", "band_key"))
        bands = bands.join(counts, ["band_idx", "band_key"], "left_semi")
    a = bands.alias("a")
    b = bands.alias("b")
    return (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
            .distinct())


def lsh_oversize_buckets(docs: DataFrame, max_bucket: int,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         bands: DataFrame | None = None) -> DataFrame:
    """(band_idx, band_key, n_members, representative) — the buckets that
    lsh_candidate_pairs(max_bucket=...) dropped.  Callers log/route these:
    every member of an oversize bucket shares a full signature band with
    the representative, so dedup can treat the whole bucket as one
    near-duplicate cluster without materializing its m²/2 pairs.
    Pass a precomputed (cached) ``bands`` frame when also calling
    lsh_candidate_pairs — see lsh_bands."""
    if bands is None:
        bands = lsh_bands(docs, id_col, text_col)
    return (bands.groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.min("id").alias("representative"))
            .filter(F.col("n_members") > max_bucket))


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 32) -> DataFrame:
    """(id, simhash:long) — per-bit majority over multiplicative token
    hashes (token multiplicity counts, as in the classic algorithm)."""
    codes = token_codes(docs, id_col, text_col)
    h = (F.col("code") * F.lit(SIMHASH_MULT)) % F.lit(SIMHASH_MOD)
    sums = [F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"c{b}")
            for b in range(bits)]
    agg = codes.groupBy("id").agg(*sums)
    combined = None
    for b in range(bits):
        term = F.when(F.col(f"c{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(term, b)
        combined = term if combined is None else combined + term
    return agg.select("id", combined.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 8) -> DataFrame:
    """(id1, id2, hamming) — near-dup pairs by simhash hamming distance,
    pre-filtered by LSH candidates (never all-pairs)."""
    pairs = lsh_candidate_pairs(docs, id_col, text_col)
    sh = simhash(docs, id_col, text_col)
    return (pairs
            .join(sh.withColumnRenamed("id", "id1").withColumnRenamed("simhash", "h1"), "id1")
            .join(sh.withColumnRenamed("id", "id2").withColumnRenamed("simhash", "h2"), "id2")
            .select("id1", "id2",
                    F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def ngram_shingles(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) — distinct word n-grams per document (lead window
    within doc; the window partitions by doc so it scales with documents)."""
    toks = tokenize(docs, id_col, text_col)
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    sh = toks.select("id", F.concat_ws(" ", *parts).alias("shingle"),
                     *[F.lead("tok", i).over(w).alias(f"_t{i}") for i in range(1, n)])
    cond = None
    for i in range(1, n):
        c = F.col(f"_t{i}").isNotNull()
        cond = c if cond is None else cond & c
    return sh.filter(cond).select("id", "shingle").distinct()


def jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard verification for LSH candidate pairs:
    (id1, id2, inter, uni) — jaccard = inter/uni kept as exact integers."""
    pairs = lsh_candidate_pairs(docs, id_col, text_col)
    sh = ngram_shingles(docs, id_col, text_col, n)
    counts = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    # equi-join on (id, shingle) composite keys — the intersection is computed
    # by the hash join itself, never materializing |sh1| x |sh2| per pair
    inter = (pairs
             .join(sh.withColumnRenamed("id", "id1"), "id1")
             .join(sh.withColumnRenamed("id", "id2"), ["id2", "shingle"])
             .groupBy("id1", "id2").agg(F.count(F.lit(1)).alias("inter")))
    return (pairs
            .join(inter, ["id1", "id2"], "left")
            .join(counts.withColumnRenamed("id", "id1").withColumnRenamed("n_sh", "n1"), "id1")
            .join(counts.withColumnRenamed("id", "id2").withColumnRenamed("n_sh", "n2"), "id2")
            .select("id1", "id2",
                    F.coalesce(F.col("inter"), F.lit(0)).cast("long").alias("inter"),
                    (F.col("n1") + F.col("n2") - F.coalesce(F.col("inter"), F.lit(0))).cast("long").alias("uni")))
