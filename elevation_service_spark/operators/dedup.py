"""Deduplication operators for large-scale training-data pipelines.

All stages are built from JVM-side DataFrame primitives (split, explode,
broadcast dict join, groupBy aggregates) — no Python UDFs — so they stay
inside whole-stage codegen and scale shuffle-wise:

- exact:    one groupBy on md5(text) — single shuffle.
- minhash:  tokens → dictionary code (broadcast join; the dictionary is
            tiny relative to the corpus) → universal hashing
            h_i(x) = (a_i·x + b_i) mod P over integer codes → per-doc min
            per hash — single groupBy(doc) shuffle, map-side partial mins.
- LSH:      signature split into bands; docs sharing a band key become
            candidate pairs via a self-equi-join on (band_idx, band_key);
            AQE skew-join handles hot buckets.
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


def token_codes(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Dictionary-encode tokens: (id, pos, code).  The dictionary is built
    with a global row_number ordered by token — deterministic and
    engine-portable; it is broadcast back (vocab << corpus).  For corpora
    with unbounded vocab use xxhash64(tok) instead (same downstream ops,
    not oracle-portable)."""
    toks = tokenize(docs, id_col, text_col)
    dictionary = (toks.select("tok").distinct()
                  .withColumn("code", F.row_number().over(Window.orderBy("tok"))))
    return (toks.join(F.broadcast(dictionary), "tok")
            .select("id", "pos", F.col("code").cast("long").alias("code")))


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


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id1, id2) distinct candidate near-dup pairs (id1 < id2)."""
    bands = minhash_bands(minhash_signatures(docs, id_col, text_col))
    a = bands.alias("a")
    b = bands.alias("b")
    return (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
            .distinct())


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
