"""Similarity search over embedding columns (array<float>).

- ``ann_brute_topk``: exact top-k by quantized dot product.  The query set
  is broadcast; scoring is a JVM higher-order expression
  (zip_with · aggregate) inside codegen — no Python, no shuffle except the
  final per-query top-k window.  O(N·Q): the correctness baseline.
- ``ann_lsh_topk``: the scale path — random-hyperplane (sign) LSH buckets
  via a deterministic ±1 plane matrix; candidates = bucket collisions
  (hamming-ball 0), exact rerank inside buckets.  Turns O(N·Q) into
  O(N + collisions).

Scores are integer dot products of round(x·1000) components — exact,
order-independent, and reproducible by the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT_SCALE = 1000
N_PLANES = 8


def _quant(col: Column) -> Column:
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT_SCALE + F.lit(0.5)).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


def ann_brute_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(qid, rank, vec_id, score) — exact top-k neighbours per query id by
    quantized dot product; ties broken by vec_id ascending; self excluded."""
    q = (emb.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("qid"), _quant(F.col(vec_col)).alias("qv")))
    cand = (emb.select(F.col(id_col).alias("vec_id"), _quant(F.col(vec_col)).alias("ev"))
            .crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id", _dot(F.col("qv"), F.col("ev")).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "vec_id", "score"))


def plane_sign(plane: int, pos: int) -> int:
    """Deterministic ±1 hyperplane matrix entry (shared with SQL oracle)."""
    return 1 if ((plane * 31 + pos * 17) % 2) == 0 else -1


def _bucket(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Sign-LSH bucket id: bit j = (sum_i sign(j,i)·v_i) > 0."""
    bucket = None
    for j in range(n_planes):
        proj = None
        for i in range(dim):
            term = F.element_at(vec, i + 1) * F.lit(plane_sign(j, i))
            proj = term if proj is None else proj + term
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        bucket = term if bucket is None else bucket + term
    return bucket


def ann_lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
                 dim: int = 64, n_planes: int = N_PLANES,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(qid, rank, vec_id, score) — approximate top-k: candidates share the
    query's sign-LSH bucket, exact integer-dot rerank within.  May return
    fewer than k rows per query (bucket miss) — that is the ANN recall
    trade-off; recall is measured against ann_brute_topk in tests."""
    base = emb.select(F.col(id_col).alias("vec_id"),
                      _quant(F.col(vec_col)).alias("ev"))
    base = base.withColumn("bucket", _bucket(F.col("ev"), dim, n_planes))
    q = (base.filter(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("qid"), F.col("ev").alias("qv"),
                 F.col("bucket").alias("qbucket")))
    cand = (base.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id", _dot(F.col("qv"), F.col("ev")).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "vec_id", "score"))


def embedding_near_dup_pairs(emb: DataFrame, min_score: int,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: int = 64) -> DataFrame:
    """(id1, id2, score) — embedding near-duplicates: bucket-collision
    self-join + exact integer-dot threshold (cosine-style near-dup dedup
    at scale; never all-pairs)."""
    base = (emb.select(F.col(id_col).alias("id"), _quant(F.col(vec_col)).alias("v"))
            .withColumn("bucket", _bucket(F.col("v"), dim)))
    a, b = base.alias("a"), base.alias("b")
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
                    _dot(F.col("a.v"), F.col("b.v")).alias("score"))
            .filter(F.col("score") >= min_score))


EXPR_MAX_CENTROIDS = 64


def kmeans_centroids(emb: DataFrame, k: int, iters: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     salt: str = "km") -> list[tuple[int, list[int]]]:
    """Learned IVF centroids: quantized Lloyd iterations, fully distributed.

    - init: deterministic content-hash sample of k corpus vectors
      (partitioning-independent, rerun-stable — same scheme as
      operators/sampling.py), so runs are reproducible without RNG state;
    - assign: broadcast-matrix argmax (_centroid_probe_udf — the same
      kernel the search path uses);
    - update: posexplode the vectors and average per (centroid, dim) — one
      map-side-combined aggregation, never collecting vectors; means are
      re-quantized to ints so every iteration (and the final search) stays
      in exact integer arithmetic.

    Only the k centroid vectors ever reach the driver (k*dim ints per
    iteration — the k-means state, small by definition).  Empty clusters
    keep their previous centroid.  Returns [(cid, quantized_vec)] sorted by
    cid, ready for ann_ivf_topk(centroids=...)."""
    base = (emb.select(F.col(id_col).alias("vec_id"),
                       _quant(F.col(vec_col)).alias("ev")))
    # deterministic k-sample: smallest-k by md5(vec_id || salt) — a
    # distributed TakeOrdered (orderBy+limit), NOT a global window
    bucket = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(salt)))
    seed_rows = (base.withColumn("_b", bucket)
                 .orderBy("_b", "vec_id").limit(k)
                 .select("vec_id", "ev").collect())
    cents = sorted((i, [int(x) for x in r["ev"]])
                   for i, r in enumerate(sorted(seed_rows,
                                                key=lambda r: r["vec_id"])))
    spark = emb.sparkSession

    def partial_sums(batches):
        # per-partition numpy partial sums: each partition emits at most k
        # rows of (cid, dim-sum vector, count) — the shuffle volume is
        # partitions x k x dim longs, NOT rows x dim exploded rows
        acc: dict[int, list] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf["cid"].to_numpy()
            vecs = np.asarray(pdf["ev"].tolist(), dtype=np.int64)
            for cid in np.unique(cids):
                m = cids == cid
                ent = acc.setdefault(int(cid),
                                     [np.zeros(vecs.shape[1], np.int64), 0])
                ent[0] += vecs[m].sum(axis=0)
                ent[1] += int(m.sum())
        yield pd.DataFrame({
            "cid": list(acc.keys()),
            "s": [e[0].tolist() for e in acc.values()],
            "n": [e[1] for e in acc.values()]})

    for _ in range(iters):
        assign1 = _centroid_probe_udf(spark, cents, 1)
        assigned = base.withColumn("cid", F.element_at(assign1(F.col("ev")), 1))
        parts = (assigned.select("cid", "ev")
                 .mapInPandas(partial_sums, "cid long, s array<long>, n long")
                 .collect())  # <= partitions x k tiny rows: the k-means state
        sums: dict[int, list] = {}
        for r in parts:
            ent = sums.setdefault(int(r["cid"]), [np.zeros(len(r["s"]), np.int64), 0])
            ent[0] += np.asarray(r["s"], dtype=np.int64)
            ent[1] += int(r["n"])
        new = dict(cents)  # empty clusters keep their previous centroid
        for cid, (svec, n) in sums.items():
            # integer mean, round half away from zero — exact and stable
            new[cid] = [int((2 * s + n) // (2 * n)) if s >= 0
                        else -int((2 * -s + n) // (2 * n))
                        for s in svec.tolist()]
        cents = sorted(new.items())
    return cents


def _centroid_probe_udf(spark, cents: list[tuple[int, list[int]]], nprobe: int):
    """Arrow-vectorized top-``nprobe`` centroid assignment against a
    broadcast integer centroid matrix — the scale path for k-means-realistic
    centroid counts (thousands), where a per-centroid Catalyst expression
    tree stops being viable (VERDICT r2 #4).  Semantics are identical to
    the expression path: integer-dot argmax, ties to the LOWEST cid (cents
    arrive cid-sorted; stable argsort preserves that on equal scores)."""
    mat = np.asarray([cv for _, cv in cents], dtype=np.int64)
    ids = np.asarray([cid for cid, _ in cents], dtype=np.int64)
    bc = spark.sparkContext.broadcast((mat, ids))

    @F.pandas_udf("array<long>")
    def topn(ev: pd.Series) -> pd.Series:
        cmat, cids_ = bc.value
        vecs = np.asarray(ev.tolist(), dtype=np.int64)
        scores = vecs @ cmat.T
        order = np.argsort(-scores, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(cids_[order]))

    return topn


def ann_ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
                 n_centroids: int = 8, centroid_ids: list[int] | None = None,
                 nprobe: int = 1,
                 centroids: list[tuple[int, list[int]]] | None = None,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(qid, rank, vec_id, score) — IVF-style ANN: vectors are assigned to
    their nearest centroid (integer-dot argmax, deterministic tie-break by
    centroid index) and queries search their ``nprobe`` nearest centroids'
    inverted lists, exact rerank within.  Centroids are either a
    deterministic sample of the corpus (centroid_ids — the oracle-gated
    form) or learned vectors passed via ``centroids=`` (kmeans_centroids —
    the quality path; identical partition/search plumbing).  Raising
    nprobe is the standard IVF recall/cost dial: candidates grow ~linearly
    with probed lists; recall is measured vs brute force in tests.

    Two physical centroid-assignment strategies, same semantics:
    <= EXPR_MAX_CENTROIDS keeps a pure-JVM (score, -cid) struct-array
    expression (whole-stage codegen, DuckDB-oracle-exact); above that, a
    broadcast centroid matrix + one Arrow-batched argmax pandas UDF
    (_centroid_probe_udf) keeps plan size O(1) in centroid count."""
    if centroids is not None:
        # learned centroids (e.g. kmeans_centroids) — already quantized ints
        cents = sorted((int(c), [int(x) for x in v]) for c, v in centroids)
    else:
        cids = centroid_ids or list(range(10, 10 + n_centroids))
        cents = (emb.filter(F.col(id_col).isin(cids))
                 .select(F.col(id_col).alias("cid"),
                         _quant(F.col(vec_col)).alias("cv"))
                 .collect())
        cents = sorted(((r["cid"], r["cv"]) for r in cents))
    base = emb.select(F.col(id_col).alias("vec_id"), _quant(F.col(vec_col)).alias("ev"))

    if len(cents) <= EXPR_MAX_CENTROIDS:
        def centroid_structs(vec_c):
            # (score, -cid) structs — linear-size expression tree (a when-chain
            # fold would duplicate subtrees exponentially and send Catalyst
            # analysis into minutes); struct ordering is lexicographic, so max
            # picks the highest score and, on ties, the LOWEST cid via the
            # negated field
            cands = []
            for cid, cv in cents:
                score = None
                for i, c in enumerate(cv):
                    term = F.element_at(vec_c, i + 1) * F.lit(int(c))
                    score = term if score is None else score + term
                cands.append(F.struct(score.alias("s"), F.lit(-cid).alias("nc")))
            return F.array(*cands)

        assigned = base.withColumn(
            "centroid", -F.array_max(centroid_structs(F.col("ev")))["nc"])
        q = assigned.filter(F.col("vec_id").isin(query_ids))
        if nprobe <= 1:
            q = q.select(F.col("vec_id").alias("qid"), F.col("ev").alias("qv"),
                         F.col("centroid").alias("qcentroid"))
        else:
            # top-nprobe centroids per query: sort the (score, -cid) structs
            # descending, take nprobe, explode — one probe row per (query, list)
            probes = F.slice(F.reverse(F.array_sort(centroid_structs(F.col("ev")))),
                             1, nprobe)
            q = (q.select(F.col("vec_id").alias("qid"), F.col("ev").alias("qv"),
                          F.explode(probes).alias("_p"))
                 .select("qid", "qv", (-F.col("_p")["nc"]).alias("qcentroid")))
    else:
        assign1 = _centroid_probe_udf(emb.sparkSession, cents, 1)
        assigned = base.withColumn(
            "centroid", F.element_at(assign1(F.col("ev")), 1))
        q = assigned.filter(F.col("vec_id").isin(query_ids))
        if nprobe <= 1:
            q = q.select(F.col("vec_id").alias("qid"), F.col("ev").alias("qv"),
                         F.col("centroid").alias("qcentroid"))
        else:
            probe_n = _centroid_probe_udf(emb.sparkSession, cents, nprobe)
            q = (q.select(F.col("vec_id").alias("qid"), F.col("ev").alias("qv"),
                          F.explode(probe_n(F.col("ev"))).alias("qcentroid")))
    # a vector lives in exactly one inverted list, so probing several lists
    # never duplicates a (qid, vec_id) candidate — no distinct needed
    cand = (assigned.join(F.broadcast(q), F.col("centroid") == F.col("qcentroid"))
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id", _dot(F.col("qv"), F.col("ev")).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", F.col("rank").cast("int").alias("rank"), "vec_id", "score"))
