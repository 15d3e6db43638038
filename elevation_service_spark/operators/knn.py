"""kNN nearest-sample join via cell ring expansion (SURVEY.md §2.B joins).

Algorithm (the H3 k-ring pattern over the engine's grid cells):
1. assign every query and sample to a degree-grid cell
   (cx = floor(lon/cs), cy = floor(lat/cs));
2. ring r: explode each remaining query to its (2r+1)^2 neighbor cells and
   equi-join samples on (cx, cy) — a hash join, never a cross join;
3. a query is DONE when it has >= k candidates AND its k-th best distance
   is <= ((r-1)*cs)^2-in-degrees — the guarantee that no sample outside the
   searched rings can be closer (Chebyshev cell bound);
4. undone queries expand r (doubling); after max_ring the stragglers fall
   back to a brute-force join (correctness guarantee, tiny remainder).

Distance metric: squared degree distance (exact IEEE arithmetic, ties by
sample id) — oracle-portable.  haversine_m in kernels.py is available for
metric output but is not used for ranking here.

Scale: each iteration is one shuffle join on cell keys; remaining-query
counts shrink geometrically.  The explode factor (2r+1)^2 applies only to
still-unsatisfied queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CELL_SIZE_DEG = 0.25


def with_cells(df: DataFrame, cs: float = CELL_SIZE_DEG) -> DataFrame:
    return (df.withColumn("cx", F.floor(F.col("lon") / F.lit(cs)).cast("long"))
            .withColumn("cy", F.floor(F.col("lat") / F.lit(cs)).cast("long")))


def _ring_offsets(r: int):
    return [(dx, dy) for dx in range(-r, r + 1) for dy in range(-r, r + 1)]


def _candidates(queries: DataFrame, samples: DataFrame, r: int) -> DataFrame:
    """queries exploded to ring-r neighbor cells, hash-joined to samples."""
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in _ring_offsets(r)])
    q = (queries.withColumn("_o", F.explode(offs))
         .select("qid", F.col("lat").alias("qlat"), F.col("lon").alias("qlon"),
                 (F.col("cx") + F.col("_o.dx")).alias("cx"),
                 (F.col("cy") + F.col("_o.dy")).alias("cy")))
    s = samples.select("sid", F.col("lat").alias("slat"),
                       F.col("lon").alias("slon"), "cx", "cy")
    d2 = ((F.col("qlat") - F.col("slat")) * (F.col("qlat") - F.col("slat"))
          + (F.col("qlon") - F.col("slon")) * (F.col("qlon") - F.col("slon")))
    return q.join(s, ["cx", "cy"]).select("qid", "sid", d2.alias("d2"))


def _topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("sid").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", F.col("rank").cast("int").alias("rank"), "sid", "d2"))


def knn_join(queries: DataFrame, samples: DataFrame, k: int,
             cs: float = CELL_SIZE_DEG, init_ring: int = 1,
             max_ring: int = 8) -> DataFrame:
    """(qid, rank, sid, d2) — exact k nearest samples per query.

    queries: (qid, lat, lon); samples: (sid, lat, lon).
    """
    q = with_cells(queries.select("qid", "lat", "lon"), cs)
    s = with_cells(samples.select("sid", "lat", "lon"), cs).cache()
    remaining = q
    results = []
    r = init_ring
    while r <= max_ring:
        cand = _candidates(remaining, s, r)
        top = _topk(cand, k).cache()
        # done := k candidates AND k-th distance within the ring guarantee:
        # any unsearched sample is in a cell at Chebyshev >= r+1, hence at
        # degree distance >= r*cs from anywhere in the query's cell
        bound = (r * cs) ** 2
        kth = top.groupBy("qid").agg(F.count(F.lit(1)).alias("n"),
                                     F.max("d2").alias("kth_d2"))
        done_ids = kth.filter((F.col("n") >= k) & (F.col("kth_d2") <= F.lit(bound)))
        results.append(top.join(done_ids.select("qid"), "qid", "left_semi"))
        remaining = remaining.join(done_ids.select("qid"), "qid", "left_anti")
        if remaining.isEmpty():
            remaining = None
            break
        r *= 2
    if remaining is not None and not remaining.isEmpty():
        # brute-force fallback for stragglers (sparse regions)
        qq = remaining.select("qid", F.col("lat").alias("qlat"), F.col("lon").alias("qlon"))
        ss = s.select("sid", F.col("lat").alias("slat"), F.col("lon").alias("slon"))
        d2 = ((F.col("qlat") - F.col("slat")) * (F.col("qlat") - F.col("slat"))
              + (F.col("qlon") - F.col("slon")) * (F.col("qlon") - F.col("slon")))
        results.append(_topk(qq.crossJoin(ss).select("qid", "sid", d2.alias("d2")), k))
    out = results[0]
    for extra in results[1:]:
        out = out.unionByName(extra)
    return out
