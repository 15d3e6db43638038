"""Point-in-polygon assignment (SURVEY.md §2.B joins: theta join).

Physical plan: broadcast the (small) polygon set — parsed rings as numpy
arrays — then one mapInPandas pass over the points with a bbox prefilter
and the exact even-odd ray-cast kernel (kernels.point_in_polygon) per
candidate polygon.  Zero shuffle of the points table.

For very large polygon sets the same kernel runs behind a cell-bucketed
range join (bbox cells x point cells) instead of a broadcast — the
broadcast path is the working-set case, like tile lookup.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import kernels


def _parse_polygons(rows) -> list[tuple]:
    """[(poly_id, minx, miny, maxx, maxy, [rings as np arrays])]"""
    out = []
    for r in rows:
        gj = json.loads(r["geojson"])
        if gj["type"] == "Polygon":
            polys = [gj["coordinates"]]
        elif gj["type"] == "MultiPolygon":
            polys = gj["coordinates"]
        else:
            raise ValueError(f"not a polygon: {gj['type']}")
        rings = [[np.asarray(ring, dtype=np.float64) for ring in poly]
                 for poly in polys]
        out.append((r["poly_id"], float(r["minx"]), float(r["miny"]),
                    float(r["maxx"]), float(r["maxy"]), rings))
    return out


def pip_assign(points: DataFrame, polygons: DataFrame,
               id_cols: tuple[str, ...] = ("pid",)) -> DataFrame:
    """(id_cols..., lat, lon, poly_id) — one output row per (point,
    containing polygon); points outside every polygon produce no rows
    (inner-join semantics).  polygons: (poly_id, geojson, minx, miny,
    maxx, maxy)."""
    spark = points.sparkSession
    polys = _parse_polygons(polygons.collect())
    bc = spark.sparkContext.broadcast(polys)
    out_fields = ([points.schema[c] for c in id_cols]
                  + [T.StructField("lat", T.DoubleType(), False),
                     T.StructField("lon", T.DoubleType(), False),
                     T.StructField("poly_id", T.StringType(), False)])
    schema = T.StructType(out_fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        items = bc.value
        for pdf in batches:
            lat = pdf["lat"].to_numpy(np.float64)
            lon = pdf["lon"].to_numpy(np.float64)
            frames = []
            for poly_id, minx, miny, maxx, maxy, multi in items:
                # bbox prefilter (the range-join condition)
                m = (lon >= minx) & (lon <= maxx) & (lat >= miny) & (lat <= maxy)
                if not m.any():
                    continue
                idx = np.nonzero(m)[0]
                inside = np.zeros(len(idx), dtype=bool)
                for rings in multi:  # MultiPolygon: any member polygon
                    inside |= kernels.point_in_polygon(lat[idx], lon[idx], rings)
                hit = idx[inside]
                if len(hit):
                    sub = pdf.iloc[hit][list(id_cols)].copy()
                    sub["lat"] = lat[hit]
                    sub["lon"] = lon[hit]
                    sub["poly_id"] = poly_id
                    frames.append(sub)
            if frames:
                yield pd.concat(frames, ignore_index=True)
            else:
                yield pd.DataFrame({f.name: pd.Series(dtype=object) for f in schema.fields})

    return points.select(*id_cols, "lat", "lon").mapInPandas(gen, schema)


def _rings_col():
    """Parsed-ring Column over a ``geojson`` string column:
    array<array<array<array<double>>>> (MultiPolygon-normalized:
    polys -> rings -> positions -> [lon, lat]).  Pure JVM json parse."""
    from pyspark.sql import functions as F
    typ = F.get_json_object(F.col("geojson"), "$.type")
    coords = F.get_json_object(F.col("geojson"), "$.coordinates")
    as_poly = F.from_json(coords, "array<array<array<double>>>")
    as_multi = F.from_json(coords, "array<array<array<array<double>>>>")
    return F.when(typ == F.lit("Polygon"), F.array(as_poly)).otherwise(as_multi)


def polygon_cells(polygons: DataFrame, cell_deg: float = 1.0) -> DataFrame:
    """Explode each polygon to the degree-grid cells covering its bbox —
    a pure DataFrame transform (JVM json parse + sequence/explode), with the
    parsed ring geometry carried as a nested-array column.  No driver
    collect, no global broadcast: the polygon table can be arbitrarily
    large.  Output: (poly_id, minx, miny, maxx, maxy, rings, cx, cy) where
    rings is array<array<array<array<double>>>> (MultiPolygon-normalized:
    polys -> rings -> positions -> [lon, lat])."""
    from pyspark.sql import functions as F
    cell = F.lit(float(cell_deg))
    return (polygons
            .select("poly_id", "minx", "miny", "maxx", "maxy",
                    _rings_col().alias("rings"))
            .withColumn("cx", F.explode(F.sequence(
                F.floor(F.col("minx") / cell).cast("long"),
                F.floor(F.col("maxx") / cell).cast("long"))))
            .withColumn("cy", F.explode(F.sequence(
                F.floor(F.col("miny") / cell).cast("long"),
                F.floor(F.col("maxy") / cell).cast("long")))))


RING_CACHE_MAX_BYTES = int(__import__("os").environ.get(
    "SPARK_GRAFT_RING_CACHE_BYTES", str(256 << 20)))


class _RingCache:
    """PER-TASK parsed-ring LRU, bounded by total vertex bytes (ADVICE r3:
    the unbounded dict held one vertex-array copy per distinct poly_id a
    long-lived task ever saw).  Deliberately NOT worker-global: a reused
    Python worker outlives the job, and a module-level cache keyed by
    poly_id would serve STALE geometry to a later job that reuses ids with
    different rings (the same hazard lookup._cached_grid documents; rings
    are too large to content-hash cheaply, so scope beats keying here).
    One task sees one job's polygons, and the payoff — reuse across the
    many Arrow batches of a task — is preserved.  Byte total is maintained
    incrementally (a full rescan per miss is O(polygons²))."""

    def __init__(self, max_bytes: int = RING_CACHE_MAX_BYTES):
        from collections import OrderedDict
        self._d: OrderedDict[str, tuple[list, int]] = OrderedDict()
        self._bytes = 0
        self._max = max_bytes

    def get(self, poly_id: str, raw_rings) -> list:
        ent = self._d.get(poly_id)
        if ent is not None:
            self._d.move_to_end(poly_id)
            return ent[0]
        multi = [[np.asarray([list(pos) for pos in ring], np.float64)
                  for ring in poly]
                 for poly in raw_rings]
        nb = sum(a.nbytes for poly in multi for a in poly)
        self._d[poly_id] = (multi, nb)
        self._bytes += nb
        while self._bytes > self._max and len(self._d) > 1:
            _, (_, evb) = self._d.popitem(last=False)
            self._bytes -= evb
        return multi


#: "auto" dial: a chunk carries at least this many points per ring VERTEX
#: before it is worth paying another ring re-ship + task dispatch (the
#: interval-stabbing kernel is ~O(pts·log V) per chunk while each extra
#: chunk re-ships the O(V) ring and re-parses it once per task).
#: 4 measured r7 (alternating quiet A/B, exec-s): on the adversarial
#: 10k-vertex x 200k-candidate shape, factor 2 split 8->16 chunks and
#: paid 27.1 s vs static-8's 24.5; factor 4 leaves that shape unsplit
#: (20.5 vs 20.7 — identical), engaging the split only when a group's
#: candidates exceed 4x its ring size (where static-32's regime begins:
#: measured 34-42 s for over-split vs 24.5 at the same load).
PIP_AUTO_RING_FACTOR = int(__import__("os").environ.get(
    "SPARK_GRAFT_PIP_AUTO_RING_FACTOR", "4"))
#: "auto" dial: never split below this many points per chunk — byte-light
#: tasks pay 2-4x their kernel time in dispatch overhead (r5 measurement).
PIP_AUTO_MIN_CHUNK = int(__import__("os").environ.get(
    "SPARK_GRAFT_PIP_AUTO_MIN_CHUNK", "1024"))


def pip_assign_bucketed(points: DataFrame, polygons: DataFrame,
                        id_cols: tuple[str, ...] = ("pid",),
                        cell_deg: float = 1.0,
                        shards_per_cell: int | str = "auto") -> DataFrame:
    """Range-join formulation for LARGE polygon sets (SURVEY.md §2.B
    interval/range): polygons explode to the degree-grid cells covering
    their bbox (polygon_cells — a distributed transform), points carry
    their cell, and the bbox prefilter becomes a hash equi-join on the
    cell key.  Same output as pip_assign.

    Geometry transport (VERDICT r3 #1): the candidate join uses a SLIM
    (poly_id, bbox, cx, cy) cell table — ring arrays are NOT attached to
    candidate point rows (the r3 form shipped the full vertex array once
    per candidate row: O(candidates x vertices) shuffle bytes; a
    10^4-vertex polygon x 10^6 candidate points moved ~10^10 doubles).
    Instead candidates are aggregated per (poly_id, cell, shard) into
    point arrays (collect_list — one map-side-combined shuffle of just
    the point coords), the ring geometry joins onto those GROUP rows, and
    one mapInPandas verifies each group with the exact ray-cast kernel.

    ``shards_per_cell`` (VERDICT r6 task 3 — the static dial flipped
    twice: r5 measured 8 shards beating 32, the r6 window measured the
    reverse): the default ``"auto"`` derives the split at RUNTIME from
    each group's measured candidate count instead of a constant.  The
    pre-aggregate hash shard stays at 8 (the hot-cell memory guard and
    the floor parallelism), and after the aggregate each group's point
    array is sub-split JVM-side into chunks of
    ``max(PIP_AUTO_MIN_CHUNK, PIP_AUTO_RING_FACTOR·V)`` points (V = the
    polygon's vertex count, read off the joined ring column), capped at
    ``defaultParallelism`` chunks per group.  Small groups keep the
    fuller-groups-win r5 plan unchanged; a group whose measured
    candidates dwarf its ring cost gains parallelism exactly in
    proportion, because each extra chunk pays one O(V) ring re-ship +
    task dispatch for ~chunk·log V of kernel work.  An integer value
    pins the legacy static behavior — bench rows pip_bucketed_big
    (auto), _shards8 and _shards32 (static controls) measure all three.
    Ring bytes cross the shuffle O(polygons x cells x chunks) —
    independent of candidate count.  The pre-agg shard bounds any one
    group's point array to ~cell_points/8 (hot-cell OOM guard, same
    idea as knn's sharded top-k); the JVM-side bbox filter runs before
    the aggregation so never-candidates don't even enter the groups.

    End-to-end distributed: geometry never touches the driver and is
    never globally broadcast."""
    from pyspark.sql import functions as F
    geom = polygons.select("poly_id", _rings_col().alias("rings"))
    slim = polygon_cells(polygons, cell_deg).select(
        "poly_id", "minx", "miny", "maxx", "maxy", "cx", "cy")
    cell = F.lit(float(cell_deg))
    pts = (points.select(*id_cols, "lat", "lon")
           .withColumn("cx", F.floor(F.col("lon") / cell).cast("long"))
           .withColumn("cy", F.floor(F.col("lat") / cell).cast("long")))
    # a point lies in exactly one cell and a polygon covers each cell once,
    # so the join emits each candidate (point, polygon) pair exactly once;
    # the bbox test is the JVM-side range-join residual predicate
    cand = (pts.join(slim, ["cx", "cy"])
            .filter((F.col("lon") >= F.col("minx")) & (F.col("lon") <= F.col("maxx"))
                    & (F.col("lat") >= F.col("miny")) & (F.col("lat") <= F.col("maxy"))))
    auto = shards_per_cell == "auto"
    shard = F.pmod(F.hash("lat", "lon"),
                   F.lit(8 if auto else int(shards_per_cell)))
    # the LAST exchange before the kernel must spread on the FULL group
    # key: group rows are tiny in BYTES (point arrays) but heavy in
    # ray-cast COMPUTE, and both AQE's byte-based partition coalescing and
    # the geom join's hash-on-poly_id-only partitioning otherwise pack the
    # shards of one polygon into a single task and run them serially
    # (measured 25-30 s for a job whose groups total ~2 s of parallel
    # kernel work).  An explicit-count exchange is exempt from AQE
    # coalescing; RANGE partitioning (leading with _shard) beats a hash
    # spread here because with few groups hash collisions stack 2-3
    # groups per task while the sampled ranges land ~one group each
    # (measured 4.8 s vs 8.1 s on the 10k-vertex x 200k-candidate shape);
    # the sampling pass runs on the already-aggregated O(groups) rows.
    # Ring bytes cross this exchange once per group — still O(groups),
    # never per candidate.
    spark = points.sparkSession
    cores = spark.sparkContext.defaultParallelism
    # NOTE (r7, measured): do NOT localCheckpoint here to save
    # repartitionByRange's sampling re-execution of the upstream — the
    # eager materialization of the grouped rows (rings per row) measured
    # STRICTLY worse on every dial (static-8: 34 vs 17-21 exec-s;
    # static-32: 61 vs 24-30) because the checkpoint job serializes what
    # the sampler overlaps.
    grouped = (cand
               .groupBy("poly_id", "cx", "cy", shard.alias("_shard"))
               .agg(F.collect_list(F.struct(*id_cols, "lat", "lon")).alias("_pts"))
               .join(geom, "poly_id"))
    if auto:
        # runtime dial: sub-split each group's MEASURED point array into
        # chunks worth their ring re-ship.  All-JVM (size/ceil/sequence/
        # slice/posexplode); each stage lands as a real column via chained
        # selects (no HOF-in-HOF re-evaluation, per the winnow lesson).
        n_vert = F.aggregate(
            F.col("rings"), F.lit(0),
            lambda acc, poly: acc + F.aggregate(
                poly, F.lit(0), lambda a, ring: a + F.size(ring)))
        grouped = (grouped
                   .withColumn("_chunk_pts", F.greatest(
                       F.lit(PIP_AUTO_MIN_CHUNK),
                       n_vert * F.lit(PIP_AUTO_RING_FACTOR)))
                   .withColumn("_n_chunks", F.greatest(F.lit(1), F.least(
                       F.ceil(F.size("_pts") / F.col("_chunk_pts")),
                       F.lit(cores))).cast("int"))
                   .withColumn("_per", F.ceil(
                       F.size("_pts") / F.col("_n_chunks")).cast("int")))
        grouped = (grouped
                   .select("poly_id", "cx", "cy", "_shard", "rings",
                           F.posexplode(F.transform(
                               F.sequence(F.lit(1), F.col("_n_chunks")),
                               lambda i: F.slice(
                                   "_pts",
                                   (i - F.lit(1)) * F.col("_per") + F.lit(1),
                                   F.col("_per"))))
                           .alias("_pos", "_pts"))
                   # ceil arithmetic can leave a trailing empty slice for
                   # adversarial (n, chunk) combinations — drop, don't kernel
                   .filter(F.size("_pts") > 0))
        grouped = grouped.repartitionByRange(
            cores, "_shard", "cx", "cy", "poly_id", "_pos")
    else:
        grouped = grouped.repartitionByRange(
            cores, "_shard", "cx", "cy", "poly_id")

    schema = T.StructType([points.schema[c] for c in id_cols]
                          + [T.StructField("lat", T.DoubleType(), False),
                             T.StructField("lon", T.DoubleType(), False),
                             T.StructField("poly_id", T.StringType(), False)])
    empty = {f.name: pd.Series(dtype="float64" if isinstance(f.dataType, T.DoubleType)
                               else object) for f in schema.fields}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache = _RingCache()  # per-task: amortizes parses across batches
        for pdf in batches:
            frames = []
            for pid_, rows, raw_rings in zip(pdf["poly_id"], pdf["_pts"], pdf["rings"]):
                multi = cache.get(pid_, raw_rings)
                grp = pd.DataFrame(list(rows))
                la = grp["lat"].to_numpy(np.float64)
                lo = grp["lon"].to_numpy(np.float64)
                inside = np.zeros(len(grp), dtype=bool)
                for rings in multi:  # MultiPolygon: any member polygon
                    inside |= kernels.point_in_polygon(la, lo, rings)
                if inside.any():
                    sub = grp.loc[inside, list(id_cols) + ["lat", "lon"]].copy()
                    sub["poly_id"] = pid_
                    frames.append(sub)
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(empty))

    return grouped.mapInPandas(gen, schema)


def polygon_oversize_report(polygons: DataFrame, cell_deg: float = 1.0,
                            max_cells: int = 1024) -> DataFrame:
    """(poly_id, n_cells, minx, miny, maxx, maxy) — polygons whose bbox
    covers more than ``max_cells`` grid cells at ``cell_deg`` (VERDICT r3
    #6: a continent-bbox polygon at cell_deg=1 explodes to thousands of
    covering-cell rows in pip_assign_bucketed).  Pure closed-form Column
    arithmetic on the bbox — no explode, no Python — so the report is
    O(polygons) however oversize the worst bbox is; mirrors
    dedup.lsh_oversize_buckets as the observable-dropped/exploded-mass
    audit.  Feed flagged polygons a coarser cell_deg or split them before
    the bucketed join."""
    from pyspark.sql import functions as F
    cell = F.lit(float(cell_deg))
    ncx = (F.floor(F.col("maxx") / cell).cast("long")
           - F.floor(F.col("minx") / cell).cast("long") + 1)
    ncy = (F.floor(F.col("maxy") / cell).cast("long")
           - F.floor(F.col("miny") / cell).cast("long") + 1)
    return (polygons
            .select("poly_id", (ncx * ncy).alias("n_cells"),
                    "minx", "miny", "maxx", "maxy")
            .filter(F.col("n_cells") > max_cells))
