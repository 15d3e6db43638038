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


def polygon_cells(polygons: DataFrame, cell_deg: float = 1.0) -> DataFrame:
    """Explode each polygon to the degree-grid cells covering its bbox —
    a pure DataFrame transform (JVM json parse + sequence/explode), with the
    parsed ring geometry carried as a nested-array column.  No driver
    collect, no global broadcast: the polygon table can be arbitrarily
    large.  Output: (poly_id, minx, miny, maxx, maxy, rings, cx, cy) where
    rings is array<array<array<array<double>>>> (MultiPolygon-normalized:
    polys -> rings -> positions -> [lon, lat])."""
    from pyspark.sql import functions as F
    typ = F.get_json_object(F.col("geojson"), "$.type")
    coords = F.get_json_object(F.col("geojson"), "$.coordinates")
    as_poly = F.from_json(coords, "array<array<array<double>>>")
    as_multi = F.from_json(coords, "array<array<array<array<double>>>>")
    rings = F.when(typ == F.lit("Polygon"), F.array(as_poly)).otherwise(as_multi)
    cell = F.lit(float(cell_deg))
    return (polygons
            .select("poly_id", "minx", "miny", "maxx", "maxy",
                    rings.alias("rings"))
            .withColumn("cx", F.explode(F.sequence(
                F.floor(F.col("minx") / cell).cast("long"),
                F.floor(F.col("maxx") / cell).cast("long"))))
            .withColumn("cy", F.explode(F.sequence(
                F.floor(F.col("miny") / cell).cast("long"),
                F.floor(F.col("maxy") / cell).cast("long")))))


def pip_assign_bucketed(points: DataFrame, polygons: DataFrame,
                        id_cols: tuple[str, ...] = ("pid",),
                        cell_deg: float = 1.0) -> DataFrame:
    """Range-join formulation for LARGE polygon sets (SURVEY.md §2.B
    interval/range): polygons explode to the degree-grid cells covering
    their bbox (polygon_cells — a distributed transform), points carry
    their cell, the bbox prefilter becomes a hash equi-join on the cell
    key, and the exact ray-cast kernel verifies candidates inside
    mapInPandas with the ring arrays delivered through the join row.

    End-to-end distributed: geometry never touches the driver and is never
    globally broadcast (it crosses the shuffle once per covering cell, and
    once per candidate point-pair row in the join output — bounded, unlike
    an O(total-vertices) driver collect).  Same output as pip_assign."""
    from pyspark.sql import functions as F
    cells = polygon_cells(polygons, cell_deg)
    cell = F.lit(float(cell_deg))
    pts = (points.select(*id_cols, "lat", "lon")
           .withColumn("cx", F.floor(F.col("lon") / cell).cast("long"))
           .withColumn("cy", F.floor(F.col("lat") / cell).cast("long")))
    # a point lies in exactly one cell and a polygon covers each cell once,
    # so the join emits each candidate (point, polygon) pair exactly once
    cand = pts.join(cells, ["cx", "cy"]).drop("cx", "cy")

    schema = T.StructType([cand.schema[c] for c in id_cols]
                          + [T.StructField("lat", T.DoubleType(), False),
                             T.StructField("lon", T.DoubleType(), False),
                             T.StructField("poly_id", T.StringType(), False)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parsed: dict[str, list] = {}  # per-worker ring-array cache
        for pdf in batches:
            lat = pdf["lat"].to_numpy(np.float64)
            lon = pdf["lon"].to_numpy(np.float64)
            keep = np.zeros(len(pdf), dtype=bool)
            for pid_, grp in pdf.groupby("poly_id").indices.items():
                row0 = int(grp[0])
                multi = parsed.get(pid_)
                if multi is None:
                    multi = [[np.asarray([list(pos) for pos in ring], np.float64)
                              for ring in poly]
                             for poly in pdf["rings"].iloc[row0]]
                    parsed[pid_] = multi
                minx = float(pdf["minx"].iloc[row0])
                miny = float(pdf["miny"].iloc[row0])
                maxx = float(pdf["maxx"].iloc[row0])
                maxy = float(pdf["maxy"].iloc[row0])
                la, lo = lat[grp], lon[grp]
                m = (lo >= minx) & (lo <= maxx) & (la >= miny) & (la <= maxy)
                inside = np.zeros(len(grp), dtype=bool)
                if m.any():
                    sub = np.nonzero(m)[0]
                    hit = np.zeros(len(sub), dtype=bool)
                    for rings in multi:
                        hit |= kernels.point_in_polygon(la[sub], lo[sub], rings)
                    inside[sub] = hit
                keep[grp[inside]] = True
            yield pdf.loc[keep, list(id_cols) + ["lat", "lon", "poly_id"]]

    return cand.mapInPandas(gen, schema)
