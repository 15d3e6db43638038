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


def pip_assign_bucketed(points: DataFrame, polygons: DataFrame,
                        id_cols: tuple[str, ...] = ("pid",),
                        cell_deg: float = 1.0) -> DataFrame:
    """Range-join formulation for LARGE polygon sets (SURVEY.md §2.B
    interval/range): polygons explode to the degree-grid cells covering
    their bbox, points carry their cell — the bbox prefilter becomes a hash
    equi-join on the cell key instead of a broadcast, then the exact
    ray-cast kernel verifies candidates.  Same output as pip_assign."""
    import math as _math
    from pyspark.sql import functions as F
    spark = points.sparkSession
    polys = _parse_polygons(polygons.collect())

    # polygon -> covering cells (driver-side: polygon count is the big-table
    # case only relative to broadcast payload; the cell explosion itself is
    # tiny rows). For truly huge polygon tables this same explode runs as a
    # DataFrame transform over the polygon table.
    cell_rows = []
    for i, (poly_id, minx, miny, maxx, maxy, _rings) in enumerate(polys):
        for cx in range(_math.floor(minx / cell_deg), _math.floor(maxx / cell_deg) + 1):
            for cy in range(_math.floor(miny / cell_deg), _math.floor(maxy / cell_deg) + 1):
                cell_rows.append((poly_id, i, cx, cy))
    cells = spark.createDataFrame(cell_rows, ["poly_id", "_poly_idx", "cx", "cy"])

    pts = (points.select(*id_cols, "lat", "lon")
           .withColumn("cx", F.floor(F.col("lon") / F.lit(cell_deg)).cast("long"))
           .withColumn("cy", F.floor(F.col("lat") / F.lit(cell_deg)).cast("long")))
    cand = pts.join(cells, ["cx", "cy"]).drop("cx", "cy")

    bc = spark.sparkContext.broadcast([(p[1], p[2], p[3], p[4], p[5]) for p in polys])
    schema = T.StructType([cand.schema[c] for c in id_cols]
                          + [T.StructField("lat", T.DoubleType(), False),
                             T.StructField("lon", T.DoubleType(), False),
                             T.StructField("poly_id", T.StringType(), False)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        meta = bc.value
        for pdf in batches:
            lat = pdf["lat"].to_numpy(np.float64)
            lon = pdf["lon"].to_numpy(np.float64)
            keep = np.zeros(len(pdf), dtype=bool)
            for pi, grp in pdf.groupby("_poly_idx").indices.items():
                minx, miny, maxx, maxy, multi = meta[pi]
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
            out = pdf.loc[keep, list(id_cols) + ["lat", "lon", "poly_id"]]
            yield out

    return cand.mapInPandas(gen, schema)
