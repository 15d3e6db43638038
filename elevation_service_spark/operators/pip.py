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
