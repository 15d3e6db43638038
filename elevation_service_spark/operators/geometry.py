"""Exact polygon geometry statistics (spatial-surface widening, r6).

``polygon_stats`` computes per-polygon ring/vertex counts and the exact
shoelace area on an integer coordinate lattice — the audit/validation
stage a spatial pipeline runs before PIP joins (degenerate rings, zero
areas, hole bookkeeping).  Everything is pure Column arithmetic: the
GeoJSON parse is the same JVM ``from_json`` as the PIP operators
(pip._rings_col), the per-ring shoelace is ONE ``aggregate`` HOF over an
index sequence (no Python, no Window), and the per-polygon reduction is
one map-side-combined groupBy.  At 100 TB the plan is scan → explode
(rings, O(rings) rows) → partial agg — no other shuffle.

Exactness: coordinates are snapped to an integer lattice via
``round(coord * scale)`` and every subsequent op (products, sums, abs)
is int64, so the DuckDB oracle replays the identical integers; no float
comparison anywhere.  The standard GeoJSON convention applies: ring 0 is
the outer boundary (area added), rings 1+ are holes (area subtracted);
area2 is TWICE the enclosed area in lattice units (the shoelace sum
without the final /2, which would leave the integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def polygon_stats(polygons: DataFrame, scale: float = 1.0) -> DataFrame:
    """(poly_id, n_polys, n_rings, n_vertices, area2) — n_vertices counts
    raw positions including each ring's closing duplicate; area2 =
    sum over member polygons of (|shoelace(outer)| - sum |shoelace(hole)|)
    on the round(coord * scale) integer lattice.

    Input: (poly_id, geojson) with Polygon or MultiPolygon documents.
    Rings must be closed (first position repeated last), the GeoJSON
    norm; the shoelace loop runs positions 1..n-1 against their
    successors, which covers the closing edge exactly once."""
    from .pip import _rings_col
    sc = F.lit(float(scale))
    rings = (polygons
             .select("poly_id", _rings_col().alias("_polys"))
             .select("poly_id", F.posexplode("_polys").alias("poly_idx", "_rings"))
             .select("poly_id", "poly_idx",
                     F.posexplode("_rings").alias("ring_idx", "ring")))
    # stage the lattice coords as REAL columns before the aggregate HOF
    # consumes them (array-expression re-eval lesson, CLAUDE.md)
    staged = rings.select(
        "poly_id", "poly_idx", "ring_idx",
        F.size("ring").alias("n_pos"),
        F.transform("ring", lambda p: F.round(p[0] * sc).cast("long")).alias("xs"),
        F.transform("ring", lambda p: F.round(p[1] * sc).cast("long")).alias("ys"))
    # guard the index walk: for a malformed 0/1-position ring,
    # sequence(1, size-1) DESCENDS through index 0 and element_at(xs, 0)
    # throws under Spark 4 ANSI — the audit pass must surface degenerate
    # rings as zero-area rows, never abort the job (ADVICE r6)
    shoelace = F.aggregate(
        F.sequence(F.lit(1), F.size("xs") - F.lit(1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.element_at(F.col("xs"), i) * F.element_at(F.col("ys"), i + F.lit(1))
        - F.element_at(F.col("xs"), i + F.lit(1)) * F.element_at(F.col("ys"), i))
    cross = F.when(F.size("xs") >= 2, shoelace).otherwise(F.lit(0).cast("long"))
    per_ring = staged.select(
        "poly_id", "poly_idx", "ring_idx", "n_pos",
        F.when(F.col("ring_idx") == 0, F.abs(cross))
         .otherwise(-F.abs(cross)).alias("contrib"))
    # poly_idx is a DENSE posexplode index, so max+1 == countDistinct but
    # needs no distinct pre-shuffle: ONE exchange instead of two
    return (per_ring.groupBy("poly_id")
            .agg((F.max("poly_idx") + 1).cast("long").alias("n_polys"),
                 F.count(F.lit(1)).cast("long").alias("n_rings"),
                 F.sum("n_pos").cast("long").alias("n_vertices"),
                 F.sum("contrib").cast("long").alias("area2")))
