"""Driver-contract queries for the spatial join surface: kNN ring-expansion
join and point-in-polygon assignment, each with a brute-force DuckDB oracle
(exact same IEEE distance/crossing arithmetic)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from . import fixtures
from .operators.knn import knn_join
from .operators.pip import pip_assign
from .queries import LAT_SQL, LON_SQL, load

KNN_K = 5

# queries derive from supplier the same way samples derive from customer
_Q_LAT_SQL = LAT_SQL.replace("c_custkey", "s_suppkey").replace("7919", "6151")
_Q_LON_SQL = LON_SQL.replace("c_custkey", "s_suppkey").replace("104729", "9973")


def q_knn(spark, sf_dir):
    """k nearest elevation samples per query point via cell ring expansion
    (exact: ring guarantee + brute-force fallback)."""
    samples = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("sid"),
        F.expr(LAT_SQL).alias("lat"), F.expr(LON_SQL).alias("lon"))
    queries = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("qid"),
        F.expr(_Q_LAT_SQL).alias("lat"), F.expr(_Q_LON_SQL).alias("lon"))
    return knn_join(queries, samples, KNN_K)


_KNN_ORACLE = f"""WITH samples AS (
  SELECT c_custkey AS sid, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM customer),
queries AS (
  SELECT s_suppkey AS qid, {_Q_LAT_SQL} AS lat, {_Q_LON_SQL} AS lon FROM supplier),
scored AS (
  SELECT q.qid, s.sid,
    (q.lat - s.lat) * (q.lat - s.lat) + (q.lon - s.lon) * (q.lon - s.lon) AS d2
  FROM queries q, samples s)
SELECT qid, CAST(rank AS INT) AS rank, sid, d2 FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d2, sid) AS rank
  FROM scored) t
WHERE rank <= {KNN_K}"""


def _polygons_df(spark):
    rows = fixtures.polygons_rows()
    return spark.createDataFrame(
        [(r["poly_id"], r["geojson"], r["minx"], r["miny"], r["maxx"], r["maxy"])
         for r in rows],
        ["poly_id", "geojson", "minx", "miny", "maxx", "maxy"])


def q_pip(spark, sf_dir):
    """Point-in-polygon assignment of tile-derived points to the fixture
    polygon set (bbox prefilter + exact ray cast)."""
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pid"),
        F.expr(LAT_SQL).alias("lat"), F.expr(LON_SQL).alias("lon"))
    return pip_assign(pts, _polygons_df(spark))


def _pip_assign_cte(pts_cte: str) -> str:
    """Exact ray-cast PIP of an arbitrary ``pts`` CTE (pid, lat, lon)
    against the fixture polygon edge table; yields the ``par`` CTE whose
    inside predicate is outer_par = 1 AND hole_par = 0."""
    edges = []
    for r in fixtures.polygons_rows():
        rings = json.loads(r["geojson"])["coordinates"]
        for ri, ring in enumerate(rings):
            for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
                edges.append(f"('{r['poly_id']}', {ri}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    values = ",\n  ".join(edges)
    return f"""WITH {pts_cte},
edges(poly_id, ring_idx, x1, y1, x2, y2) AS (VALUES
  {values}),
cr AS (
  SELECT p.pid, p.lat, p.lon, e.poly_id, e.ring_idx,
    CASE WHEN (e.y1 > p.lat) <> (e.y2 > p.lat)
          AND p.lon < ((e.x2 - e.x1) * (p.lat - e.y1)) / (e.y2 - e.y1) + e.x1
         THEN 1 ELSE 0 END AS c
  FROM pts p, edges e),
par AS (
  SELECT pid, lat, lon, poly_id,
    sum(CASE WHEN ring_idx = 0 THEN c ELSE 0 END) % 2 AS outer_par,
    sum(CASE WHEN ring_idx > 0 THEN c ELSE 0 END) % 2 AS hole_par
  FROM cr GROUP BY pid, lat, lon, poly_id)"""


def _pip_oracle() -> str:
    pts = (f"pts AS (\n  SELECT c_custkey AS pid, {LAT_SQL} AS lat, "
           f"{LON_SQL} AS lon FROM customer)")
    return (_pip_assign_cte(pts)
            + "\nSELECT pid, lat, lon, poly_id FROM par"
              " WHERE outer_par = 1 AND hole_par = 0")


def q_pip_bucketed(spark, sf_dir):
    """Same PIP semantics through the cell-bucketed range-join plan (the
    large-polygon-set strategy) — must match the identical oracle as q_pip."""
    from .operators.pip import pip_assign_bucketed
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pid"),
        F.expr(LAT_SQL).alias("lat"), F.expr(LON_SQL).alias("lon"))
    return pip_assign_bucketed(pts, _polygons_df(spark))


# polygon bboxes derived from customer keys; every 10th is continent-sized
_PO_LON0 = "CAST((c_custkey * 53) % 300 AS DOUBLE) - CAST(150 AS DOUBLE)"
_PO_LAT0 = "CAST((c_custkey * 37) % 140 AS DOUBLE) - CAST(70 AS DOUBLE)"
_PO_HALF = ("CASE WHEN c_custkey % 10 = 0 THEN CAST(25.0 AS DOUBLE) "
            "ELSE CAST(0.4 AS DOUBLE) END")
_PO_MAX_CELLS = 1024


def q_pip_oversize(spark, sf_dir):
    """Covering-cell explosion report (r4, mirrors lsh_oversize): polygons
    whose bbox would fan out to >max_cells rows in the bucketed PIP join
    are surfaced BEFORE the explode — closed-form bbox arithmetic, no
    Generate in the plan however big the worst bbox is."""
    from .operators.pip import polygon_oversize_report
    polys = load(spark, sf_dir, "customer").select(
        F.concat(F.lit("P"), F.col("c_custkey").cast("string")).alias("poly_id"),
        (F.expr(_PO_LON0) - F.expr(_PO_HALF)).alias("minx"),
        (F.expr(_PO_LAT0) - F.expr(_PO_HALF)).alias("miny"),
        (F.expr(_PO_LON0) + F.expr(_PO_HALF)).alias("maxx"),
        (F.expr(_PO_LAT0) + F.expr(_PO_HALF)).alias("maxy"))
    return polygon_oversize_report(polys, cell_deg=1.0,
                                   max_cells=_PO_MAX_CELLS)


_PIP_OVERSIZE_ORACLE = f"""WITH p AS (
  SELECT 'P' || CAST(c_custkey AS VARCHAR) AS poly_id,
         ({_PO_LON0}) - ({_PO_HALF}) AS minx,
         ({_PO_LAT0}) - ({_PO_HALF}) AS miny,
         ({_PO_LON0}) + ({_PO_HALF}) AS maxx,
         ({_PO_LAT0}) + ({_PO_HALF}) AS maxy
  FROM customer),
r AS (
  SELECT poly_id,
         (CAST(floor(maxx) AS BIGINT) - CAST(floor(minx) AS BIGINT) + 1)
         * (CAST(floor(maxy) AS BIGINT) - CAST(floor(miny) AS BIGINT) + 1)
         AS n_cells,
         minx, miny, maxx, maxy
  FROM p)
SELECT * FROM r WHERE n_cells > {_PO_MAX_CELLS}"""


# --- polygon geometry stats (r6) --------------------------------------------
# Synthetic polygon corpus derived from customer keys, three shape classes:
#   custkey % 3 == 0  -> MultiPolygon (two disjoint quads, second half=0.3)
#   custkey % 5 == 0  -> Polygon with a hole (inner quad half=0.1)
#   otherwise         -> plain Polygon quad
# Quad half-size h = (2 + custkey % 4) / 10 in degrees; every coordinate has
# exactly ONE decimal digit, so the scale=10 lattice in polygon_stats recovers
# exact integers and the oracle can replay the shoelace CLOSED-FORM (side
# s = 2*(2 + custkey % 4) lattice units -> |shoelace| = 2*s^2), an independent
# derivation of the same integers rather than a re-run of the same code path.
_PS_SCALE = 10.0


def _ps_ring(lonc, latc, h):
    """Closed CCW quad ring as a GeoJSON coordinate-array string; %.1f is
    exact because every corner has one decimal digit by construction."""
    fmt = "[[%.1f,%.1f],[%.1f,%.1f],[%.1f,%.1f],[%.1f,%.1f],[%.1f,%.1f]]"
    return F.format_string(
        fmt, lonc - h, latc - h, lonc + h, latc - h, lonc + h, latc + h,
        lonc - h, latc + h, lonc - h, latc - h)


def q_polygon_stats(spark, sf_dir):
    """Exact shoelace geometry audit (ring/vertex counts, lattice area2)
    over a customer-derived Polygon/MultiPolygon corpus — the JVM from_json
    parse + aggregate-HOF shoelace, no Python anywhere."""
    from .operators.geometry import polygon_stats
    cust = load(spark, sf_dir, "customer")
    lon0 = F.expr(_PO_LON0)
    lat0 = F.expr(_PO_LAT0)
    h = (F.lit(2.0) + (F.col("c_custkey") % 4).cast("double")) / F.lit(10.0)
    r1 = _ps_ring(lon0, lat0, h)
    r2 = _ps_ring(lon0 + F.lit(1.2), lat0, F.lit(0.3))
    rh = _ps_ring(lon0, lat0, F.lit(0.1))
    geo = (F.when(F.col("c_custkey") % 3 == 0,
                  F.concat(F.lit('{"type":"MultiPolygon","coordinates":[['),
                           r1, F.lit('],['), r2, F.lit(']]}')))
           .when(F.col("c_custkey") % 5 == 0,
                 F.concat(F.lit('{"type":"Polygon","coordinates":['),
                          r1, F.lit(','), rh, F.lit(']}')))
           .otherwise(F.concat(F.lit('{"type":"Polygon","coordinates":['),
                               r1, F.lit(']}'))))
    polys = cust.select(
        F.concat(F.lit("G"), F.col("c_custkey").cast("string")).alias("poly_id"),
        geo.alias("geojson"))
    # the tiny bench parquet arrives as ONE split and the shoelace HOF is
    # CPU-bound (r6 window: 4.1 s of exec in 3 tasks); at real scale the
    # scan supplies the partitions — here we spread it explicitly, same
    # rationale as bench._bench_points
    ncores = polys.sparkSession.sparkContext.defaultParallelism
    return polygon_stats(polys.repartition(ncores), scale=_PS_SCALE)


# closed-form oracle: side s = 2*(2 + k%4) lattice units; |shoelace| = 2*s^2;
# hole side 2 (half 0.1) subtracts 8; second MultiPolygon quad side 6 adds 72
_POLYGON_STATS_ORACLE = """WITH p AS (
  SELECT c_custkey AS k, 2 * (2 + c_custkey % 4) AS s FROM customer)
SELECT 'G' || CAST(k AS VARCHAR) AS poly_id,
  CAST(CASE WHEN k % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_polys,
  CAST(CASE WHEN k % 3 = 0 THEN 2
            WHEN k % 5 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_rings,
  CAST(CASE WHEN k % 3 = 0 THEN 10
            WHEN k % 5 = 0 THEN 10 ELSE 5 END AS BIGINT) AS n_vertices,
  CAST(CASE WHEN k % 3 = 0 THEN 2 * s * s + 72
            WHEN k % 5 = 0 THEN 2 * s * s - 8
            ELSE 2 * s * s END AS BIGINT) AS area2
FROM p"""


# --- geo_tag: the graft composition (r6) -------------------------------------
# web-page text -> regex coordinate extraction -> exact PIP region
# assignment -> per-region rollup: the webtext x geospatial pipeline
# end-to-end under ONE hash gate.  Coordinate strings are built from
# INTEGER pieces (never CAST(double AS STRING), which formats differently
# across engines); the parsed value is CAST(str AS DOUBLE) on both sides.
# Base CASE keys the point into the fixture-polygon neighborhoods: class 0
# lands inside hot_box AND holed (minus the hole), class 2 inside
# greenwich when both fractions <= .5 — holes, overlap, and misses are all
# live under the gate.
_GT_FRAC_LAT = "lpad(CAST((c_custkey * 7919) % 960 + 20 AS STRING), 3, '0')"
_GT_FRAC_LON = "lpad(CAST((c_custkey * 104729) % 960 + 20 AS STRING), 3, '0')"
_GT_LAT_STR = ("(CASE CAST(c_custkey % 5 AS INT) WHEN 0 THEN '57' "
               "WHEN 1 THEN '-34' WHEN 2 THEN '0' WHEN 3 THEN '-1' "
               f"ELSE '59' END || '.' || {_GT_FRAC_LAT})")
_GT_LON_STR = ("(CASE CAST(c_custkey % 5 AS INT) WHEN 0 THEN '11' "
               "WHEN 1 THEN '-71' WHEN 2 THEN '0' WHEN 3 THEN '-1' "
               f"ELSE '179' END || '.' || {_GT_FRAC_LON})")
_GT_TEXT_SQL = (f"'crawl page geo:' || {_GT_LAT_STR} || ',' || {_GT_LON_STR}"
                " || ' body text v1.2, 3.4.5 decoy'")


def q_geo_tag(spark, sf_dir):
    """Extract -> PIP -> rollup composition: the real regex extractor over
    constructed page text feeds the exact ray-cast polygon assignment,
    rolled up per region with min/max page ids."""
    from .operators.extract import extract_coords
    from .queries import load as _load
    pages = _load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pid"), F.expr(_GT_TEXT_SQL).alias("text"))
    pts = extract_coords(pages, keep_cols=("pid",)).select("pid", "lat", "lon")
    tagged = pip_assign(pts, _polygons_df(spark))
    return (tagged.groupBy("poly_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.min("pid").alias("min_pid"),
                 F.max("pid").alias("max_pid")))


def _geo_tag_oracle() -> str:
    pts = (f"pts AS (\n  SELECT c_custkey AS pid, "
           f"CAST({_GT_LAT_STR} AS DOUBLE) AS lat, "
           f"CAST({_GT_LON_STR} AS DOUBLE) AS lon FROM customer)")
    return (_pip_assign_cte(pts)
            + """
SELECT poly_id, CAST(count(*) AS BIGINT) AS n_points,
  min(pid) AS min_pid, max(pid) AS max_pid
FROM par WHERE outer_par = 1 AND hole_par = 0 GROUP BY poly_id""")


SPARK_QUERIES = {"knn": q_knn, "pip": q_pip, "pip_bucketed": q_pip_bucketed,
                 "pip_oversize": q_pip_oversize,
                 "polygon_stats": q_polygon_stats,
                 "geo_tag": q_geo_tag}
ORACLES = {"knn": _KNN_ORACLE, "pip": _pip_oracle(),
           "pip_bucketed": _pip_oracle(),
           "pip_oversize": _PIP_OVERSIZE_ORACLE,
           "polygon_stats": _POLYGON_STATS_ORACLE,
           "geo_tag": _geo_tag_oracle()}
