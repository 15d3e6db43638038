"""Raster tile table source/sink (SURVEY.md §1.3 Spark mapping).

The reference's TileSet (S3 fetch + LRU cache, elevation-service/tileset.js)
becomes a columnar table of tile rows; fetch-once/cache semantics become
join locality + per-worker decoded-grid LRU (operators/lookup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import fixtures

TILES_SCHEMA = T.StructType([
    T.StructField("tile_key", T.StringType(), False),
    T.StructField("z", T.IntegerType(), True),
    T.StructField("x", T.IntegerType(), True),
    T.StructField("y", T.IntegerType(), True),
    T.StructField("sw_lat", T.IntegerType(), False),
    T.StructField("sw_lon", T.IntegerType(), False),
    T.StructField("size", T.IntegerType(), False),
    T.StructField("encoding", T.StringType(), False),
    T.StructField("data", T.BinaryType(), False),
])


_FIXTURE_DF_CACHE: dict = {}


def fixture_tiles_df(spark: SparkSession, include_bad: bool = False,
                     encodings: dict[str, str] | None = None) -> DataFrame:
    ck = (spark.sparkContext.applicationId,
          tuple(sorted(encodings.items())) if encodings else None, include_bad)
    if ck in _FIXTURE_DF_CACHE:
        return _FIXTURE_DF_CACHE[ck]
    rows = fixtures.tiles_rows(encodings=encodings, include_bad=include_bad)
    df = spark.createDataFrame(
        [(r["tile_key"], r["z"], r["x"], r["y"], r["sw_lat"], r["sw_lon"],
          r["size"], r["encoding"], bytearray(r["data"])) for r in rows],
        schema=TILES_SCHEMA,
    ).cache()  # avoids re-serializing ~40 MB of tile bytes per query
    _FIXTURE_DF_CACHE[ck] = df
    return df


def write_tiles(df: DataFrame, path: str) -> None:
    """Tile table sink: parquet, partitioned by 10-degree latitude band so a
    band-restricted query prunes partitions at scan time (stands in for
    Iceberg partition transforms; SURVEY.md §7.0)."""
    from pyspark.sql import functions as F
    (df.withColumn("lat_band", (F.col("sw_lat") / 10).cast("int") * 10)
       .write.mode("overwrite").partitionBy("lat_band").parquet(path))


def read_tiles(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("lat_band")


def read_hgt_dir(spark: SparkSession, path: str) -> DataFrame:
    """FileTileSet parity (elevation-service/tileset.js § FileTileSet, env
    TILE_SET_PATH): read a directory of raw ``{KEY}.hgt`` / ``{KEY}.hgt.gz``
    files via the binaryFile source into the tile table shape.  The skadi
    key and SW corner are parsed from the filename; grid size is sniffed at
    decode time (op 7)."""
    from pyspark.sql import functions as F
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.hgt*")
             .option("recursiveFileLookup", "true")
             .load(path))
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    key = F.regexp_extract(name, r"^([NS]\d{2}[EW]\d{3})\.hgt(\.gz)?$", 1)
    gz = name.endswith(".gz")
    sw_lat = (F.when(F.substring(key, 1, 1) == "S", -1).otherwise(1)
              * F.substring(key, 2, 2).cast("int"))
    sw_lon = (F.when(F.substring(key, 4, 1) == "W", -1).otherwise(1)
              * F.substring(key, 5, 3).cast("int"))
    return (files.filter(key != "")
            .select(key.alias("tile_key"),
                    F.lit(None).cast("int").alias("z"),
                    F.lit(None).cast("int").alias("x"),
                    F.lit(None).cast("int").alias("y"),
                    sw_lat.alias("sw_lat"), sw_lon.alias("sw_lon"),
                    F.lit(None).cast("int").alias("size"),
                    F.when(gz, "hgt.gz").otherwise("hgt").alias("encoding"),
                    F.col("content").alias("data")))


def fetch_tiles(spark: SparkSession, tile_keys: DataFrame | list[str],
                fetcher, encoding: str = "hgt.gz",
                partitions: int | None = None) -> DataFrame:
    """S3TileSet._getTile plug point (elevation-service/tileset.js §
    S3TileSet; SURVEY.md §2.A row 6): turn a set of requested tile keys
    into tile-table rows by calling ``fetcher(key) -> bytes | None`` from
    the EXECUTORS (one call per key, distributed across partitions — the
    driver never touches tile bytes).  The sandbox has no network, so the
    production fetcher (boto3/HTTP GET of
    ``{key[:3]}/{key}.hgt.gz``) is exactly one function the deployment
    supplies; everything downstream (decode, cache, join) is unchanged.
    Keys whose fetch returns None are omitted — downstream lookups then
    surface TILE_MISSING (op 14), matching the reference's 404 path.

    fetcher must be a picklable callable (top-level function or
    functools.partial)."""
    from pyspark.sql import Row, functions as F
    if isinstance(tile_keys, DataFrame):
        keys_df = tile_keys.select("tile_key").distinct()
    else:
        keys_df = spark.createDataFrame(
            [(k,) for k in sorted(set(tile_keys))], ["tile_key"])
    if partitions:
        keys_df = keys_df.repartition(partitions)
    sw_lat = (F.when(F.substring("tile_key", 1, 1) == "S", -1).otherwise(1)
              * F.substring("tile_key", 2, 2).cast("int"))
    sw_lon = (F.when(F.substring("tile_key", 4, 1) == "W", -1).otherwise(1)
              * F.substring("tile_key", 5, 3).cast("int"))
    base = keys_df.select("tile_key", sw_lat.alias("sw_lat"),
                          sw_lon.alias("sw_lon"))

    def fetch_partition(rows):
        for r in rows:
            data = fetcher(r["tile_key"])
            if data is not None:
                yield Row(tile_key=r["tile_key"], sw_lat=r["sw_lat"],
                          sw_lon=r["sw_lon"], data=bytes(data))

    fetched_schema = T.StructType([
        T.StructField("tile_key", T.StringType(), False),
        T.StructField("sw_lat", T.IntegerType(), False),
        T.StructField("sw_lon", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ])
    fetched = spark.createDataFrame(base.rdd.mapPartitions(fetch_partition),
                                    fetched_schema)
    return fetched.select(
        "tile_key",
        F.lit(None).cast("int").alias("z"), F.lit(None).cast("int").alias("x"),
        F.lit(None).cast("int").alias("y"), "sw_lat", "sw_lon",
        F.lit(None).cast("int").alias("size"),
        F.lit(encoding).alias("encoding"), "data")


def iceberg_available(spark: SparkSession) -> bool:
    """Probe for an Iceberg runtime (SURVEY.md §7.0).  The sandbox has no
    Iceberg jars, so sinks downgrade to Iceberg-style partitioned parquet +
    JSON manifest (sources/manifest.py) — documented loudly here and in
    BENCH/BASELINE.md."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        return True
    except Exception:
        return False


def compact_parquet(spark: SparkSession, path: str, out_path: str,
                    target_file_bytes: int = 128 << 20,
                    sort_col: str | None = None) -> dict:
    """Small-files compaction: rewrite a parquet dataset into
    ceil(bytes / target_file_bytes) files (optionally range-sorted on a
    column for locality).  Streaming sinks and per-bucket resumable writes
    leave many tiny files; at 100 TB the resulting driver listing +
    task-per-file overhead dominates scans, so compaction is a standing
    maintenance op.  Returns {files_before, files_after, rows, bytes}."""
    import math
    from pyspark.sql import functions as F
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jvm_path, True)
    files_before, total_bytes = 0, 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            files_before += 1
            total_bytes += f.getLen()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    out = (df.repartitionByRange(n_files, F.col(sort_col)) if sort_col
           else df.coalesce(n_files) if n_files < max(files_before, 1)
           else df.repartition(n_files))
    out.write.mode("overwrite").parquet(out_path)
    rows = spark.read.parquet(out_path).count()
    # same recursive Hadoop listing as files_before, so the reported stat is
    # right for partitioned output dirs and relative paths alike (ADVICE r2)
    out_jvm = spark._jvm.org.apache.hadoop.fs.Path(out_path)
    out_it = fs.listFiles(out_jvm, True)
    files_after = 0
    while out_it.hasNext():
        if out_it.next().getPath().getName().endswith(".parquet"):
            files_after += 1
    return {"files_before": files_before, "files_after": files_after,
            "rows": rows, "bytes": total_bytes}


def write_bucketed(df: DataFrame, table: str, key: str = "tile_key",
                   n_buckets: int = 16, sort: bool = True) -> None:
    """Persist a table bucketed (and optionally sorted) by ``key`` so
    downstream equi-joins and aggregations on the key are CO-LOCATED:
    two tables bucketed the same way join with ZERO Exchange on either
    side (verified in tests/test_plans.py).  This is the 100 TB answer to
    'the points and tiles are joined every hour' — pay the shuffle once at
    write time, never again at read time.  Bucketing requires the session
    catalog (saveAsTable), not a bare path."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def write_enriched(df: DataFrame, path: str, n_range_partitions: int = 64) -> None:
    """Enriched-points sink (SURVEY.md §2.B): EXPLICIT range partitioning on
    tile_key (north_star: "explicit range partitioning") so downstream
    tile-local consumers read co-located, sorted runs; file layout is
    additionally partitioned by status for cheap error triage.  Uses
    Iceberg when a runtime is present, else partitioned parquet."""
    from pyspark.sql import functions as F
    spark = df.sparkSession
    out = df.repartitionByRange(n_range_partitions, F.col("tile_key"))
    if iceberg_available(spark):
        out.writeTo(path).createOrReplace()  # pragma: no cover (no jars here)
    else:
        out.write.mode("overwrite").partitionBy("status").parquet(path)


def read_enriched(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
