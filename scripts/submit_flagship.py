#!/usr/bin/env python
"""spark-submit entry point for the flagship enrichment job.

Usage (cluster-style launch, north_rule):
    python scripts/package_pyfiles.py                       # builds dist/elevation_service_spark.zip
    spark-submit --master local[8] \
        --py-files dist/elevation_service_spark.zip \
        scripts/submit_flagship.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/enriched --manifest /tmp/enriched_manifest

On a real cluster only --master changes; the job is resumable — re-submit
after a failure and completed buckets are skipped via the manifest.
"""

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("elevation-enrich").getOrCreate()
    from elevation_service_spark.operators.lookup import enrich_points
    from elevation_service_spark.sources.tiles import fixture_tiles_df
    from elevation_service_spark.sources.manifest import run_resumable
    from elevation_service_spark.queries import LAT_SQL, LON_SQL

    pts = spark.read.parquet(f"{args.sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("pid"),
        F.expr(LAT_SQL).alias("lat"), F.expr(LON_SQL).alias("lon"))
    tiles = fixture_tiles_df(spark)
    summary = run_resumable(lambda p: enrich_points(p, tiles, strategy="broadcast"),
                            pts, args.out, args.manifest, ["pid"], args.n_buckets)
    print(f"processed={len(summary['processed'])} skipped={len(summary['skipped'])}",
          file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
