"""Checkpoint / resume with per-partition lineage + metrics
(BASELINE.json § north_rule: "resumable from checkpoint with per-partition
lineage and metrics").

Iceberg-style layout without the Iceberg runtime (SURVEY.md §7.0): the
output is a parquet table partitioned by a stable bucket column, and a
JSON manifest directory records one entry per COMPLETED bucket with its
metrics.  Exactly-once per bucket:

- a bucket is recomputed unless its manifest entry exists;
- data is written with dynamic partition overwrite BEFORE the manifest
  entry is created, so a crash between write and mark leaves a bucket that
  is simply rewritten (idempotent) on resume;
- resume = anti-join of buckets against the manifest (driver-side set —
  bucket counts are bounded, e.g. 4096 buckets for a 100 TB run).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PART_COL = "_bucket"


class PartitionManifest:
    """One JSON file per completed bucket: atomic-enough on a real object
    store (rename/put semantics), trivially atomic locally."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def completed(self) -> dict[int, dict]:
        out = {}
        for name in os.listdir(self.path):
            if name.startswith("bucket-") and name.endswith(".json"):
                with open(os.path.join(self.path, name)) as f:
                    e = json.load(f)
                out[e["bucket"]] = e
        return out

    def mark(self, bucket: int, metrics: dict) -> None:
        entry = {"bucket": bucket, "completed_at": time.time(), **metrics}
        tmp = os.path.join(self.path, f".bucket-{bucket}.json.tmp")
        dst = os.path.join(self.path, f"bucket-{bucket}.json")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, dst)


def with_bucket(df: DataFrame, key_cols: list[str], n_buckets: int) -> DataFrame:
    return df.withColumn(PART_COL, F.pmod(F.hash(*key_cols), F.lit(n_buckets)))


def run_resumable(df_fn, input_df: DataFrame, out_path: str, manifest_path: str,
                  key_cols: list[str], n_buckets: int = 64,
                  group_size: int | None = None) -> dict:
    """Execute ``df_fn(bucketed_pending_input) -> DataFrame`` over only the
    buckets not yet in the manifest; write results partitioned by bucket
    (dynamic overwrite); record per-bucket metrics.  Returns a summary
    {"processed": [...], "skipped": [...]}.

    ``group_size`` bounds the blast radius of a crash (VERDICT r2 #5): with
    N pending buckets and group_size=g, the run executes ceil(N/g) write+mark
    rounds, and a crash loses only the in-flight group — every earlier group
    is already marked and skipped on resume.  group_size=None keeps the
    single-job fast path (one scan, coarsest recovery).  Trade-off at scale:
    each group's job re-evaluates the input scan+filter (the bucket column
    is computed, so no partition pruning on the INPUT side); pick g so that
    recompute-on-crash cost ~ balances (N/g - 1) extra input scans, or store
    the input bucketed by the same key so the filter prunes."""
    spark = input_df.sparkSession
    manifest = PartitionManifest(manifest_path)
    done = set(manifest.completed())
    bucketed = with_bucket(input_df, key_cols, n_buckets)
    pending = bucketed.filter(~F.col(PART_COL).isin(list(done))) if done else bucketed
    present = sorted(int(r[PART_COL]) for r in
                     pending.select(PART_COL).distinct().collect())
    if not present:
        return {"processed": [], "skipped": sorted(done)}

    g = group_size or len(present)
    groups = [present[i:i + g] for i in range(0, len(present), g)]

    metric_cols = [F.count(F.lit(1)).alias("rows")]
    has_status = "status" in df_fn(pending.limit(0)).columns
    if has_status:
        metric_cols.append(
            F.sum(F.when(F.col("status") == "OK", 1).otherwise(0)).alias("rows_ok"))

    for grp in groups:
        grp_pending = pending.filter(F.col(PART_COL).isin(grp))
        out = df_fn(grp_pending)
        assert PART_COL in out.columns, "df_fn must preserve the bucket column"
        # data lands BEFORE the marks: a crash between them rewrites the
        # group (idempotent dynamic overwrite) on resume
        (out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PART_COL).parquet(out_path))
        # per-bucket lineage metrics from the just-written data (re-read:
        # cheap, column-pruned, partition-pruned to the group, and reflects
        # exactly what landed on disk)
        written = spark.read.parquet(out_path).filter(F.col(PART_COL).isin(grp))
        stats = {r[PART_COL]: r.asDict() for r in
                 written.groupBy(PART_COL).agg(*metric_cols).collect()}
        for b in grp:
            m = stats.get(b, {"rows": 0})
            m.pop(PART_COL, None)
            manifest.mark(int(b), m)
    return {"processed": present, "skipped": sorted(done)}
