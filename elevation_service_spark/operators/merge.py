"""Corpus maintenance: MERGE-style latest-wins upsert (SURVEY.md §2.C
maintenance — the operation that keeps a deduped training corpus current
as new crawl batches arrive).

Semantics = ``MERGE INTO base USING updates ON key WHEN MATCHED THEN
UPDATE WHEN NOT MATCHED THEN INSERT`` with deterministic latest-wins:
rows carry a ``version`` and the highest version per key survives (ties
broken toward the updates side, then by the caller-declared tiebreak
column so reruns are stable).

Physical shape, 100 TB honest: ONE union + ONE shuffle on the key (the
row_number window partitions by key).  No join — a join-based merge
shuffles both sides anyway and still needs a survivor rule for
duplicate keys inside a batch; union+window handles both in one pass
and map-side-combines nothing it shouldn't.  At real scale pair this
with the repo's dynamic-partition-overwrite sink (sources/tiles.py
write_tiles / manifest.run_resumable) so only partitions containing
upserted keys rewrite; a table format with row-level deletes (Iceberg —
environment-blocked here, SURVEY §7.0) would replace the rewrite with a
delete-file commit, same logical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(base: DataFrame, updates: DataFrame,
                  key_col: str = "doc_id",
                  version_col: str = "version",
                  tiebreak_cols: tuple[str, ...] = ()) -> DataFrame:
    """Latest-wins merge of ``updates`` into ``base``: one row per key,
    the row with the highest ``version`` (updates beat base on equal
    version — the MERGE "WHEN MATCHED" rule).  Both inputs must share a
    schema containing key_col and version_col.  Returns the merged table
    (same schema, plus nothing — the bookkeeping columns are dropped).

    If ONE SIDE can contain several rows with the same (key, version),
    pass ``tiebreak_cols`` (compared ascending after version/side) to
    make the survivor deterministic across reruns and partitionings;
    without it such in-side ties pick an arbitrary row."""
    reserved = {"_src", "_rn"} & (set(base.columns) | set(updates.columns))
    if reserved:
        # withColumn would silently REPLACE a caller column of the same
        # name, corrupting the survivor rule (ADVICE r4)
        raise ValueError(f"upsert_latest: input columns {sorted(reserved)} "
                         "collide with reserved bookkeeping names _src/_rn "
                         "— rename them before merging")
    if set(base.columns) != set(updates.columns):
        # name-set check only: column TYPES are the caller's contract
        # (unionByName will raise on incompatible types downstream)
        raise ValueError(f"schema mismatch: {base.columns} vs {updates.columns}")
    tagged = (base.withColumn("_src", F.lit(0))
              .unionByName(updates.withColumn("_src", F.lit(1))))
    w = Window.partitionBy(key_col).orderBy(
        F.col(version_col).desc(), F.col("_src").desc(),
        *[F.col(c).asc() for c in tiebreak_cols])
    return (tagged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_src"))


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_col: str = "doc_id",
                  fingerprint_col: str = "text") -> DataFrame:
    """Change-data-capture between two corpus snapshots: one row per key
    whose content changed, appeared, or disappeared —
    ``(id, change, old_fp, new_fp)`` with ``change`` in
    {'added','removed','changed'} and ``*_fp`` = md5 of the content
    column (NULL on the absent side).  Unchanged keys are dropped: the
    output IS the CDC stream a downstream incremental job consumes.

    Physical shape, 100 TB honest: ONE union + ONE map-side-combinable
    groupBy on the key (conditional max of the side-tagged fingerprint)
    — not a full-outer join, which shuffles the same bytes but cannot
    partial-aggregate and must carry whole rows to the join instead of
    a 32-byte fingerprint.  Fingerprints are computed BEFORE the
    shuffle, so only (key, fp, side) moves regardless of document size.

    Precondition: each snapshot has at most one row per key (the
    definition of a snapshot); duplicate keys inside one side would be
    silently collapsed by max()."""
    reserved = {"_fp", "_side"} & (set(old.columns) | set(new.columns))
    if reserved:
        raise ValueError(f"snapshot_diff: input columns {sorted(reserved)} "
                         "collide with reserved bookkeeping names — rename "
                         "them before diffing")
    def slim(df: DataFrame, side: int) -> DataFrame:
        return df.select(F.col(key_col).alias("id"),
                         F.md5(F.col(fingerprint_col)).alias("_fp"),
                         F.lit(side).alias("_side"))
    u = slim(old, 0).unionByName(slim(new, 1))
    g = u.groupBy("id").agg(
        F.max(F.when(F.col("_side") == 0, F.col("_fp"))).alias("old_fp"),
        F.max(F.when(F.col("_side") == 1, F.col("_fp"))).alias("new_fp"))
    return (g.filter(F.col("old_fp").isNull() | F.col("new_fp").isNull()
                     | (F.col("old_fp") != F.col("new_fp")))
            .select("id",
                    F.when(F.col("old_fp").isNull(), F.lit("added"))
                     .when(F.col("new_fp").isNull(), F.lit("removed"))
                     .otherwise(F.lit("changed")).alias("change"),
                    "old_fp", "new_fp"))


# --- crash-resumable streaming MERGE sink (r6) -------------------------------

def versioned_merge_sink(target_base: str, key_col: str = "doc_id",
                         version_col: str = "version",
                         tiebreak_cols: tuple[str, ...] = (),
                         retain: int = 2):
    """foreachBatch MERGE sink with a Delta-lite commit log — the
    crash-resume upgrade of the r5 rename-swap (ARCHITECTURE r6 candidate
    #5).  Layout under ``target_base``::

        v{batch_id}/            parquet snapshot after merging that batch
        _commits/commit-{batch_id}.json   atomic marker (os.replace)

    Exactly-once under Spark's foreachBatch replay contract (a failed
    epoch re-invokes the function with the SAME batch_id):

    - replay AFTER commit: the marker exists -> the batch is skipped, the
      target is untouched (idempotent);
    - crash BETWEEN data write and commit: an orphan v{N} directory with
      no marker — readers ignore it, and the replayed batch simply
      overwrites it before committing;
    - the merge always reads the latest COMMITTED snapshot, never an
      in-flight one, so a torn write can never poison a later merge.

    Returns ``(apply, read_latest, seed)``: ``apply(batch_df, batch_id)``
    is the foreachBatch callable; ``read_latest(spark)`` resolves the
    highest committed snapshot as a DataFrame (None before any commit);
    ``seed(df)`` writes ``df`` as the committed version -1 snapshot
    (``v-1/`` + marker) so the first streaming batch merges into an
    existing base instead of nothing.

    ``retain`` old snapshots are kept for readers-in-flight; older
    directories are deleted AFTER the new commit lands (crash during GC
    leaves garbage directories, never a broken table).  At scale the
    snapshot write pairs with dynamic partition overwrite exactly like
    run_resumable; a real table format would turn the snapshot into a
    delete-file commit with the same logical plan."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import time as _time

    commits = _os.path.join(target_base, "_commits")
    _os.makedirs(commits, exist_ok=True)

    def _committed() -> list[int]:
        out = []
        for name in _os.listdir(commits):
            if name.startswith("commit-") and name.endswith(".json"):
                out.append(int(name[len("commit-"):-len(".json")]))
        return sorted(out)

    def _mark(batch_id: int, metrics: dict) -> None:
        tmp = _os.path.join(commits, f".commit-{batch_id}.json.tmp")
        dst = _os.path.join(commits, f"commit-{batch_id}.json")
        with open(tmp, "w") as f:
            _json.dump({"batch": batch_id, "committed_at": _time.time(),
                        **metrics}, f)
        _os.replace(tmp, dst)

    def read_latest(spark):
        ids = _committed()
        if not ids:
            return None
        return spark.read.parquet(_os.path.join(target_base, f"v{ids[-1]}"))

    def seed(df) -> None:
        df.write.mode("overwrite").parquet(
            _os.path.join(target_base, "v-1"))
        _mark(-1, {"rows": df.count(), "seed": True})

    def apply(batch_df, batch_id: int) -> None:
        bid = int(batch_id)
        ids = _committed()
        if bid in ids:
            return  # replay after a successful commit: exactly-once skip
        cur = read_latest(batch_df.sparkSession)
        merged = batch_df if cur is None else upsert_latest(
            cur, batch_df, key_col, version_col, tiebreak_cols)
        vdir = _os.path.join(target_base, f"v{bid}")
        merged.write.mode("overwrite").parquet(vdir)  # orphan-safe
        rows = batch_df.sparkSession.read.parquet(vdir).count()
        _mark(bid, {"rows": rows})
        for old in _committed()[:-retain] if retain else []:
            _shutil.rmtree(_os.path.join(target_base, f"v{old}"),
                           ignore_errors=True)
            _os.remove(_os.path.join(commits, f"commit-{old}.json"))

    return apply, read_latest, seed
