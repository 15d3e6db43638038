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
