"""As-of join (latest right row with right_key <= left_key per group).

Spark lacks a native as-of join; the scalable formulation is the classic
union-and-window: interleave both sides ordered by the as-of key within
each group and carry the latest right payload forward with
last(ignorenulls) — ONE shuffle on the group key, no per-row range probe,
no cross join.  (A sort-merge as-of; the same shape pandas/kdb use.)

Ordering contract: right rows sort BEFORE left rows at an equal key, so an
exactly-equal key matches (<= semantics); among right rows with equal keys
the largest right_id wins (deterministic tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              group_col: str = "grp", key_col: str = "k",
              right_id: str = "rid",
              carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """left: (group_col, key_col, ...); right: (group_col, key_col,
    right_id, carry_cols...).  Returns left columns + matched_<right_id>
    (+ carried right columns), NULL when no right row precedes."""
    lcols = [c for c in left.columns]
    payload = F.struct(F.col(right_id).alias(right_id),
                       *[F.col(c).alias(c) for c in carry_cols])
    r = (right.select(group_col,
                      F.col(key_col).alias("_k"),
                      F.lit(0).alias("_side"),
                      payload.alias("_p"),
                      F.col(right_id).alias("_tie"),
                      *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
                        for c in lcols if c != group_col]))
    l = (left.select(group_col,
                     F.col(key_col).alias("_k"),
                     F.lit(1).alias("_side"),
                     F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
                     F.lit(None).cast("long").alias("_tie"),
                     *[F.col(c).alias(f"_l_{c}") for c in lcols if c != group_col]))
    u = r.unionByName(l)
    w = (Window.partitionBy(group_col)
         .orderBy(F.col("_k").asc(), F.col("_side").asc(),
                  F.col("_tie").asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, 0))
    out = (u.withColumn("_match", F.last("_p", ignorenulls=True).over(w))
           .filter(F.col("_side") == 1))
    sel = [F.col(group_col)] + \
          [F.col(f"_l_{c}").alias(c) for c in lcols if c != group_col] + \
          [F.col(f"_match.{right_id}").alias(f"matched_{right_id}")] + \
          [F.col(f"_match.{c}").alias(f"matched_{c}") for c in carry_cols]
    return out.select(*sel)
