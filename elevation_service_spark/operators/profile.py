"""Table profiling — the ANALYZE-style per-column statistics pass a
training-data pipeline runs before trusting a new corpus drop: row
count, null count, exact distinct count, and min/max per column, one
output row per profiled column.

Scale shape: ONE aggregation pass over the table.  Multiple exact
count-distincts in one Aggregate plan through Spark's Expand operator
(one duplicated row stream per distinct column) — the documented cost
of exactness; profiling is an offline maintenance pass, and callers
with 100 TB tables profile a column subset or swap in
approx_count_distinct (losing the oracle hash, like the HLL row).

Exactness: min/max aggregate on the ORIGINAL column type and cast to
string AFTER aggregation, so both engines format the same single value;
profiled columns are restricted to int/bigint/string/date types, whose
string casts are byte-identical across Spark and DuckDB (doubles are
excluded — shortest-round-trip float formatting is engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_SAFE_TYPES = ("int", "integer", "bigint", "smallint", "string",
                      "date")


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_str, max_str) — one row
    per profiled column, computed in ONE aggregation pass."""
    for c in cols:
        dt = dict(df.dtypes)[c]
        if dt not in PROFILE_SAFE_TYPES:
            raise ValueError(
                f"table_profile: column {c} has type {dt}; only "
                f"{PROFILE_SAFE_TYPES} cast to strings identically across "
                f"engines (exactness policy)")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).cast("long").alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).alias(f"__mn_{c}"),
            F.max(F.col(c)).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col("__n").alias("n_rows"),
                 (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                 F.col(f"__nd_{c}").alias("n_distinct"),
                 F.col(f"__mn_{c}").cast("string").alias("min_str"),
                 F.col(f"__mx_{c}").cast("string").alias("max_str"))
        for c in cols])
    return (one.select(F.explode(rows).alias("p"))
            .select("p.col_name", "p.n_rows", "p.n_null", "p.n_distinct",
                    "p.min_str", "p.max_str"))
