"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship elevation-enrichment query at sf0.001.
queries()       — one entry per implemented operator (SURVEY.md §2).
oracle_sql()    — DuckDB twin for every SQL-expressible query; the
                  elevation oracles recompute the engine's bilinear output
                  bit-exactly from the closed-form integer-lattice DEM
                  (elevation_service_spark/fixtures.py docstring).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elevation_service_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_elevation_hgt(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
