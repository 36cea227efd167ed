"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — full tokenize → auto-encode → decode →
per-row stats pipeline over sf0.001 documents (the engine's core path).
queries()/oracle_sql(): one entry per implemented operator (SURVEY.md §2),
cross-checked by the driver against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rle_array_spark.queries import build_oracles, build_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode the sf0.001 documents token column with codec
    auto-selection, decode, and emit per-row stats (driver checks rows>0)."""
    return build_queries()["roundtrip_auto"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracles()
