"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over kinesis_stream_reader_spark.registry — the engine's query
registry. See SURVEY.md §2 for the operator inventory each entry maps to.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesis_stream_reader_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's marquee request
    GET /records?streamname=S&duration=960&serverName=SERVER-click
    (app/server/index.js:43-73) over /root/testdata/sf0.001."""
    return registry.records_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
