"""The reference's end-to-end query pipeline, Spark-first.

Reference lifecycle (app/server/index.js:43-73):
  validate params -> compute time window -> scan stream -> filter -> JSON sink

Here the whole thing is one lazy logical plan: validation happens up
front in Python (api.py), everything else is column algebra that
Catalyst optimizes (time bound pushed into the scan, conjunctive filters
merged, unused columns pruned). Nothing materializes until the sink.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..api import QueryParamValidator, ValidationResult
from ..operators.events import to_nested
from ..operators.filters import filter_records, with_data_relative_window
from ..sources.tables import load_events


def records_plan(
    events_nested: DataFrame, query: Mapping[str, object]
) -> DataFrame:
    """scan -> time window -> conjunctive filters (index.js:57-61)."""
    windowed = with_data_relative_window(events_nested, query.get("duration"))
    return filter_records(windowed, query)


def records_query(
    spark: SparkSession, sf_dir: str, query: Mapping[str, object]
) -> tuple[ValidationResult, DataFrame | None]:
    """Full front-door path: validate -> plan. Bad request -> (result, None),
    mirroring the reference's 400-and-stop (index.js:52-55)."""
    validation = QueryParamValidator().validate_params(query)
    if validation.badRequest:
        return validation, None
    nested = to_nested(load_events(spark, sf_dir))
    return validation, records_plan(nested, query)


def sink_json(df: DataFrame) -> DataFrame:
    """JSON sink (responses/index.js:26-37): one JSON document per row.

    The reference serializes the whole array on one thread
    (JSON.stringify, responses/index.js:34); here serialization is
    distributed (to_json per row on executors) and only the final
    strings move. For file output use df.write.json(path).
    """
    return df.select(F.to_json(F.struct(*df.columns)).alias("json"))
