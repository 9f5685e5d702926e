"""kinesis_stream_reader_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference `chodyo/kinesis-stream-reader` (a Node.js
Kinesis record browser), re-expressed Spark-first and extended with the
relational / dedup / similarity / text operators a 100 TB training-data
pipeline needs.

Layout
------
- ``session``    — SparkSession builder with scale-oriented defaults
- ``schema``     — nested event schema + KPL aggregation constants
- ``sources``    — batch/streaming sources (parquet fixtures, Kinesis doc)
- ``operators``  — pure DataFrame -> DataFrame transforms
- ``plans``      — pipeline compositions (scan -> deagg -> parse -> filter -> sink)
- ``streaming``  — Structured Streaming variants of the pipeline
- ``api``        — query-param validation + error envelope (reference front door)

Reference parity citations use ``path:line`` into ``/root/reference/``.
"""

__version__ = "0.1.0"
