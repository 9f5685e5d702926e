"""Training-batch assembly: the step after curation — what turns a
curated corpus into the fixed-budget, reproducibly-ordered sequences a
trainer actually reads.

documents
  -> curate_corpus          (gates + exact dedup + near-dup canonical)
  -> chunk_documents        (sliding token windows, map-only 1->N)
  -> shard + pack           (running token sum per shard -> bin ids)
  -> per-bin manifest       (chunk/doc/token counts)

Scale shape: curation's shuffles (fingerprint, LSH, components) are
inherited; chunking is map-only; packing adds ONE shuffle on the shard
key and the manifest aggregation reuses that clustering. Each (shard,
bin) maps to one training sequence; each shard to one output file — the
writer fan-out at 100 TB is the shard count, chosen independently of
input layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.text import chunk_documents
from .curate import curate_corpus


def training_batches(
    documents: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    bin_tokens: int = 512,
    n_shards: int = 16,
) -> DataFrame:
    """curated documents -> per-(shard, bin) packing manifest.

    A chunk belongs to the bin its starting token offset (within the
    shard's running token stream) falls into — deterministic arithmetic,
    no best-fit heuristics, so the same corpus always packs the same
    way."""
    curated = curate_corpus(documents).select("doc_id")
    with_text = documents.join(curated, "doc_id").select("doc_id", "text")
    chunks = chunk_documents(with_text, chunk_tokens, stride).select(
        "doc_id", "chunk_id", "n_tokens"
    )
    sharded = chunks.withColumn("shard", F.col("doc_id") % n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sharded.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        packed.withColumn(
            "bin_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(bin_tokens))),
        )
        .groupBy("shard", "bin_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("shard", "bin_id")
    )
