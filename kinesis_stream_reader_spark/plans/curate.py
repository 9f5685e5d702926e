"""Corpus curation: the end-to-end training-data story composed from
the engine's operators — what a user of this engine actually runs.

documents
  -> quality gates (length / stopword / punctuation bounds)
  -> language selection
  -> exact dedup (normalized-fingerprint canonical, keep canonical row)
  -> near-dup canonical via MinHash-LSH pairs + connected components
  -> surviving corpus with token counts

Every stage is one of the already-oracle-checked operators; the
composition itself is also oracle-checked (registry: curate_corpus).
Scale shape: two hash shuffles (fingerprint, component join), the LSH
candidate path, and otherwise map-only column algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedup_components, dedup_exact, minhash_lsh_pairs
from ..operators.text import tokens


def curate_corpus(
    documents: DataFrame,
    langs: tuple[str, ...] = ("en", "de"),
    min_tokens: int = 30,
    max_stopword_ratio: float = 0.5,
    near_dup_threshold: float = 0.8,
) -> DataFrame:
    """documents -> curated corpus (doc_id, lang, n_tokens), keeping one
    canonical representative per exact- and near-duplicate group."""
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))).cast("long")

    gated = documents.filter(
        F.col("lang").isin(*langs)
        & (n_tokens >= min_tokens)
        & ((n_stop / n_tokens) <= max_stopword_ratio)
    )

    # exact dedup: keep only canonical rows. The survivor set feeds three
    # downstream consumers (LSH pairs, component labels, final join) —
    # persist it so the gate + fingerprint stages run once (MEMORY_AND_DISK,
    # so the cache spills rather than OOMs at scale).
    exact = dedup_exact(gated).filter(~F.col("is_dup")).select("doc_id")
    survivors = gated.join(exact, "doc_id").cache()

    # near-dup canonicalization over the survivors
    pairs = minhash_lsh_pairs(survivors, threshold=near_dup_threshold)
    components = dedup_components(survivors, pairs)
    canonical = components.filter(F.col("doc_id") == F.col("component_id")).select("doc_id")

    return (
        survivors.join(canonical, "doc_id")
        .select("doc_id", "lang", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"))
    )
