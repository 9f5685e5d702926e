"""Round-12 registry slice: the persisted index's production serving
completions — two-stage shortlist+refine against the on-disk store,
attribute-filtered serving pushed into the pruned codes scan, the
streaming DELETE leg with its auto-compaction policy — plus streaming
near-dup MinHash and the byte-level BPE tokenizer leg.

Follows the established conventions: every query is a (spark, sf_dir)
-> DataFrame callable with a DuckDB oracle replaying the same exact
integer semantics, column names aliased identically on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scratch import scratch
from ._shared import load_table, register


# ---------------------------------------------------------------------------
# ROUND 12 — ann_index_refine_serve: TWO-STAGE serving against the
# PERSISTED index (FAISS IndexRefineFlat over an on-disk IndexIVFPQ).
# ann_ivfpq_refine proved the semantics but re-ranked against the
# in-memory vector DataFrame; production fetches the shortlist's raw
# vectors from a store partitioned like the codes. Build time lands
# vectors/ hive-partitioned by the SAME trained list assignment, so
# BOTH stages are file-level partition pruning: the ADC shortlist scans
# nprobe/n_lists of codes/, and the exact re-rank scans nprobe/n_lists
# of vectors/ with the k*refine_factor shortlist broadcast. Must be
# row-identical to ann_ivfpq_refine — shared oracle (_REFINE_SQL).
# ---------------------------------------------------------------------------
def _register_ann_index_refine_serve():
    from .r9_round9 import _REFINE_SQL
    from .r10_round10 import ensure_persisted_ivfpq_index

    @register("ann_index_refine_serve", _REFINE_SQL)
    def ann_index_refine_serve_query(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Persisted two-stage serve (similarity.
        ivfpq_serve_refine_persisted): ADC shortlist of k*refine_factor
        from the partition-pruned codes/ scan, exact int64 re-rank via
        a partition-pruned join on vectors/. Row-identical to
        ann_ivfpq_refine on the same corpus and hyperparameters."""
        from ..operators import similarity

        emb = load_table(spark, sf_dir, "embeddings")
        d = ensure_persisted_ivfpq_index(spark, sf_dir)
        return similarity.ivfpq_serve_refine_persisted(
            emb, d, query_vec_id=0, k=10, refine_factor=4, nprobe=2
        )

    return ann_index_refine_serve_query


ann_index_refine_serve_query = _register_ann_index_refine_serve()


# ---------------------------------------------------------------------------
# ROUND 12 — ann_index_filtered_serve: attribute-filtered serving on
# the PERSISTED index. ann_ivf_filtered pre-filters inside probed
# lists but evaluates the predicate in an Arrow pass over the
# in-memory corpus; here the label rides the vectors/ store as an
# ordinary parquet column, so the predicate reaches the scan as a
# PUSHED parquet filter composed with the probed-list partition
# pruning — the query reads nprobe/n_lists of the store and row-group
# stats skip label-homogeneous groups inside that. Pure Catalyst
# (zip_with/aggregate exact L2); bit-equal to ann_ivf_filtered —
# shared oracle.
# ---------------------------------------------------------------------------
def _register_ann_index_filtered_serve():
    from .r10_round10 import _filtered_sql, ensure_persisted_ivfpq_index

    @register("ann_index_filtered_serve", _filtered_sql())
    def ann_index_filtered_serve_query(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Persisted filtered serve (similarity.
        ivf_serve_filtered_persisted): label = 1 candidates inside the
        query's 2 probed lists, exact int64 L2, predicate pushed into
        the partition-pruned vectors/ scan."""
        from ..operators import similarity

        emb = load_table(spark, sf_dir, "embeddings")
        d = ensure_persisted_ivfpq_index(spark, sf_dir)
        return similarity.ivf_serve_filtered_persisted(
            emb, d, query_vec_id=0, k=10, nprobe=2, label=1
        )

    return ann_index_filtered_serve_query


ann_index_filtered_serve_query = _register_ann_index_filtered_serve()
