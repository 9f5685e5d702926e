"""Similarity search over an embedding column: brute-force cosine top-k
baseline, and a random-hyperplane LSH-bucketed variant as the scale
path.

Extension surface (north-star mandate). The brute-force form is the
correctness baseline (and is itself distributed: the query vector
broadcasts, each partition scores its rows, TakeOrdered merges k rows).
The LSH form is the 100 TB shape: bucket once (a cheap narrow column),
then probe only matching buckets — at scale the bucket column is the
partition/Z-order key so probes prune files, not just rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _as_double, cosine

# 16 fixed random hyperplanes for sign-LSH, derived deterministically
# from xxhash64(plane, dim) so executors and tests agree with no
# broadcast state: weight in {-1, +1}.
LSH_PLANES = 16


def _plane_weight(plane: int, dim: Column) -> Column:
    return F.when(F.xxhash64(F.lit(plane), dim) % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec: Column, planes: int = LSH_PLANES) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane = sign(sum_i v_i * w_pi)."""
    def weighted(p):
        # factory, not a default-arg lambda: PySpark counts default args
        # as lambda parameters and would mis-bind zip_with's arity
        return lambda x, i: x * _plane_weight(p, i)

    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), weighted(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long")))
    bucket = bits[0]
    for bit in bits[1:]:
        bucket = bucket + bit
    return bucket


def ann_bruteforce(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact cosine top-k against one query vector.

    The 1-row query side broadcasts; scoring is a map-only stage;
    orderBy().limit(k) plans as TakeOrderedAndProject (per-partition
    heaps, k-row driver merge) — no global sort at any scale."""
    vecs = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    query = vecs.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("q")
    )
    return (
        vecs.join(F.broadcast(query))
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", F.round(cosine(F.col("v"), F.col("q")), 3).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_lsh(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10, probe_hamming: int = 6) -> DataFrame:
    """LSH-bucketed ANN: score only vectors whose sign-LSH bucket is
    within `probe_hamming` bits of the query's bucket (multi-probe).

    The bucket column is computed once per vector (in a real deployment:
    persisted + used as partition key so probing prunes whole files).
    Candidate filtering is a broadcast of the 1-row query bucket +
    bit_count inequality — no shuffle of the big side.

    probe_hamming trades recall for candidates scored: sign-LSH bit
    disagreement probability is theta/pi per plane, so for genuinely
    close neighbors (cos >= 0.9, theta ~ 26deg) expected hamming is
    ~1.2/16 and a radius of 2-3 suffices; the driver's synthetic
    vectors top out near cos 0.37 (theta ~ 68deg, expected hamming ~6),
    hence the wide default here."""
    vecs = embeddings.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v")))
    query = vecs.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("q"), F.col("bucket").alias("q_bucket")
    )
    return (
        vecs.join(F.broadcast(query))
        .filter(F.col("vec_id") != query_vec_id)
        .filter(F.bit_count(F.expr("bucket ^ q_bucket")) <= probe_hamming)
        .select("vec_id", F.round(cosine(F.col("v"), F.col("q")), 3).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )
