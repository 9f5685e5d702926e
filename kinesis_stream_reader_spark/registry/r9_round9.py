"""Round-9 registry slice: the FAISS refine/health completions of the
trained IVF-PQ family, plus the round's new operator families.

Follows the r8 conventions: trained-quantizer queries compose onto
r8_round8's `_TRAINED_TL_CTE` (and `_IVFPQ_ADC_CTES`) so the DuckDB
oracles replay training, residual encoding, and ADC bit-identically."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._shared import load_table, register
from .r8_round8 import _IVFPQ_ADC_CTES, _MAX_ITER, _N_LISTS, _TRAINED_TL_CTE


# ---------------------------------------------------------------------------
# ROUND 9 — ann_ivfpq_refine: FAISS IndexRefineFlat over IndexIVFPQ —
# ADC shortlist of k * refine_factor, exact re-rank of just those rows.
# The oracle extends the shared ADC chain with the shortlist LIMIT and
# the exact-int re-rank join.
# ---------------------------------------------------------------------------
@register(
    "ann_ivfpq_refine",
    _TRAINED_TL_CTE + _IVFPQ_ADC_CTES + """
, short AS (
  SELECT vec_id, adc_d2 FROM adc ORDER BY adc_d2, vec_id LIMIT 40
), rer AS (
  SELECT s.vec_id, s.adc_d2,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(list_zip(w.v, (SELECT v FROM qv0)),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))),
           (a, b) -> a + b) AS exact_d2
  FROM short s JOIN vecs w USING (vec_id)
)
SELECT ROW_NUMBER() OVER (ORDER BY exact_d2, vec_id)::INT AS rank,
       vec_id, adc_d2::BIGINT AS adc_d2, exact_d2::BIGINT AS exact_d2
FROM rer ORDER BY exact_d2, vec_id LIMIT 10
""",
)
def ann_ivfpq_refine_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production two-stage ANN serving shape: compressed-index
    shortlist (trained IVF + residual PQ + ADC), exact re-rank of the
    shortlist only (similarity.ann_ivfpq_refine). The oracle replays
    the full composition — training, residuals, codes, LUT sums,
    shortlist, exact re-rank — in exact integers."""
    from ..operators import similarity

    return similarity.ann_ivfpq_refine(
        load_table(spark, sf_dir, "embeddings"),
        query_vec_id=0,
        k=10,
        refine_factor=4,
        nprobe=2,
        m=4,
        n_codes=8,
        n_lists=_N_LISTS,
        max_iter=_MAX_ITER,
    )


# ---------------------------------------------------------------------------
# ROUND 9 — pq_code_health: the encode-path ops twin of ivf_list_health.
# Every corpus vector is encoded (the index ADD path); the report is the
# per-(subspace, code) census with exact distortion — dead codes and
# distortion drift are the retrain-the-codebook signals.
# ---------------------------------------------------------------------------
@register(
    "pq_code_health",
    _TRAINED_TL_CTE + """
, resid AS (
  SELECT t.vec_id,
         list_transform(list_zip(w.v, f.c), p -> p[1] - p[2]) AS r
  FROM tl t JOIN vecs w USING (vec_id)
  JOIN fcents f ON f.cid = t.list_id
), cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code_id, r
  FROM resid QUALIFY row_number() OVER (ORDER BY vec_id) <= 8
), packed AS (
  SELECT c.vec_id, s.s,
         MIN(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_zip(list_slice(c.r, s.s * 16 + 1, s.s * 16 + 16),
                          list_slice(b.r, s.s * 16 + 1, s.s * 16 + 16)),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))),
             (a, b) -> a + b) * 8 + b.code_id) AS p
  FROM resid c CROSS JOIN cb b, (SELECT UNNEST(range(4)) AS s) s
  GROUP BY c.vec_id, s.s
), census AS (
  SELECT s, p % 8 AS code, COUNT(*) AS n, SUM(p // 8) AS dsum
  FROM packed GROUP BY s, p % 8
), spine AS (
  SELECT sg.s, cg.code
  FROM (SELECT UNNEST(range(4)) AS s) sg,
       (SELECT UNNEST(range(8)) AS code) cg
), tot AS (SELECT SUM(n) // 4 AS nt FROM census)
SELECT sp.s::INT AS s, sp.code::INT AS code,
       COALESCE(c.n, 0)::BIGINT AS n_vectors,
       (COALESCE(c.n, 0) * 1000 // GREATEST(t.nt, 1))::BIGINT
         AS share_milli,
       COALESCE(c.dsum, 0)::BIGINT AS dist_sum,
       (COALESCE(c.dsum, 0) * 1000 // GREATEST(COALESCE(c.n, 0), 1))::BIGINT
         AS dist_mean_milli,
       SUM(CASE WHEN COALESCE(c.n, 0) = 0 THEN 1 ELSE 0 END)
         OVER (PARTITION BY sp.s)::BIGINT AS sub_empty_codes
FROM spine sp
LEFT JOIN census c ON c.s = sp.s AND c.code = sp.code
CROSS JOIN tot t
ORDER BY sp.s, sp.code
""",
)
def pq_code_health_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(subspace, code) PQ census over the WHOLE corpus: counts,
    shares, exact quantization distortion, dead-code counts
    (similarity.pq_code_health). Oracle replays training, residuals,
    and the per-sub code argmin in exact integers."""
    from ..operators import similarity

    return similarity.pq_code_health(
        load_table(spark, sf_dir, "embeddings"),
        m=4,
        n_codes=8,
        n_lists=_N_LISTS,
        max_iter=_MAX_ITER,
    )


# ---------------------------------------------------------------------------
# ROUND 9 — sub-8-bit grayscale PNG (color type 0, depths 1/2/4): the
# last decode_png grayscale gate. Bit-packed scanlines (MSB-first, each
# row pads its trailing bits), filters on packed bytes with bpp = 1,
# Adam7 composes per pass. JDK raster cross-check in pytest.
# ---------------------------------------------------------------------------
@register(
    "multimodal_png_gray_lowdepth_decode",
    """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h,
         CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS depth
  FROM documents
), px AS (
  SELECT doc_id, w, h, i.i AS p,
         (doc_id * 5003 + 257 * i.i) % (1 << depth) AS v
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS i) i
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       SUM((p + 1) * 6 * v)::BIGINT AS checksum
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_png_gray_lowdepth_decode_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL sub-8-bit grayscale PNG decode (multimodal.decode_png
    depths 1/2/4, color type 0): sample v_i = (d*5003 + 257*i) mod
    2^depth with the depth rotating 1/2/4 by doc_id — the MSB-first
    bit order and per-row trailing-bit padding break the checksum if
    either is wrong; odd doc_ids add Adam7 (per-pass packing), filters
    rotate per row. The decoder returns RAW samples replicated to RGB
    (JDK Raster convention), so the position-weighted checksum is
    sum((p+1) * 6v). Map-side Arrow decode; scalar-only shuffle."""
    import numpy as np

    from ..operators import multimodal

    def batches(it):
        import pandas as pd

        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 5, 6 + d % 3
                depth = (1, 2, 4)[d % 3]
                s = (
                    d * 5003 + 257 * np.arange(w * h, dtype=np.int64)
                ) % (1 << depth)
                blobs.append(
                    multimodal.encode_png_gray_lowdepth(
                        s.reshape(h, w),
                        depth,
                        filter_for_row=lambda y: y,
                        interlace=bool(d % 2),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "data": blobs})

    docs = load_table(spark, sf_dir, "documents")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    media = docs.select("doc_id").repartition(n_parts).mapInPandas(
        batches, "doc_id BIGINT, data BINARY"
    )
    return multimodal.image_decode_checksum(media).orderBy("doc_id")
