"""Registry slice: ROUND 6 additions — progressive JPEG (SOF2) decode
completing the T.81 Huffman family, FLAC lossless audio decode, and the
streaming SPRT monitor twin of the batch sequential test."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import _FLAT_COLS, _nested_events  # noqa: F401


# ---------------------------------------------------------------------------
# ROUND 6 — progressive JPEG: spectral-selection + successive-
# approximation scans (T.81 G.1.2) over the round-5 Huffman/IDCT
# machinery. The fixture is compressed-domain like the baseline leg —
# DC-only reconstruction lands exactly on dc+128 and both AC probes
# (zigzag-1 = 1, zigzag-9 = 2, Q=1) stay cos-bounded under 0.5 and
# round away — so the ORACLE IS THE SAME closed pixel formula as
# multimodal_jpeg_decode; what changes is the wire path being decoded:
# 6 scans (interleaved DC first Al=1, per-component AC bands 1-5 and
# 6-63 with EOBRUN chains, DC refinement bits, AC refinement with
# newly-significant runs + correction bits).
# ---------------------------------------------------------------------------
@register(
    "multimodal_jpeg_progressive_decode",
    """
WITH dims AS (
  SELECT doc_id, 8 * (2 + doc_id % 3) AS w, 8 * (2 + doc_id % 2) AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         ((p.p // w) // 8) * (w // 8) + (p.p % w) // 8 AS b
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS p) p
), ycc AS (
  SELECT doc_id, w, h,
         (128 + (doc_id * 7 + 13 * b) % 120 - 60)::DOUBLE AS y,
         (128 + (doc_id * 5 + 11 * b) % 40 - 20)::DOUBLE AS cb,
         (128 + (doc_id * 3 + 17 * b) % 40 - 20)::DOUBLE AS cr
  FROM px
), rgb AS (
  SELECT doc_id, w, h,
         GREATEST(0, LEAST(255, FLOOR(y + 1.402 * (cr - 128.0) + 0.5))) AS r,
         GREATEST(0, LEAST(255, FLOOR(y - 0.344136 * (cb - 128.0)
                                        - 0.714136 * (cr - 128.0) + 0.5))) AS g,
         GREATEST(0, LEAST(255, FLOOR(y + 1.772 * (cb - 128.0) + 0.5))) AS bb
  FROM ycc
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       3 AS channels,
       ROUND(SUM(r + g + bb) / (3.0 * ANY_VALUE(w) * ANY_VALUE(h)), 4)
         AS byte_mean
FROM rgb GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_jpeg_progressive_decode_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL progressive (SOF2) JPEG decode executing in-sandbox
    (multimodal.decode_jpeg + _progressive_scan): coefficients
    accumulate across 6 spectral-selection / successive-approximation
    scans — DC first (point transform Al=1), per-component AC first
    passes over bands 1-5 and 6-63 with EOBRUN skips, DC refinement
    raw bits, AC refinement with newly-significant runs and buffered
    correction bits — then ONE dequant+IDCT+JFIF finish at EOI. The
    codec most real web-crawl JPEGs need (progressive dominates crawl
    data), closing the round-5 gate at multimodal.decode_jpeg.

    Plan shape / 100 TB: identical to multimodal_jpeg_decode — decode
    is map-side Arrow-batched over the binary payload; only (doc_id,
    dims, mean) ever shuffles."""
    from ..operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.image_decode_features(
        multimodal.synthetic_progressive_jpeg_media(docs)
    )
