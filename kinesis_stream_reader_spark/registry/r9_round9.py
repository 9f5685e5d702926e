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


# ---------------------------------------------------------------------------
# ROUND 9 — streaming_cusum_monitor: tabular CUSUM ON the stream — the
# guardrail family's change-point leg (next to drift/SPRT/OBF/ECE).
# Same exact-integer prefix-sum identity as the batch cusum_changepoint
# (S+_t = P_t - min(P_0..P_t, 0)), applied to the drained hourly census.
# ---------------------------------------------------------------------------
@register(
    "streaming_cusum_monitor",
    """
WITH hrs AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         COUNT(*) AS x
  FROM events GROUP BY 1
), tot AS (SELECT COUNT(*) AS nh, SUM(x) AS s FROM hrs),
base AS (SELECT window_start, x, nh, s, nh * x - s AS dev FROM hrs, tot),
pref AS (
  SELECT *, SUM(dev) OVER (ORDER BY window_start
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM base
), cus AS (
  SELECT window_start, x, nh, s,
         p - LEAST(MIN(p) OVER (ORDER BY window_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS up_u,
         GREATEST(MAX(p) OVER (ORDER BY window_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) - p AS down_u
  FROM pref
)
SELECT window_start, x::BIGINT AS x,
       FLOOR(up_u / CAST(nh AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cusum_up,
       FLOOR(down_u / CAST(nh AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cusum_down,
       up_u > 4 * s AS alarm_up,
       down_u > 4 * s AS alarm_down
FROM cus ORDER BY window_start
""",
)
def streaming_cusum_monitor_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point monitoring ON the stream: the watermarked hourly
    census (windowed_counts, Trigger.AvailableNow drain) feeds the
    batch cusum_changepoint arithmetic — per-hour deviations from the
    series mean as nh-scaled exact bigints, the clipped CUSUM recursion
    rewritten as prefix-sum minus running extremum (two stock window
    passes, no per-row iteration), alarms at 4x the mean hourly level.
    Drained result equals the batch oracle exactly because the fixture
    drains completely.

    Plan shape / 100 TB: the stream pays one watermark-bounded stateful
    census (state = |windows in flight| x |types|); the CUSUM walk is
    algebra over the drained CALENDAR-BOUNDED census — hours, not
    events (8.8k rows/year), one partition's window pass forever."""
    from ..streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    win = jobs.run_available_now(
        jobs.windowed_counts(stream), "streaming_cusum_monitor"
    )
    hrs = win.groupBy("window_start").agg(F.sum("n_events").alias("x"))
    tot = hrs.agg(F.count("*").alias("nh"), F.sum("x").alias("s"))
    from pyspark.sql.window import Window

    w = Window.orderBy("window_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pref = (
        hrs.join(F.broadcast(tot))
        .select(
            "window_start",
            "x",
            "nh",
            "s",
            (F.col("nh") * F.col("x") - F.col("s")).alias("dev"),
        )
        .withColumn("p", F.sum("dev").over(w))
    )
    cus = pref.select(
        "window_start",
        "x",
        "nh",
        "s",
        (F.col("p") - F.least(F.min("p").over(w), F.lit(0))).alias("up_u"),
        (F.greatest(F.max("p").over(w), F.lit(0)) - F.col("p")).alias(
            "down_u"
        ),
    )
    thresh = F.lit(4) * F.col("s")
    return cus.select(
        "window_start",
        F.col("x").cast("long").alias("x"),
        (
            F.floor(F.col("up_u") / F.col("nh").cast("double") * 1e6 + F.lit(0.5))
            / 1e6
        ).alias("cusum_up"),
        (
            F.floor(
                F.col("down_u") / F.col("nh").cast("double") * 1e6 + F.lit(0.5)
            )
            / 1e6
        ).alias("cusum_down"),
        (F.col("up_u") > thresh).alias("alarm_up"),
        (F.col("down_u") > thresh).alias("alarm_down"),
    ).orderBy("window_start")


# ---------------------------------------------------------------------------
# ROUND 9 — dedup_url_canonicalize: web-corpus URL dedup, stage one of
# the CCNet/RefinedWeb pipelines (dedup fetched pages by canonical URL
# before any content hashing). The fixture synthesizes deterministic
# MESSY variants (case, default port, trailing slash, utm_ params,
# param order, fragments) so every canonicalization rule is load-
# bearing; both engines canonicalize FROM THE RAW STRING.
# ---------------------------------------------------------------------------
_RAW_URL_SQL = """
  CASE doc_id % 2 WHEN 0 THEN 'https' ELSE 'HTTPS' END || '://' ||
  CASE doc_id % 3
    WHEN 0 THEN upper(source) || '.Example.COM'
    WHEN 1 THEN source || '.example.com'
    ELSE source || '.EXAMPLE.com' END ||
  CASE WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END ||
  '/articles/' || (doc_id % 50) ||
  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
  CASE doc_id % 4
    WHEN 0 THEN '?utm_source=feed&id=' || (doc_id % 10)
    WHEN 1 THEN '?id=' || (doc_id % 10) || '&ref=home'
    WHEN 2 THEN '?ref=home&id=' || (doc_id % 10)
    ELSE '?id=' || (doc_id % 10) END ||
  CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END
"""


@register(
    "dedup_url_canonicalize",
    f"""
WITH raw AS (
  SELECT doc_id, {_RAW_URL_SQL} AS raw_url FROM documents
), parts AS (
  SELECT doc_id, raw_url,
         split_part(raw_url, '#', 1) AS nf
  FROM raw
), comp AS (
  SELECT doc_id, raw_url,
         lower(split_part(nf, '://', 1)) AS scheme,
         split_part(nf, '://', 2) AS rest,
         split_part(split_part(nf, '://', 2), '/', 1) AS hostport
  FROM parts
), fields AS (
  SELECT doc_id, raw_url, scheme,
         lower(split_part(hostport, ':', 1)) AS host,
         CASE WHEN contains(hostport, ':')
                   AND split_part(hostport, ':', 2)
                       <> (CASE WHEN scheme = 'http' THEN '80' ELSE '443' END)
              THEN ':' || split_part(hostport, ':', 2) ELSE '' END AS port,
         substr(rest, length(hostport) + 1) AS path_q
  FROM comp
), pq AS (
  SELECT doc_id, raw_url, scheme, host, port,
         split_part(path_q, '?', 1) AS path,
         CASE WHEN contains(path_q, '?')
              THEN split_part(path_q, '?', 2) ELSE '' END AS query
  FROM fields
), canon AS (
  SELECT doc_id, raw_url,
         scheme || '://' || host || port ||
         (CASE WHEN path = '/' THEN '/'
               ELSE regexp_replace(path, '/$', '') END) ||
         (CASE WHEN params <> '' THEN '?' || params ELSE '' END)
           AS canonical_url
  FROM (
    SELECT *,
           array_to_string(list_sort(list_filter(string_split(query, '&'),
             x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS params
    FROM pq)
)
SELECT canonical_url,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT raw_url)::BIGINT AS n_raw_variants,
       MIN(doc_id)::BIGINT AS keep_doc_id
FROM canon GROUP BY canonical_url ORDER BY canonical_url
""",
)
def dedup_url_canonicalize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup groups (dedup.canonical_url): fragments
    dropped, scheme/host lowercased, default ports stripped, non-root
    trailing slash stripped, utm_* params dropped and survivors
    sorted; one groupBy on the canonical string yields the dup groups
    with their keeper (MIN doc_id) and raw-variant census.

    Plan shape / 100 TB: canonicalization is map-only codegen string
    algebra (no UDF); the only shuffle is the groupBy on the canonical
    URL — partial-agg'd, key space = |distinct pages|. This is the
    cheapest dedup stage and always runs FIRST in a web pipeline."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.expr(_RAW_URL_SQL).alias("raw_url"),
    )
    return (
        raw.select(
            "doc_id",
            "raw_url",
            dedup.canonical_url(F.col("raw_url")).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("raw_url").cast("long").alias("n_raw_variants"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
        )
        .orderBy("canonical_url")
    )


# ---------------------------------------------------------------------------
# ROUND 9 — CCITT bilevel TIFF: Group 3 1-D Modified Huffman
# (compression 2, "CCITT RLE"), Group 4 (compression 4, T.6 MMR — pure
# 2-D pass/vertical/horizontal coding) and uncompressed — the
# fax/document-scan leg of the TIFF family. ~190 hand-entered ITU-T
# T.4 run codes + the T.6 mode codes, JDK ImageIO cross-validated both
# directions in pytest.
# ---------------------------------------------------------------------------
@register(
    "multimodal_tiff_ccitt_decode",
    """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 9 AS w, 6 + doc_id % 4 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, i.i AS p,
         CASE WHEN (doc_id * 31 + 7 * i.i) % 97
                   < 20 + 25 * (doc_id % 4)
              THEN 1 ELSE 0 END AS v
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS i) i
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       SUM((p + 1) * 6 * v)::BIGINT AS checksum
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_tiff_ccitt_decode_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL bilevel TIFF decode (multimodal.decode_tiff bilevel path):
    luma v_i = [(d*31 + 7i) mod 97 < 20 + 25*(d mod 4)] — the rotating
    threshold gives every doc a different white/black mix, so the
    white-first alternation and the zero-length leading white run are
    both exercised; compression rotates none/CCITT-MH/CCITT-G4 by
    d % 3 (G4's pass/vertical/horizontal modes all fire on this
    fixture), byte order by d % 2, multi-strip layout throughout (each
    G4 strip restarts its all-white reference line). Photometric 0
    is applied (luma out, the JDK raster convention), so the checksum
    is sum((p+1) * 6v). Map-side Arrow decode; scalar-only shuffle."""
    import numpy as np

    from ..operators import multimodal

    def batches(it):
        import pandas as pd

        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 16 + d % 9, 6 + d % 4
                t = 20 + 25 * (d % 4)
                v = (
                    (d * 31 + 7 * np.arange(w * h, dtype=np.int64)) % 97 < t
                ).astype(np.int64)
                blobs.append(
                    multimodal.encode_tiff_bilevel(
                        v.reshape(h, w),
                        compression=(1, 2, 4)[d % 3],
                        big_endian=bool(d % 2),
                        rows_per_strip=3,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "data": blobs})

    docs = load_table(spark, sf_dir, "documents")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    media = docs.select("doc_id").repartition(n_parts).mapInPandas(
        batches, "doc_id BIGINT, data BINARY"
    )
    return multimodal.image_decode_checksum(media).orderBy("doc_id")


# ---------------------------------------------------------------------------
# ROUND 9 — wordpiece_encode: the BERT tokenizer's greedy longest-
# match-first walk with a corpus-derived vocabulary — the third
# tokenizer-family leg next to bpe_train_merges/bpe_encoded_vocab.
# Exact integer counting end to end; the oracle replays vocab
# construction AND the greedy walk (recursive CTE peeling the longest
# matching piece, head vs '##'-continuation classes).
# ---------------------------------------------------------------------------
@register(
    "wordpiece_encode",
    """
WITH RECURSIVE words AS (
  SELECT tok AS word, COUNT(*) AS n
  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY tok
), heads AS (
  SELECT substr(word, 1, l.l) AS piece, l.l AS len
  FROM words, LATERAL (SELECT UNNEST(range(1, 7)) AS l) l
  WHERE length(word) >= l.l
  GROUP BY 1, 2
  HAVING l.l = 1 OR SUM(n) >= 50
), conts AS (
  SELECT substr(word, j.j, l.l) AS piece, l.l AS len
  FROM words,
       LATERAL (SELECT UNNEST(range(2, length(word) + 1)) AS j) j,
       LATERAL (SELECT UNNEST(range(1, 7)) AS l) l
  WHERE j.j + l.l - 1 <= length(word)
  GROUP BY 1, 2
  HAVING l.l = 1 OR SUM(n) >= 50
), vocab AS (
  SELECT piece, len, TRUE AS is_head FROM heads
  UNION ALL
  SELECT piece, len, FALSE AS is_head FROM conts
), seg AS (
  SELECT word, n, CAST(1 AS BIGINT) AS pos,
         CAST('' AS VARCHAR) AS pieces, 0 AS np
  FROM words
  UNION ALL
  SELECT word, n, pos + best AS pos,
         pieces || CASE WHEN pos = 1 THEN substr(word, pos::INT, best::INT)
                        ELSE ' ##' || substr(word, pos::INT, best::INT) END
           AS pieces,
         np + 1 AS np
  FROM (
    SELECT s.word, s.n, s.pos, s.pieces, s.np, MAX(v.len) AS best
    FROM seg s
    JOIN vocab v
      ON v.is_head = (s.pos = 1)
     AND v.piece = substr(s.word, s.pos::INT, v.len::INT)
    WHERE s.pos <= length(s.word)
    GROUP BY s.word, s.n, s.pos, s.pieces, s.np
  )
)
SELECT word, n::BIGINT AS n_occurrences, pieces, np::INT AS n_pieces
FROM seg WHERE pos > length(word)
ORDER BY word
""",
)
def wordpiece_encode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy WordPiece over the corpus vocabulary
    (text.wordpiece_encode): head pieces = frequency-thresholded word
    prefixes, continuations = '##'-marked internal substrings, single
    characters unconditional (totality). One row per distinct word:
    occurrence count, piece sequence, fertility."""
    from ..operators import text

    return text.wordpiece_encode(
        load_table(spark, sf_dir, "documents"), max_piece=6, min_count=50
    )
