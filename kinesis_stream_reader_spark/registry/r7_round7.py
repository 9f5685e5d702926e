"""Registry slice — ROUND 7: IVF-pruned production twins for the
exact-kNN consumers (the r6 verdict's top structural gap), plus the
round's other additions.

The exact block-GEMM kNN (knn_graph) is the documented quadratic
diagnostic; these queries compute the SAME reports over IVF-pruned
candidate lists — nprobe * N * (N / n_lists) work, the shape that is
runnable at 100 TB — with an explicit edge-recall contract query
against the exact twin (the ann_recall_report pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._shared import load_table, register

# ---------------------------------------------------------------------------
# Shared oracle fragments: milli-quantized vectors with their list
# (= label) assignment, per-list exact-integer stats, and the map-side
# probe ranking — mirrors similarity.ivf_list_stats / ivf_probes
# bit-for-bit (integer dot / integer count, one IEEE division).
# ---------------------------------------------------------------------------
_IVF_QV_CTE = """
WITH qv AS (
  SELECT vec_id, label AS list_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
), co AS (
  SELECT list_id, t.i AS i, SUM(v[t.i]) AS s
  FROM qv, generate_series(1, 64) AS t(i)
  GROUP BY list_id, t.i
), ln AS (
  SELECT list_id, COUNT(*) AS n FROM qv GROUP BY list_id
), pk AS (
  SELECT a.vec_id, co.list_id, SUM(a.v[co.i] * co.s) AS dot
  FROM qv a, co GROUP BY a.vec_id, co.list_id
)
"""

# inner-product probe (descending centroid dot) -> pruned MIPS kNN
_IVF_KNN_IP_CTES = _IVF_QV_CTE + """
, probe AS (
  SELECT vec_id, list_id FROM (
    SELECT p.vec_id, p.list_id,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY CAST(p.dot AS DOUBLE) / ln.n DESC,
                                       p.list_id) AS pr
    FROM pk p JOIN ln USING (list_id)
  ) WHERE pr <= 2
), dots AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         CAST(list_dot_product(a.v, b.v) AS BIGINT) AS dot_q
  FROM probe pr JOIN qv a ON a.vec_id = pr.vec_id
  JOIN qv b ON b.list_id = pr.list_id AND b.vec_id <> a.vec_id
), iknn AS (
  SELECT vec_id, CAST(rank AS INT) AS rank, neighbor_id, dot_q FROM (
    SELECT vec_id, neighbor_id, dot_q,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dot_q DESC, neighbor_id) AS rank
    FROM dots) WHERE rank <= 5
)
"""


@register(
    "hubness_report_ivf",
    _IVF_KNN_IP_CTES + """
, occ AS (
  SELECT e.vec_id, COUNT(k.neighbor_id) AS n_k
  FROM embeddings e LEFT JOIN iknn k ON k.neighbor_id = e.vec_id
  GROUP BY e.vec_id
)
SELECT n_k::BIGINT AS k_occurrence, COUNT(*)::BIGINT AS n_vectors
FROM occ GROUP BY n_k ORDER BY n_k
""",
)
def hubness_report_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness (k-occurrence) histogram over the IVF-PRUNED kNN graph —
    the production twin of hubness_report: the exact report's kernel is
    the documented quadratic block-GEMM diagnostic; this one rides
    ivf_knn_graph (nprobe=2), whose work is nprobe * N * (N / n_lists).
    The recall contract vs the exact graph is its own query
    (ivf_knn_recall_report), so this report stays sub-quadratic.

    Plan shape / 100 TB: map-side probe assignment (one broadcast row of
    per-list integer stats), ONE list_id-keyed cogroup for the GEMM,
    then two long-keyed partial aggs for the histogram."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    knn = similarity.ivf_knn_graph(emb, k=5, nprobe=2)
    occ = (
        emb.select("vec_id")
        .join(
            knn.select(F.col("neighbor_id").alias("nid")),
            F.col("vec_id") == F.col("nid"),
            "left",
        )
        .groupBy("vec_id")
        .agg(F.count("nid").alias("n_k"))
    )
    return (
        occ.groupBy("n_k")
        .agg(F.count("*").alias("n_vectors"))
        .select(
            F.col("n_k").cast("long").alias("k_occurrence"),
            F.col("n_vectors").cast("long").alias("n_vectors"),
        )
        .orderBy("k_occurrence")
    )


@register(
    "lof_outlier_scores_ivf",
    _IVF_QV_CTE + """
, ls2 AS (
  SELECT list_id, SUM(s * s) AS s2 FROM co GROUP BY list_id
), probe AS (
  SELECT vec_id, list_id FROM (
    SELECT p.vec_id, p.list_id,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
             ORDER BY CAST(ls2.s2 AS DOUBLE) / (ln.n * ln.n)
                      - CAST(2 * p.dot AS DOUBLE) / ln.n ASC,
                      p.list_id) AS pr
    FROM pk p JOIN ln USING (list_id) JOIN ls2 USING (list_id)
  ) WHERE pr <= 2
), n2 AS (
  SELECT vec_id,
         list_aggregate(list_transform(v, x -> x * x), 'sum') AS nn
  FROM qv
), dots AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         na.nn + nb.nn - 2 * CAST(list_dot_product(a.v, b.v) AS BIGINT) AS d2
  FROM probe pr JOIN qv a ON a.vec_id = pr.vec_id
  JOIN qv b ON b.list_id = pr.list_id AND b.vec_id <> a.vec_id
  JOIN n2 na ON na.vec_id = a.vec_id
  JOIN n2 nb ON nb.vec_id = b.vec_id
), knn AS (
  SELECT vec_id, neighbor_id,
         CAST(FLOOR(sqrt(CAST(d2 AS DOUBLE)) + 0.5) AS BIGINT) AS dq,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2, neighbor_id) AS rank
  FROM dots QUALIFY rank <= 5
), kd AS (
  SELECT vec_id, MAX(dq) AS k_dist FROM knn GROUP BY 1
), reach AS (
  SELECT k.vec_id, GREATEST(kb.k_dist, k.dq) AS r
  FROM knn k JOIN kd kb ON kb.vec_id = k.neighbor_id
), lrd AS (
  SELECT vec_id, 5000000000000 // GREATEST(SUM(r), 1) AS lrd_q
  FROM reach GROUP BY 1
), lof AS (
  SELECT k.vec_id,
         SUM(lb.lrd_q) * 1000000 // (5 * la.lrd_q) AS lof_q
  FROM knn k
  JOIN lrd lb ON lb.vec_id = k.neighbor_id
  JOIN lrd la ON la.vec_id = k.vec_id
  GROUP BY k.vec_id, la.lrd_q
)
SELECT l.vec_id, kd.k_dist::BIGINT AS k_dist,
       FLOOR(CAST(l.lof_q AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS lof
FROM lof l JOIN kd USING (vec_id) ORDER BY l.vec_id
""",
)
def lof_outlier_scores_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOF over IVF-pruned L2 candidates — the production twin of
    lof_outlier_scores: probing uses the L2 centroid key (s2/n^2 -
    2 dot/n, exact-int numerators), within-list distances are exact
    via the MIPS reduction, and the scoring chain (reachability, lrd,
    LOF ratios) is lof_from_knn — the identical arithmetic the exact
    report uses, shared so the two can never diverge in definition.

    A pruned LOF is the standard scale deployment (approximate-kNN LOF);
    scores differ from exact only where a true k-neighbor lies outside
    the probed lists — bounded by the edge recall measured in
    ivf_knn_recall_report.

    Plan shape / 100 TB: map-side probes, one list_id cogroup GEMM,
    then three vec_id-keyed joins over k-bounded rows. Linear."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    knn = similarity.ivf_knn_l2(emb, k=5, nprobe=2)
    return similarity.lof_from_knn(knn, k=5)


@register(
    "ivf_knn_recall_report",
    _IVF_KNN_IP_CTES + """
, edots AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         CAST(list_dot_product(a.v, b.v) AS BIGINT) AS dot_q
  FROM qv a JOIN qv b ON a.vec_id <> b.vec_id
), eknn AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dot_q DESC, neighbor_id) AS rank
    FROM edots) WHERE rank <= 5
), ov AS (
  SELECT COUNT(*) AS n FROM eknn e
  JOIN iknn i ON e.vec_id = i.vec_id AND e.neighbor_id = i.neighbor_id
)
SELECT 5 AS k, 2 AS nprobe,
       (SELECT COUNT(*) FROM eknn)::BIGINT AS n_exact_edges,
       (SELECT COUNT(*) FROM iknn)::BIGINT AS n_ivf_edges,
       (SELECT n FROM ov)::BIGINT AS n_overlap,
       ROUND(CAST((SELECT n FROM ov) AS DOUBLE)
             / (SELECT COUNT(*) FROM eknn), 4) AS edge_recall
""",
)
def ivf_knn_recall_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge recall of the IVF-pruned kNN graph against the exact
    block-GEMM graph — the index-health contract that makes the pruned
    production twins (hubness_report_ivf, lof_outlier_scores_ivf)
    deployable: sweep nprobe until edge recall meets target, THEN trust
    the pruned reports. The ann_recall_report pattern lifted from
    one query vector to the all-kNN graph.

    This query intentionally contains the exact twin (it IS the
    diagnostic); at scale it runs on a sampled partition, not the
    corpus."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    # both graphs are referenced twice (own count + the overlap
    # semi-join); lazy-checkpoint each so the GEMM subtrees plan and
    # execute once (round 13, guide §7.3)
    exact = (
        similarity.knn_graph(emb, k=5)
        .select("vec_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    approx = (
        similarity.ivf_knn_graph(emb, k=5, nprobe=2)
        .select("vec_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    ex = exact.agg(F.count("*").alias("n_exact_edges"))
    iv = approx.agg(F.count("*").alias("n_ivf_edges"))
    ov = exact.join(approx, ["vec_id", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("n_overlap")
    )
    return ex.crossJoin(iv).crossJoin(ov).select(
        F.lit(5).cast("int").alias("k"),
        F.lit(2).cast("int").alias("nprobe"),
        "n_exact_edges",
        "n_ivf_edges",
        "n_overlap",
        F.round(F.col("n_overlap") / F.col("n_exact_edges"), 4).alias("edge_recall"),
    )


# ---------------------------------------------------------------------------
# ROUND 7 — compressed TIFF (6.0 public spec): LZW (§13, incl. the
# early-change width rule and MSB-first packing) and PackBits (§9),
# closing decode_tiff's compression gate — most real scanned TIFFs are
# LZW or PackBits. Both directions cross-validated against the JDK
# ImageIO TIFF codec (an independent implementation, so a symmetric
# early-change off-by-one cannot hide the way a roundtrip-only test
# would allow).
# ---------------------------------------------------------------------------
@register(
    "multimodal_tiff_lzw_decode",
    """
WITH dims AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN 120 ELSE 8 + doc_id % 5 END AS w,
         CASE WHEN doc_id % 5 = 0 THEN 112 ELSE 6 + doc_id % 3 END AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h, i.i AS p,
         (doc_id * 7 + 9 * i.i + ((3 * i.i) * (3 * i.i)) % 31) % 256 AS r,
         (doc_id * 7 + 9 * i.i + 3
          + ((3 * i.i + 1) * (3 * i.i + 1)) % 31) % 256 AS g,
         (doc_id * 7 + 9 * i.i + 6
          + ((3 * i.i + 2) * (3 * i.i + 2)) % 31) % 256 AS b
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS i) i
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       SUM((p + 1) * (r + 2 * g + 3 * b))::BIGINT AS checksum
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_tiff_lzw_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-TIFF decode (multimodal.decode_tiff with the
    round-7 LZW/PackBits strip decompression): compression rotates per
    doc (even doc_ids LZW, odd PackBits), byte order rotates
    independently, and every 5th doc is a 120x112 single-strip image
    whose quasi-random pixels drive the LZW table through ALL width
    bumps (9->10->11->12) and the NextCode-4094 ClearCode reset — the
    early-change machinery executes inside the query, not just in
    pytest. Position-weighted checksum catches strip mis-assembly and
    de-permutation errors. Map-side Arrow decode; scalar-only shuffle.

    Plan shape / 100 TB: per-strip decompression is map-only; per-doc
    scalars shuffle — scan-linear like every codec leg."""
    import numpy as np

    from ..operators import multimodal

    def batches(it):
        import pandas as pd

        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 5 == 0:
                    w, h, rps = 120, 112, 112  # one strip: all width bumps
                else:
                    w, h, rps = 8 + d % 5, 6 + d % 3, 1 + d % 4
                i = np.arange(w * h * 3, dtype=np.int64)
                pix = (d * 7 + 3 * i + (i * i) % 31) % 256
                blobs.append(
                    multimodal.encode_tiff(
                        pix.astype(np.uint8).reshape(h, w, 3),
                        big_endian=bool((d // 2) % 2),
                        rows_per_strip=rps,
                        compression=5 if d % 2 == 0 else 32773,
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
# ROUND 7 — Adam7 interlaced PNG (spec 8.2): the seven-pass pixel
# de-permutation composed with the existing filter inversion, closing
# decode_png's interlace gate. Crawl corpora contain interlaced PNGs;
# the position-weighted checksum catches pass mis-ordering and
# scatter errors a byte mean would miss. Ours->JDK ImageIO
# cross-validated in pytest (independent implementation).
# ---------------------------------------------------------------------------
@register(
    "multimodal_png_interlaced_decode",
    """
WITH dims AS (
  SELECT doc_id, 12 + doc_id % 7 AS w, 10 + doc_id % 5 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, i.i AS p,
         CASE doc_id % 3
           WHEN 0 THEN (doc_id * 7 + 3 * i.i) % 256
           WHEN 1 THEN (doc_id * 7 + i.i) % 256
           ELSE (doc_id * 7 + i.i) % 16 END AS base
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS i) i
), rgb AS (
  SELECT doc_id, w, h, p,
         base AS r,
         CASE WHEN doc_id % 3 = 0 THEN (base + 1) % 256
              ELSE (base * 3) % 256 END AS g,
         CASE WHEN doc_id % 3 = 0 THEN (base + 2) % 256
              ELSE (base * 7) % 256 END AS b
  FROM px
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       SUM((p + 1) * (r + 2 * g + 3 * b))::BIGINT AS checksum
FROM rgb GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_png_interlaced_decode_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL Adam7-interlaced PNG decode (multimodal.decode_png round-7
    interlace path): doc_id % 3 rotates RGB8 / paletted depth-8 /
    paletted DEPTH-4 (per-pass trailing-nibble packing), dimensions
    12-18 x 10-14 so all seven passes are non-empty, and the scanline
    filter rotates with the row index inside every pass. Verified by
    the position-weighted checksum. Map-side Arrow decode; scalar-only
    shuffle — scan-linear like every codec leg."""
    import numpy as np

    from ..operators import multimodal

    def batches(it):
        import pandas as pd

        pal256 = np.array(
            [(i, (i * 3) % 256, (i * 7) % 256) for i in range(256)],
            dtype=np.uint8,
        )
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 12 + d % 7, 10 + d % 5
                if d % 3 == 0:
                    pix = ((d * 7 + np.arange(w * h * 3)) % 256).astype(np.uint8)
                    blobs.append(
                        multimodal.encode_png(
                            pix.reshape(h, w, 3),
                            filter_for_row=lambda y: y,
                            interlace=True,
                        )
                    )
                elif d % 3 == 1:
                    idx = ((d * 7 + np.arange(w * h)) % 256).reshape(h, w)
                    blobs.append(
                        multimodal.encode_png_indexed(
                            idx, pal256, depth=8,
                            filter_for_row=lambda y: y, interlace=True,
                        )
                    )
                else:
                    idx = ((d * 7 + np.arange(w * h)) % 16).reshape(h, w)
                    blobs.append(
                        multimodal.encode_png_indexed(
                            idx, pal256[:16], depth=4,
                            filter_for_row=lambda y: y, interlace=True,
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
# ROUND 7 — streaming calibration monitor: Expected Calibration Error
# on the watermarked hourly census, completing the streaming guardrail
# family (SPRT, OBF, drift, quarantine, A/B) with the calibration leg.
# Same exact-integer ECE algebra as the batch ece_report (|1e6*k - sp|
# per bin, the float divisions cancel), per HOUR — the report a model
# owner pages on when a deployed scorer drifts out of calibration.
# ---------------------------------------------------------------------------
@register(
    "streaming_ece_monitor",
    """
WITH p AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
           AS ws,
         LEAST(GREATEST(CAST(FLOOR((value / 100 - 1) * 1e4 + 0.5) AS BIGINT)
                        + 20000, 0), 40000) * 25 AS pq,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), binned AS (
  SELECT ws, LEAST(pq // 100000, 9) AS bin, pq, pos FROM p
), cells AS (
  SELECT ws, bin, COUNT(*) AS n, SUM(pos) AS k, SUM(pq) AS sp
  FROM binned GROUP BY 1, 2
)
SELECT ws AS window_start, SUM(n)::BIGINT AS n_events,
       COUNT(*)::BIGINT AS n_bins,
       FLOOR(CAST(SUM(ABS(k * 1000000 - sp)) AS DOUBLE) / SUM(n) + 0.5) / 1e6
         AS ece,
       MAX(CAST(FLOOR(CAST(ABS(k * 1000000 - sp) AS DOUBLE) / n + 0.5)
                AS BIGINT)) / 1e6 AS max_gap
FROM cells GROUP BY ws ORDER BY ws
""",
)
def streaming_ece_monitor_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECE ON the stream: a deterministic Platt-style squash of the
    event's value column stands in for a deployed model's probability
    (pq = clamp(floor((value/100 - 1) * 1e4 + .5) + 2e4, 0, 4e4) * 25 —
    the batch ece_report's exact-integer squash applied to events),
    outcome = purchase. The watermarked hourly (window, bin) census
    drains with Trigger.AvailableNow; per-hour ECE/max-gap are the
    batch report's integer algebra on the drained census.

    Plan shape / 100 TB: ONE watermark-bounded stateful census whose
    state is |windows in flight| x 10 bins — the same census bound as
    the SPRT/OBF monitors (SCALING.md); the report is a grouped
    aggregate over the calendar-bounded drained census. The per-event
    squash is codegen (no UDF)."""
    from ..streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    lu = F.floor((F.col("value") / 100 - 1) * 1e4 + F.lit(0.5)).cast("long")
    pq = F.least(F.greatest(lu + 20000, F.lit(0)), F.lit(40000)) * 25
    census_stream = (
        stream.select(
            "ts",
            pq.alias("pq"),
            (F.col("event_type") == "purchase").cast("long").alias("pos"),
        )
        .withWatermark("ts", "2 hours")
        .groupBy(
            F.window(F.col("ts"), "1 hour").alias("w"),
            F.least(F.floor(F.col("pq") / 100000), F.lit(9)).cast("long").alias("bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("pos").alias("k"),
            F.sum("pq").alias("sp"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "bin",
            "n",
            "k",
            "sp",
        )
    )
    cells = jobs.run_available_now(census_stream, "streaming_ece_monitor")
    dev = F.abs(F.col("k") * 1000000 - F.col("sp"))  # exact bigint per bin
    gap_u = F.floor(dev.cast("double") / F.col("n") + F.lit(0.5)).cast("long")
    return (
        cells.select("ws", "n", dev.alias("dev"), gap_u.alias("gap_u"))
        .groupBy("ws")
        .agg(
            F.sum("n").alias("nn"),
            F.count("*").alias("nb"),
            F.sum("dev").alias("sdev"),
            F.max("gap_u").alias("mg"),
        )
        .select(
            F.col("ws").alias("window_start"),
            F.col("nn").cast("long").alias("n_events"),
            F.col("nb").cast("long").alias("n_bins"),
            (
                F.floor(F.col("sdev").cast("double") / F.col("nn") + F.lit(0.5))
                / 1e6
            ).alias("ece"),
            (F.col("mg") / 1e6).alias("max_gap"),
        )
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# ROUND 7 (second pass) — planar + tiled TIFF (6.0 §15): the remaining
# baseline layouts behind decode_tiff's gate. PlanarConfiguration 2
# stores plane-major segments; the tiled layout pads edge tiles to
# full (multiple-of-16) size, tiles across then down, plane-major when
# planar. Layout errors are caught by the formula oracle (independent
# of the encoder) AND the JDK ImageIO cross-check in pytest.
# ---------------------------------------------------------------------------
@register(
    "multimodal_tiff_tiled_decode",
    """
WITH dims AS (
  SELECT doc_id, 18 + doc_id % 9 AS w, 14 + doc_id % 7 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, i.i AS p,
         (doc_id * 7 + 3 * i.i) % 256 AS r,
         (doc_id * 7 + 3 * i.i + 1) % 256 AS g,
         (doc_id * 7 + 3 * i.i + 2) % 256 AS b
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS i) i
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       SUM((p + 1) * (r + 2 * g + 3 * b))::BIGINT AS checksum
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_tiff_tiled_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL planar/tiled-TIFF decode (multimodal.decode_tiff round-7
    layouts): doc_id % 4 rotates {planar strips, tiled chunky, tiled
    planar, chunky strips}; compression rotates {none, LZW, PackBits}
    independently; byte order alternates; image dims 18-26 x 14-20 so
    every 16x16-tiled doc has padded edge tiles in BOTH axes. The
    position-weighted checksum catches plane or tile mis-assembly.
    Map-side Arrow decode; scalar-only shuffle."""
    import numpy as np

    from ..operators import multimodal

    COMPS = (1, 5, 32773)

    def batches(it):
        import pandas as pd

        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 18 + d % 9, 14 + d % 7
                pix = ((d * 7 + np.arange(w * h * 3)) % 256).astype(np.uint8)
                arr = pix.reshape(h, w, 3)
                kw = dict(
                    big_endian=bool((d // 4) % 2), compression=COMPS[d % 3]
                )
                mode = d % 4
                if mode == 0:
                    blob = multimodal.encode_tiff(
                        arr, rows_per_strip=1 + d % 4, planar=True, **kw
                    )
                elif mode == 1:
                    blob = multimodal.encode_tiff(arr, tile=(16, 16), **kw)
                elif mode == 2:
                    blob = multimodal.encode_tiff(
                        arr, tile=(16, 16), planar=True, **kw
                    )
                else:
                    blob = multimodal.encode_tiff(arr, rows_per_strip=1 + d % 4, **kw)
                blobs.append(blob)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "data": blobs})

    docs = load_table(spark, sf_dir, "documents")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    media = docs.select("doc_id").repartition(n_parts).mapInPandas(
        batches, "doc_id BIGINT, data BINARY"
    )
    return multimodal.image_decode_checksum(media).orderBy("doc_id")


# ---------------------------------------------------------------------------
# ROUND 7 (second pass) — the nprobe TUNING CURVE in one pass: because
# scoring within probed candidates is EXACT, an exact edge (a, b)
# survives nprobe-pruning iff b's list sits within a's top-nprobe
# probe ranks (any candidate outscoring b is itself an exact-better
# neighbor, and there are < k of those) — so the whole recall-vs-
# nprobe curve falls out of ONE probe-rank table joined to the exact
# graph, no per-nprobe re-search. This is the sweep every IVF
# deployment runs before fixing nprobe ("measure, don't guess").
# ---------------------------------------------------------------------------
@register(
    "ivf_nprobe_sweep",
    _IVF_QV_CTE + """
, pr AS (
  SELECT p.vec_id, p.list_id,
         ROW_NUMBER() OVER (PARTITION BY p.vec_id
                            ORDER BY CAST(p.dot AS DOUBLE) / ln.n DESC,
                                     p.list_id) AS r
  FROM pk p JOIN ln USING (list_id)
), edots AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id, b.list_id AS nlist,
         CAST(list_dot_product(a.v, b.v) AS BIGINT) AS dot_q
  FROM qv a JOIN qv b ON a.vec_id <> b.vec_id
), eknn AS (
  SELECT vec_id, neighbor_id, nlist FROM (
    SELECT vec_id, neighbor_id, nlist,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dot_q DESC, neighbor_id) AS rank
    FROM edots) WHERE rank <= 5
), hit AS (
  SELECT pr.r FROM eknn e
  JOIN pr ON pr.vec_id = e.vec_id AND pr.list_id = e.nlist
), tot AS (SELECT COUNT(*) AS n FROM eknn)
SELECT np.np::INT AS nprobe,
       SUM(CASE WHEN hit.r <= np.np THEN 1 ELSE 0 END)::BIGINT AS n_overlap,
       ROUND(CAST(SUM(CASE WHEN hit.r <= np.np THEN 1 ELSE 0 END) AS DOUBLE)
             / (SELECT n FROM tot), 4) AS edge_recall
FROM (SELECT UNNEST(range(1, (SELECT COUNT(*) FROM ln) + 1)) AS np) np, hit
GROUP BY np.np ORDER BY np.np
""",
)
def ivf_nprobe_sweep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge recall of the IVF-pruned kNN graph at EVERY nprobe in one
    pass (similarity.ivf_probe_ranks + the exact graph): the curve a
    deployment reads to pick the smallest nprobe meeting its recall
    target. The last row (nprobe = n_lists) must read 1.0 — the
    exactness-recovery invariant, here visible in the report itself.

    Plan shape / 100 TB: probe ranks are map-side (one broadcast stats
    row, codegen array sort + posexplode); the curve is the exact
    graph (the documented diagnostic) joined once to ranks and folded
    by a |lists|-row cumulative census. At scale the exact side runs
    on a sampled query set, making the sweep linear."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    # exact feeds both the hit join and the n_exact census — checkpoint
    # so the block-GEMM subtree plans and executes once (round 13)
    exact = (
        similarity.knn_graph(emb, k=5)
        .select("vec_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    ranks = similarity.ivf_probe_ranks(emb, metric="ip")
    lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("list_id")
    )
    hit = exact.join(F.broadcast(lab), "neighbor_id").join(
        ranks, ["vec_id", "list_id"]
    )
    n_lists = emb.select("label").distinct().count()
    nps = spark.range(1, n_lists + 1).select(F.col("id").cast("int").alias("nprobe"))
    tot = exact.agg(F.count("*").alias("n_exact"))
    return (
        nps.join(
            hit.select("probe_rank"), F.col("probe_rank") <= F.col("nprobe"), "left"
        )
        .groupBy("nprobe")
        .agg(F.count("probe_rank").alias("n_overlap"))
        .crossJoin(F.broadcast(tot))
        .select(
            "nprobe",
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.round(F.col("n_overlap") / F.col("n_exact"), 4).alias("edge_recall"),
        )
        .orderBy("nprobe")
    )


# ---------------------------------------------------------------------------
# ROUND 7 (second pass) — PNG color types 0 (grayscale) and 6 (RGBA):
# with palette and RGB already real, these close the last COMMON crawl
# PNG variants (16-bit stays gated). The 4-byte RGBA filter unit runs
# through every scanline filter and Adam7, so a channel-offset bug
# corrupts RGB and breaks the checksum even though alpha itself is
# dropped from the report. JDK raster cross-check in pytest.
# ---------------------------------------------------------------------------
@register(
    "multimodal_png_colortype_decode",
    """
WITH dims AS (
  SELECT doc_id, 9 + doc_id % 6 AS w, 7 + doc_id % 4 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, i.i AS p,
         CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7 + i.i) % 256
              ELSE (doc_id * 7 + 4 * i.i) % 256 END AS r,
         CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7 + i.i) % 256
              ELSE (doc_id * 7 + 4 * i.i + 1) % 256 END AS g,
         CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7 + i.i) % 256
              ELSE (doc_id * 7 + 4 * i.i + 2) % 256 END AS b
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS i) i
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       SUM((p + 1) * (r + 2 * g + 3 * b))::BIGINT AS checksum
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_png_colortype_decode_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL grayscale / RGBA PNG decode (multimodal.decode_png round-7
    color types): even doc_ids are 8-bit GRAY (decoder replicates to
    RGB), odd are RGBA (alpha = (d*7 + 4p + 3) %% 256 on the wire,
    dropped from the checksum — but a filter-unit or channel-offset
    error shifts RGB and breaks it); doc_id %% 4 >= 2 adds Adam7
    interlace on top, filters rotating per row. Map-side Arrow decode;
    scalar-only shuffle."""
    import numpy as np

    from ..operators import multimodal

    def batches(it):
        import pandas as pd

        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 9 + d % 6, 7 + d % 4
                il = (d % 4) >= 2
                if d % 2 == 0:
                    v = ((d * 7 + np.arange(w * h)) % 256).astype(np.uint8)
                    blobs.append(
                        multimodal.encode_png_gray(
                            v.reshape(h, w),
                            filter_for_row=lambda y: y,
                            interlace=il,
                        )
                    )
                else:
                    v = ((d * 7 + np.arange(w * h * 4)) % 256).astype(np.uint8)
                    blobs.append(
                        multimodal.encode_png_rgba(
                            v.reshape(h, w, 4),
                            filter_for_row=lambda y: y,
                            interlace=il,
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
# ROUND 7 (second pass) — stereo WAV: the most common real-world audio
# container variant behind decode_wav's mono gate. Channels are
# sample-interleaved at the fmt-declared count (block align 2*ch);
# per-channel position-weighted checksums catch de-interleave and
# channel-swap errors a mixed sum would not.
# ---------------------------------------------------------------------------
@register(
    "multimodal_wav_stereo_decode",
    """
WITH lens AS (
  SELECT doc_id, 40 + doc_id % 30 AS n,
         CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                         ELSE 44100 END AS rate
  FROM documents
), s AS (
  SELECT doc_id, n, rate, j.j AS j,
         ((doc_id * 13 + 5 * j.j) % 65536) - 32768 AS l,
         ((doc_id * 29 + 7 * j.j) % 65536) - 32768 AS r
  FROM lens, LATERAL (SELECT UNNEST(range(n)) AS j) j
)
SELECT doc_id, ANY_VALUE(rate) AS sample_rate,
       ANY_VALUE(n)::BIGINT AS n_frames,
       SUM((j + 1) * l)::BIGINT AS left_checksum,
       SUM((j + 1) * r)::BIGINT AS right_checksum
FROM s GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_wav_stereo_decode_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL stereo-WAV decode (multimodal.decode_wav_multichannel):
    left channel L_j = ((d*13 + 5j) mod 2^16) - 2^15, right uses
    (d*29 + 7j) — distinct per-channel formulas so a channel swap or
    off-by-one de-interleave breaks the per-channel position-weighted
    checksums. Rates rotate 8000/16000/44100. Media built by a
    separate stage (house codec contract); map-side Arrow decode;
    scalar-only shuffle."""
    import numpy as np

    from ..operators import multimodal

    RATES = (8000, 16000, 44100)

    def media_batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 40 + d % 30
                j = np.arange(n, dtype=np.int64)
                left = ((d * 13 + 5 * j) % 65536) - 32768
                right = ((d * 29 + 7 * j) % 65536) - 32768
                frames = np.stack([left, right], axis=1).astype(np.int16)
                rows.append(
                    (d, multimodal.encode_wav_multichannel(frames, rate=RATES[d % 3]))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "data"])

    def decode_batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["data"]):
                rate, frames = multimodal.decode_wav_multichannel(bytes(blob))
                f = frames.astype(np.int64)
                wgt = np.arange(1, f.shape[0] + 1, dtype=np.int64)
                rows.append(
                    (
                        int(doc_id),
                        rate,
                        f.shape[0],
                        int((wgt * f[:, 0]).sum()),
                        int((wgt * f[:, 1]).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_frames",
                    "left_checksum", "right_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    media = docs.select("doc_id").repartition(n_parts).mapInPandas(
        media_batches, "doc_id BIGINT, data BINARY"
    )
    return media.mapInPandas(
        decode_batches,
        "doc_id BIGINT, sample_rate INT, n_frames BIGINT, "
        "left_checksum BIGINT, right_checksum BIGINT",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# ROUND 7 (second pass) — 16-bit RGB PNG (depth 16): the scientific/
# archival variant, closing decode_png's LAST depth gate. Filters act
# on the 6-byte pixel unit (spec 9.2: filters are byte-wise regardless
# of depth); samples recombine big-endian; Adam7 composes. JDK
# 16-bit-raster cross-check in pytest.
# ---------------------------------------------------------------------------
@register(
    "multimodal_png16_decode",
    """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, i.i AS p,
         (doc_id * 4099 + 257 * (3 * i.i)) % 65536 AS r,
         (doc_id * 4099 + 257 * (3 * i.i + 1)) % 65536 AS g,
         (doc_id * 4099 + 257 * (3 * i.i + 2)) % 65536 AS b
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS i) i
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       SUM((p + 1) * (r + 2 * g + 3 * b))::BIGINT AS checksum
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_png16_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 16-bit PNG decode (multimodal.decode_png depth-16 path):
    sample s_i = (d*4099 + 257*i) mod 2^16 — the 257 step makes high
    and low bytes move together, so a byte-order or recombination
    error breaks the checksum; odd doc_ids add Adam7, filters rotate
    per row. Map-side Arrow decode; scalar-only shuffle."""
    import numpy as np

    from ..operators import multimodal

    def batches(it):
        import pandas as pd

        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 5, 6 + d % 3
                s = ((d * 4099 + 257 * np.arange(w * h * 3, dtype=np.int64)) % 65536)
                blobs.append(
                    multimodal.encode_png16(
                        s.astype(np.uint16).reshape(h, w, 3),
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
