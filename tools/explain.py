"""Dump formatted physical plans for the headline queries into PLANS.md
— the evidence trail for the scale design (pushdown, pruning,
broadcasts, codegen spans). Usage: python tools/explain.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

from kinesis_stream_reader_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

HEADLINE = [
    ("records_pipeline", "full reference pipeline: window + filters over nested events"),
    ("filter_server_name", "single predicate filter (nested projection collapsed)"),
    ("agg_pricing_summary", "TPC-H Q1-style scan-bound aggregate"),
    ("tpch_q6", "range-predicate pushdown"),
    ("join_enrich", "orders -> customer -> nation -> region broadcast enrichment"),
    ("join_asof", "as-of join via union + running-last window"),
    ("top_k_customers", "global top-k as TakeOrderedAndProject"),
    ("dedup_ngram_jaccard", "inverted-index near-dup join"),
    ("dedup_minhash_lsh", "banded MinHash LSH candidates + verification"),
    ("ann_bruteforce", "broadcast query vector + TakeOrdered scoring"),
    ("ann_ivf", "centroid-probed inverted lists: broadcast semi-join pruning"),
    ("local_supplier_volume", "TPC-H Q5 shape: one fact shuffle, all dims broadcast"),
    ("join_range_bands", "non-equi theta join as BroadcastNestedLoopJoin"),
    ("window_running_total", "analytic frame: single shuffle, incremental eval"),
    ("late_shipments", "EXISTS semi join with non-equi residual (TPC-H Q4 shape)"),
    ("disjunctive_part_revenue", "OR-of-ANDs residual on a broadcast join (Q19 shape)"),
    ("orders_above_customer_avg", "decorrelated scalar subquery as one window pass"),
    ("join_outer_full", "full outer reconcile: aggregate-first then SMJ"),
    ("vector_norms", "higher-order array functions, zero shuffle"),
    ("split_train_test", "deterministic key-hash split, map-only + tiny agg"),
    ("volume_shipping", "TPC-H Q7: 6-table join, 2-row nation broadcasts, one fact shuffle"),
    ("window_range_frame", "value-based RANGE frame over epoch seconds"),
    ("compact_latest_state", "CDC compaction as argmax aggregate — no window sort"),
    ("multimodal_audio_chunks", "1->N payload framing entirely inside codegen"),
    ("market_share", "TPC-H Q8: 7-table join, fact side never shuffles (all dims broadcast)"),
    ("corpus_decontaminate", "benchmark-gram broadcast anti-probe: no training-side shuffle"),
    ("sessionize_batch", "gaps-and-islands: one user_id shuffle shared by both window passes"),
    ("rolling_active_users", "windowed distinct: pre-dedup to (day,user) then tiny range join"),
    ("min_cost_supplier", "TPC-H Q2: decorrelated per-part min, window over the aggregate"),
    ("important_stock", "TPC-H Q11: global mean-relative threshold, nation sliver broadcast"),
    ("excess_inventory_suppliers", "TPC-H Q20: nested-IN decorrelated to windowed dominance"),
    ("text_repetition", "per-doc token histogram via two partial-agg shuffles"),
    ("ann_ivfpq", "FAISS IndexIVFPQ: probe-pruned broadcast semi-join + exact-bigint ADC"),
    ("curriculum_shards", "census-derived decile edges broadcast back; numbering partitioned by shard"),
    ("gopher_repetition_rules", "hashed n-gram censuses: explode -> two partial-agg shuffles on longs"),
    ("dedup_substring_scrub", "span postings -> interval union -> exists() membership, no range join"),
    ("ccnet_perplexity_buckets", "bigram LM + per-lang tercile census, vocabulary-bounded shuffles"),
    ("apply_mixture_weights", "computed-weight md5 gate: broadcast weights, map-only filter"),
    ("join_bucketed_colocated", "bucketed fact-to-fact join: zero Exchange on the join keys"),
    ("gap_fill_locf", "sequence+explode densify over the aggregate, LOCF window"),
    ("set_except_all", "exceptAll counted-union rewrite: no join"),
    ("snapshot_diff", "CDC: one co-partitioned full-outer SMJ, classification in projection"),
    ("scd2_from_changelog", "SCD2: both window passes share one user_id Exchange"),
    ("incremental_agg_merge", "base+delta merge: partial aggs, re-agg of tiny keyed states"),
    ("text_unigram_logprob", "unigram LM: vocab-bounded shuffle + score-back join"),
    ("bpe_pair_counts", "BPE pair census: codegen explode, pair-vocab-bounded exchange"),
    ("semdedup", "centroid assignment via broadcast seeds; pairing only within clusters"),
    ("corpus_shuffle_shards", "epoch shuffle: shard hash partition only, no global sort"),
    ("pagerank_step", "power iteration: out-degree agg reuses the edge exchange"),
    ("tfidf_top_terms", "tf-idf: one token relation feeds tf and df; rank over aggregate"),
    ("sample_weighted", "ES weighted sample: hash-uniform keys + TakeOrderedAndProject"),
    ("source_overlap_matrix", "overlap matrix: self-join on distinct fingerprints only"),
    ("source_quality_report", "per-source health: fingerprint window + conditional agg"),
    ("training_batches", "curation -> chunk -> pack: one added shuffle on the shard key"),
    ("dedup_containment", "directed containment via the same inverted-index postings join"),
    ("feature_quantile_bins", "GK-sketch decile edges broadcast back; codegen bucket assignment, no per-group sort"),
    ("ewma_smoothing", "bounded-frame EWMA: codegen HOF fold over the collected frame"),
    ("dedup_minhash_canonical", "near-dup DEFAULT contract: LSH candidates -> components -> doc->canonical, linear output"),
    ("dedup_substring_spans", "span-level dedup: posting self-count + interval-union window, no pair explosion"),
    ("ann_pq", "product quantization ADC: broadcast LUT, exact-bigint sums, TakeOrdered"),
    ("join_salted_skew", "skew salting: hash-salted big side x replicated broadcast dim"),
    ("ann_lsh", "md5-derived sign-LSH planes; bucket hamming probe, broadcast query"),
    ("join_interval_bucketed", "big-big interval join: bucket decomposition -> equi-join + codegen residual, no NLJ"),
    ("heavy_hitters_cms", "count-min sketch: d*w-bounded cell shuffle, min-over-cells probes"),
    ("bloom_semi_filter", "Bloom membership gate: m-bit-bounded build, broadcast bit-set probe"),
    ("graph_triangles", "triangle counting: degree-ordered orientation caps wedge fan-out"),
    ("graph_label_propagation", "LPA communities: vertex-keyed joins, exchange-reused rounds"),
    ("dsir_select", "DSIR selection: bucket-bounded censuses, broadcast ratio score-back"),
    ("gap_fill_interpolate", "densify + exact-bigint lerp: both bracket scans share one window exchange"),
    ("pareto_frontier", "2-D skyline: one range sort + running-max window, no dominance join"),
    ("anomaly_mad", "MAD outlier gate: two grouped medians + broadcast stats join"),
    ("rag_retrieval", "RAG flagship: map-only chunk+hash embed, broadcast query vectors, dim-join dot product"),
    ("ann_ivf_incremental", "IVF insert path: broadcast frozen centroids, argmin as min(struct) partial agg"),
    ("join_shuffle_hash_hint", "SHUFFLE_HASH hint: hash build instead of both-side sorts"),
    ("expectations_check", "constraint suite: one conditional-count agg + broadcast anti-join probe"),
    ("bpe_train_merges", "BPE trainer round: vocab-bounded pair census + islands merge windows"),
    ("drift_ks", "KS drift: ECDF running sums over the distinct-value relation"),
    ("interval_coverage", "sweep line: calendar-bounded delta agg + running sum"),
    ("table_checksum", "migration checksums: map-side hash + XOR partial agg per table"),
    ("model_eval_auc", "exact AUC via quantized-logit value census: corpus shuffle bounded by distinct values"),
    ("bm25_retrieval", "BM25: exploded tokens feed tf/dl, query+df broadcasts, per-query top-k window"),
    ("phrase_search", "positional postings self-join at pos+1, broadcast phrase table"),
    ("assoc_rules", "basket self-join co-occurrence: broadcast dims, partial-agg censuses"),
    ("chi2_independence", "35-cell contingency: one partial-agg shuffle + tiny marginal broadcasts"),
    ("cusum_changepoint", "CUSUM as prefix-sum + running-min: two windows over the day series"),
    ("grid_radius_join", "spatial radius join: 3x3 neighbor-cell explode keys the shuffle"),
    ("kmv_intersection", "KMV sketches: per-set top-k windows, k-row sketch combine"),
    ("bootstrap_ci", "x32 replicate fan-out inside the scan stage, one (type,rep) shuffle"),
    ("mmr_rerank", "MMR candidates: broadcast query scoring + TakeOrdered, greedy on k rows"),
    ("ndcg_eval", "NDCG: BM25 top-k + relevance censuses, ideal ranking over the label relation"),
    ("pca_power_iteration", "power iteration: codegen dot folds + 64-row per-dim aggregates, one-row v broadcast"),
    ("dataset_card", "flagship #4: one feature pass + fingerprint-census join, source-bounded card"),
    ("incremental_join_merge", "MV delta rule: four legs, AQE-chosen strategies, one view-keyed merge agg"),
    ("cohort_retention", "retention matrix: distinct-activity pass, exchange-reused user join"),
    ("temporal_reachability", "temporal BFS round: frontier equi-join + residual, MIN partial agg"),
    ("source_ablation_report", "leave-one-out algebra: census-keyed aggregates, zero per-source passes"),
    ("surrogate_keys_dense", "dense ids: bucket counts + tiny offset window + parallel per-bucket numbering"),
    ("join_runtime_bloom_filter", "runtime bloom rewrite: might_contain gate ahead of the shuffle"),
    ("kcore_bounded", "k-core peel round: degree census + two semi joins, checkpoint-truncated"),
    ("rfm_segments", "RFM: one per-user pass, three NTILE windows, census out"),
    ("rolling_correlation", "five moments from one frame-bounded window over the day census"),
    ("token_budget_allocation", "greedy fill: source-bounded running-offset window"),
    ("knn_graph", "exact all-kNN: block-grid cogrouped GEMM, per-block top-k, one merge window"),
    ("ngram_novelty_curve", "first-owner census keyed on 8-byte gram hashes, exchange-reused join-back"),
    ("theil_sen_trend", "pairwise-slope median: self-join over the tiny (type, day) census"),
    ("quantiles_merged_histograms", "two-level mergeable histogram: shard partials, 32-row bounded window"),
    ("pr_curve_points", "PR sweep on the quantized-logit census: prefix sums over cells, not rows"),
    ("kaplan_meier_survival", "KM curve: one user shuffle, then <=73-cell census algebra + broadcast fold"),
    ("winnowing_fingerprints", "MOSS winnowing: staged lead-window md5 grams, df-capped postings, vertex-restricted components"),
    ("join_lateral_topk", "decorrelated LATERAL LIMIT: WindowGroupLimit partial+final, broadcast join-back"),
    ("cuped_adjustment", "CUPED: integer-moment passes, broadcast one-row model, algebraic arm adjust"),
    ("logrank_test", "log-rank test: one subject shuffle, LOCF at-risk algebra on the (arm,t) census"),
    ("isotonic_calibration", "distributed PAV via minimax identity: bin-census 3-way broadcast join"),
    ("jackknife_ratio_ci", "delete-one-bucket jackknife: 32-row bucket census, broadcast scalar algebra"),
    ("spearman_daily", "Spearman rho: doubled integer midranks over the day census, exact moments"),
    ("mrr_recall_eval", "MRR/recall@k: BM25 top-k + all-terms relevance census, query-bounded joins"),
    ("welch_ttest", "Welch t: one shuffle to 2 rows of exact centi-moments, one-row algebra"),
    ("seasonal_decompose", "MA decomposition: day census absorbs the scan; 7-row frame + weekday census"),
    ("shapley_attribution", "exact Shapley: user shuffle to bitmasks, 16-cell lattice broadcast algebra"),
    ("hyperball_neighborhood", "HyperBall: fixed register state, round = join + max-agg; exact twin as oracle"),
    ("kneser_ney_logprob", "KN smoothing: one bigram census feeds all four count relations + score-back"),
    ("ipw_treatment_effect", "IPW: user shuffle -> 20-cell positivity-trimmed census, quantized terms"),
    ("experiment_readout", "A/B flagship: SRM + z + Welch + MDE from two partial-agg shuffles"),
    ("dedup_threshold_sweep", "threshold lattice on ONE blocked pair relation: N cutoffs, one pass"),
    ("join_asof_forward", "forward as-of: union + first-over-forward-frame, one shuffle, strict-after"),
    ("multimodal_audio_fingerprint", "H-K energy-sign fingerprint: map-side decode, hash-only shuffle"),
    ("dbscan_grid_clusters", "grid DBSCAN: cell census + 8-neighbor explode join, components on cells"),
    ("multimodal_keyframe_select", "keyframes: map-side frame stats, scene window + census join"),
    ("skipgram_negative_table", "word2vec negative table: vocab census, 50-row rank/prefix window"),
    ("sql_pipe_syntax", "Spark-4 pipe SQL: desugars to the SAME plan as the ANSI form"),
    ("sql_udf_table", "SQL table UDF: lateral correlation inlined to a projected explode"),
    ("mann_whitney_utest", "rank-sum U: quantized-value census + bounded prefix window, 1-row out"),
    ("anova_oneway", "one-way F: one shuffle to k group-moment rows, exact integer SSB/SSW"),
    ("link_prediction_adamic_adar", "AA link prediction: degree-joined wedge join, nano-unit exact sums"),
    ("personalized_pagerank", "seed-teleport PPR: 3 rounds, exchange-reused contribution joins"),
    ("paragraph_dedup_scrub", "block-level dedup+scrub: owner census join, map-side rebuild"),
    ("zipf_fit_report", "Zipf OLS: vocab census, 200-row window, micro-unit moment sums"),
    ("term_burstiness", "Fano factors: (term,doc) census -> vocab-bounded moments, top-50 window"),
    ("holt_winters_seasonal", "Holt-Winters: census + broadcast pack + prefix fold, rolling 7-buffer"),
    ("bleu_pairs_report", "BLEU-2: prefix-blocked pairs, clipped-count joins bounded by dup mass"),
    ("multimodal_image_histogram", "Otsu: map-side decode+argmax, scalar-only shuffle"),
    ("streaming_state_inspect", "statestore reader: state-partition-parallel scan, no stream replay"),
    ("multimodal_jpeg_decode", "baseline JPEG decode in Arrow batches: map-only, scalar shuffle"),
    ("multimodal_jpeg_phash_dedup", "JPEG decode -> 63-bit phash -> 4x16-bit band-blocked hamming join"),
    ("dedup_downweight", "soft dedup: dup-mass-bounded components + one size groupBy, long-only shuffles"),
    ("dedup_keep_best", "component labels + per-component argmax keeper, vertex-restricted propagation"),
    ("readability_report", "Flesch counts: single codegen projection, no shuffle"),
    ("sql_collation_distinct", "collated COUNT DISTINCT: ordinary two-phase aggregate"),
    ("psm_att_matched", "PSM as-of carry: score-bucket windows + bucket-prefix broadcast, no global sort"),
    ("sprt_sequential_test", "SPRT: day-census offsets + per-day running windows, TakeOrdered(1) crossing"),
    ("embedding_random_projection", "JL projection: broadcast sign matrix, partial agg before the (vec,k) shuffle"),
    ("feature_hashing_vectors", "hashing trick: map-side JVM md5, 64-bucket-bounded partial agg"),
    ("er_sorted_neighborhood", "sorted-neighborhood blocking: block-partitioned lead windows, zero joins"),
    ("wer_pairs_report", "token WER: member-only hashed arrays, Arrow DP kernel, pair-keyed joins"),
    ("chrf_pairs_report", "chrF: staged lead-window char grams, clip joins keyed (pair, gram)"),
    ("cluster_purity_report", "purity/NMI: broadcast-seed argmin, k x labels census algebra"),
    ("graph_modularity_report", "modularity: LPA labels + two label joins on edges, census algebra"),
    ("cem_att_estimate", "CEM: user shuffle -> 10-cell common-support census, no window no join"),
    ("multimodal_jpeg_progressive_decode", "progressive JPEG: six-scan SOF2 decode in Arrow batches, scalar-only shuffle"),
    ("multimodal_flac_decode", "FLAC: Rice/LPC lossless decode map-side, per-doc integer features"),
    ("streaming_sprt_monitor", "streaming SPRT: watermarked census drain + LLR window on calendar-bounded rows"),
    ("multimodal_qoi_decode", "QOI: 6-op chunk-stream decode in Arrow batches, scalar-only shuffle"),
    ("fim_transform", "FIM: hash-gated PSM re-serialization as one codegen'd projection; only the report sort exchanges"),
    ("hubness_report_ivf", "IVF-pruned hubness: broadcast list stats, map-side probes, list-keyed cogroup GEMM, two long-keyed aggs"),
    ("lof_outlier_scores_ivf", "IVF-pruned LOF: L2 centroid probes, sub-blocked cogroup cells, k-bounded score joins"),
    ("multimodal_tiff_lzw_decode", "compressed TIFF: per-strip LZW/PackBits inflate map-side, scalar-only shuffle"),
    ("multimodal_png_interlaced_decode", "Adam7 PNG: seven-pass de-permutation in Arrow batches, scalar-only shuffle"),
    ("streaming_ece_monitor", "streaming ECE: watermarked (window x bin) census drain + hourly integer algebra"),
]


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain", cpus=8)
    qs = entrymod.queries()
    out = [
        "# PLANS — formatted physical plans for headline queries",
        "",
        f"Generated by `python tools/explain.py {sf_dir}`. What to look for:",
        "`PushedFilters`/`PartitionFilters` on scans, `ReadSchema` column",
        "pruning, `BroadcastHashJoin` for dimension joins,",
        "`TakeOrderedAndProject` instead of global sorts, and `*(n)`",
        "whole-stage-codegen spans.",
        "",
    ]
    for name, why in HEADLINE:
        plan = formatted(qs[name](spark, sf_dir))
        out += [f"## {name}", "", f"_{why}_", "", "```", plan.rstrip(), "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
