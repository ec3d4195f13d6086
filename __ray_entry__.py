"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library code these callables use) calls
``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship reverse-geocode pipeline over sf0.001.
* ``queries()`` — one entry per implemented operator/pipeline
  (SURVEY.md §2 + the training-data extensions).
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
  query (same column names; order-insensitive compare).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from geocoding_ray.pipelines import curation_queries as cq
from geocoding_ray.pipelines import geo_analytics as ga
from geocoding_ray.pipelines import geo_cluster as gc
from geocoding_ray.pipelines import graph_queries as gq
from geocoding_ray.pipelines import olap_queries as ol
from geocoding_ray.pipelines import oracle_queries as oq
from geocoding_ray.pipelines import range_join as rj
from geocoding_ray.pipelines import stats_queries as sq
from geocoding_ray.pipelines import tpch_queries as tpch
from geocoding_ray.pipelines import text_queries as tq


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthetic EXIF-bearing
    points through the real broadcast PIP reverse join."""
    return oq.q_reverse_pip("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- geocoding core (SURVEY.md §2.1) ---
        "reverse_pip": oq.q_reverse_pip,          # O1/O3/O9: point -> deepest admin polygon
        "reverse_knn": oq.q_reverse_knn,          # O12: tolerance kNN fallback
        "forward_nation": oq.q_forward_nation,    # O2/O5/O7: text -> gazetteer match
        "forward_bbox": oq.q_forward_bbox,        # O6/O8: bbox-restricted forward
        "forward_topk": oq.q_forward_topk,        # O11: grouped top-k / limit / forward_full explode
        "forward_cc": oq.q_forward_cc,            # S4: OpenCage countrycode restriction via from_params
        "forward_shuffle": oq.q_forward_shuffle_topk,  # shuffle-join physical plan, same oracle as forward_topk
        "reverse_shuffle": oq.q_reverse_shuffle_pip,   # cell co-shuffle reverse plan, same oracle as reverse_pip
        "reverse_components": oq.q_reverse_components,  # O4 reverse_full: component hierarchy
        "reverse_raster": oq.q_reverse_raster,    # raster<->vector: burned grid, O(1) lookup
        "wgs84_to_lv03": oq.q_lv03,               # S1: CRS polynomial
        "exif_roundtrip": oq.q_exif_roundtrip,    # input-contract: GPS-in-payload extract
        "image_stats": oq.q_image_stats,          # multimodal decode stage (real TIFF)
        "audio_features": oq.q_audio_features,    # multimodal audio: real RIFF/PCM decode + int features
        "jpeg_roundtrip": oq.q_jpeg_roundtrip,    # lossy-codec invariant: real JPEG enc/dec, PSNR >= 40 dB per row
        "transcode_stats": oq.q_transcode_stats,  # tiff -> png transcode through both real codecs, means bit-exact
        "video_frames": oq.q_video_frames,        # real strided frame sampling, per-frame means
        "video_delta": oq.q_video_delta,          # GRV2 inter-frame codec: GOP seek-decode, size + I-count gated
        "scene_cuts": oq.q_scene_cuts,            # temporal frame-delta cut detection through dense real decode
        "image_tiles": oq.q_image_tiles,          # real-codec roundtrip -> 2x2-box tile sums (downsample shape)
        "image_grad": oq.q_image_grad,            # real-codec roundtrip -> exact Sobel L1 edge energy per channel
        "image_hist": oq.q_image_hist,            # real-codec roundtrip -> corpus per-channel pixel-value histogram
        "image_flip": oq.q_image_flip,            # augmentation: mirror through a DOUBLE codec roundtrip, weighted checksum
        "image_resize": oq.q_image_resize,        # preprocessing: nearest-neighbor 2x downsample, double codec roundtrip
        "image_luma": oq.q_image_luma,            # preprocessing: fixed-point integer grayscale (BT.601-style >>8)
        "image_conv3": oq.q_image_conv3,          # conv shape: exact 3x3 box neighborhood sum over the valid interior
        # --- training-data ops ---
        "dedup_exact": tq.q_dedup_exact,
        "token_count": tq.q_token_count,
        "seq_pack": tq.q_seq_pack,                # LLM sequence packing: partition-keyed token-budget packing
        "bpe_token_count": tq.q_bpe_token_count,  # GPT-2-style pre-tokenizer counts (same RE2 both sides)
        "quality_score": tq.q_quality,
        "lang_id": tq.q_lang_id,
        "fingerprint": tq.q_fingerprint,
        "ann_topk": tq.q_ann_topk,
        "embed_dup": tq.q_embed_dup,
        "text_dup": tq.q_text_dup,                # exact shingle-Jaccard near-dup (block-pair plan)
        "train_split": tq.q_train_split,          # deterministic hash split (train/val)
        "events_window": tq.q_events_window,      # tumbling-window partial+final aggregate
        "sliding_window": tq.q_sliding_window,    # sliding-window (1h/15min) partial+final aggregate
        "grouped_median": tq.q_grouped_median,    # exact per-group discrete median
        "grouped_p90": tq.q_grouped_p90,          # exact per-group discrete p90 (same histogram plan)
        "sessionize": tq.q_sessionize,            # gap-based session windows per user
        "asof_last_click": tq.q_asof_last_click,  # as-of/LOCF join along the per-user stream
        "top_docs": tq.q_top_docs,                # distributed sort + global top-k
        "top_events_per_type": tq.q_top_events_per_type,  # grouped top-k (partial-topk shuffle shrink)
        "distinct_users": tq.q_distinct_users,    # exact grouped COUNT DISTINCT (pair-dedup shuffle)
        "cell_assign": oq.q_cell_assign,          # tile/cell ids + quadkey render (bit-op Morton oracle)
        "range_join": rj.q_range_join,            # radius θ-join, planar metric (bit-exact oracle)
        "range_join_km": rj.q_range_join_km,      # radius θ-join, haversine meters (margin-checked oracle)
        "group_zscore": sq.q_group_zscore,        # per-group normalization via exact int partials
        "stratified_sample": sq.q_stratified_sample,  # per-stratum deterministic hash quota sample
        "quality_filter": sq.q_quality_filter,    # per-lang median-threshold quality pass
        "unique_docs": sq.q_unique_docs,          # anti-join: content-unique documents
        "term_df": sq.q_term_df,                  # per-lang top terms by document frequency
        "phash_pairs": oq.q_phash_pairs,          # DCT perceptual-hash image near-dup (real codec path)
        "phash_topk": oq.q_phash_topk,            # image retrieval: Hamming top-k over pHash
        "phash_clusters": oq.q_phash_clusters,    # image dup clusters over the gated pHash graph
        "pricing_summary": tpch.q_pricing_summary,    # Q1 shape: partial-agg shuffle shrink, exact cents
        "revenue_by_nation": tpch.q_revenue_by_nation,  # Q5 shape: fact pre-agg + broadcast dim chain
        "dedup_clusters_exact": tq.q_dedup_clusters_exact,  # components of the SQL-gated text_dup graph
        "decontaminate": cq.q_decontaminate,      # benchmark decontamination: train/val 5-gram overlap join
        "dup_rate": cq.q_dup_rate,                # per-source duplicate-rate slice-health audit
        "substring_dup": cq.q_substring_dup,      # Lee-et-al. exact substring-window dedup stats (6-gram)
        "pii_redact": cq.q_pii_redact,            # vectorized RE2 scrub (PII-redaction shape) + match counts
        "rep_ratio": cq.q_rep_ratio,              # duplicate-word-fraction quality signal, exact micros
        "compact_lww": cq.q_compact_lww,          # last-writer-wins upsert compaction (argmax partials)
        "bloom_semijoin": cq.q_bloom_semijoin,    # distributed-built Bloom prefilter + exact verify join
        "order_revenue_topk": cq.q_order_revenue_topk,  # Q3 shape: dim filter + fact-fact join + top-k
        "left_join_enrich": tpch.q_left_join_enrich,    # LEFT OUTER: keep unmatched keys with NULLs
        "full_outer_align": tpch.q_full_outer_align,    # FULL OUTER: align two sparse aggregates
        "union_distinct": tpch.q_union_distinct,        # Dataset.union + distinct set-op
        "running_sum": ol.q_running_sum,          # cumulative window sum: sort + prefix + carry join
        "global_rank": ol.q_global_rank,          # RANK() via bounded-domain histogram broadcast
        "pivot_user_value": ol.q_pivot_user_value,  # long->wide pivot over the event-type vocabulary
        "qty_rollup": ol.q_qty_rollup,            # GROUP BY ROLLUP grouping sets in one scan
        "value_delta": ol.q_value_delta,          # LAG window: prev-row delta via boundary repair
        "orders_no_lineitem": tpch.q_orders_no_lineitem,  # native left_anti join (NOT EXISTS)
        "corr_moments": sq.q_corr_moments,        # COVAR/CORR family via exact int64 moment sums
        "label_centroids": sq.q_label_centroids,  # vector-column aggregate: exact integerized centroids
        "json_extract": cq.q_json_extract,        # semi-structured field extraction (vectorized RE2) + rollup
        "weighted_sample": sq.q_weighted_sample,  # sequential-Poisson weighted sample, exact int priorities
        "corpus_pipeline": cq.q_corpus_pipeline,  # end-to-end: dedup -> quality filter -> sequence pack
        "snapshot_diff": cq.q_snapshot_diff,      # CDC diff of two LWW states (added/changed/unchanged)
        "chunk_dedup": cq.q_chunk_dedup,          # span-level boilerplate strip: explode -> count -> reassemble
        "user_journey": ol.q_user_journey,        # ordered group collect (string_agg / array_agg shape)
        "ntile": ol.q_ntile,                      # global ROW_NUMBER + NTILE via sort + distributed prefix
        "lang_mode": sq.q_lang_mode,              # MODE aggregate: bounded-domain count + per-group argmax
        "value_histogram": sq.q_value_histogram,  # equi-width binning report, exact integer buckets
        "daily_dense": sq.q_daily_dense,          # grid densification: zero-filled (day x type) matrix
        "grouped_mad": sq.q_grouped_mad,          # robust stats: median absolute deviation, exact ints
        "funnel": ol.q_funnel,                    # sequential pattern match: signup -> click -> purchase
        "word_cooc": sq.q_word_cooc,              # market-basket co-occurrence: top word pairs per corpus
        "retention": ol.q_retention,              # cohort retention matrix (first-day cohorts x offsets)
        "winsorized_mean": sq.q_winsorized_mean,  # robust mean: [p10,p90]-clamped exact integer sums
        "tfidf_top_term": sq.q_tfidf_top_term,    # keyword extraction: integer-exact TF-IDF argmax per doc
        "transitions": ol.q_transitions,          # Markov transition counts over per-user event bigrams
        "twap": ol.q_twap,                        # time-weighted (LOCF-integral) average per user
        "interval_union": ol.q_interval_union,   # merged-interval islands + exact covered time per user
        "profile_orders": tpch.q_profile_orders,  # data-profiling report: nulls/min/max/distinct in one pass
        "fuzzy_dedup": cq.q_fuzzy_dedup,          # exact edit-distance pairs: length-band blocking + banded DP
        "skyline": ol.q_skyline,                  # 2-D Pareto skyline: lossless local prune + tiny merge
        "kmeans": sq.q_kmeans,                    # Lloyd k-means: exact-int distances, streaming per-round partials
        "spatial_hotspots": ga.q_spatial_hotspots,  # grid-cell density + 3x3 k-ring smoothing, grid-bounded joins
        "knn_join": ga.q_knn_join,                # ring-bounded kNN join, both sides large, one cell co-shuffle
        "tile_pyramid": ga.q_tile_pyramid,        # multi-zoom tile rollup, log-many grid-bounded shuffles
        "trajectory_len": ga.q_trajectory_len,    # per-user path length, order-free scaled-int segments
        "geo_extent": ga.q_geo_extent,            # per-user bbox: pure native min/max partials, one slim shuffle
        "ring_area": ga.q_ring_area,              # per-user shoelace signed area + orientation (ST_Area shape)
        "morton_range_scan": ga.q_morton_range_scan,  # two-phase index scan: Morton range prune + exact refine
        "pagerank": gq.q_pagerank,                # iterative edge-rank join-aggregate, exact scaled-int damping
        "triangle_count": gq.q_triangle_count,    # degree-oriented wedge-closure triangle counts per node
        "node_jaccard": gq.q_node_jaccard,        # per-edge neighborhood Jaccard (link-prediction primitive)
        "assortativity": gq.q_assortativity,      # Newman degree assortativity, exact int64 moments
        "bfs_hops": gq.q_bfs_hops,                # single-source BFS: iterative frontier relax to fixpoint
        "kcore": gq.q_kcore,                      # k-core peel: fixed unrolled filter rounds, cascade-complete
        "sssp_dist": gq.q_sssp_dist,              # weighted Bellman-Ford: improved-frontier-only relaxation
        "connected_components": gq.q_connected_components,  # min-label propagation over the multiplicity-sparsified graph
        "degree_moments": gq.q_degree_moments,    # degree assortativity via exact int moment sums over decorated edges
        "clustering_coeff": gq.q_clustering_coeff,  # per-node local clustering coefficient (exact int T and d, one division)
        "longest_streak": ol.q_longest_streak,    # gaps-and-islands max increasing run per user
        "attribution": ol.q_attribution,          # conversion credit: clicks in the hour before each purchase
        "growth_accounting": ol.q_growth_accounting,  # daily active/new/returning users, two slim exchanges
        "share_of_total": ol.q_share_of_total,    # RATIO_TO_REPORT: per-(user,type) share of user spend
        "vec_top_components": sq.q_vec_top_components,  # per-vector top-|component| saliency ranking (no explode)
        "turn_stats": ga.q_turn_stats,            # trajectory turn trichotomy via exact cross-product signs
        "self_intersections": ga.q_self_intersections,  # ST_IsSimple: proper crossings via exact orientation tests
        "argmin_join": tpch.q_argmin_join,        # each order's cheapest lineitem (two-level vectorized argmin)
        "quantile_bins": sq.q_quantile_bins,      # tie-deterministic equal-frequency binning, domain-bounded fold
        "geohash": ga.q_geohash,                  # base-32 geohash cell render (lon-first interleave, bit-gated)
        "term_freq_hist": sq.q_term_freq_hist,    # Good-Turing counts-of-counts: iterated vocab-bounded aggregation
        "gini": sq.q_gini,                        # per-group Gini: exact int rank sums over the bounded value domain
        "weighted_median": sq.q_weighted_median,  # weight-cumulative median over the bounded value domain, no division
        "intersect_except": tpch.q_intersect_except,  # ANSI INTERSECT/EXCEPT in one bit-classified pass
        "table_digest": cq.q_table_digest,        # anti-entropy order-free checksum per partition key
        "normalized_dedup": cq.q_normalized_dedup,  # case/whitespace-canonical dup groups (md5 of canonical form)
        "embed_gram": sq.q_embed_gram,            # exact int64 Gram matrix: constant d^2 aggregate of the vector col
        "embed_pca": sq.q_embed_pca,              # top principal direction via power iteration on the Gram aggregate
        "dbscan_grid": gc.q_dbscan_grid,          # grid-density DBSCAN: core cells + distributed CC labels
        "cell_compact": gc.q_cell_compact,        # quadtree compaction: complete 4-child families -> parent
        "traj_simplify": gc.q_traj_simplify,      # per-user Douglas-Peucker, exact int cross-product DP
        "discount_effect": tpch.q_discount_effect,  # Q6-family per-discount-level profile, grid-bounded shuffle
        "session_stats": tq.q_session_stats,      # composed rollup over the gated sessionizer (end-to-end hash gate)
        "time_to_purchase": ol.q_time_to_purchase,  # funnel latency: first event -> first purchase, NULL on never
        "revenue_concentration": tpch.q_revenue_concentration,  # top-decile customer share, dimension-bounded fold
        "order_priority_check": tpch.q_order_priority_check,  # Q4 shape: EXISTS via fact-fact join + pre-distinct
        "promo_share": tpch.q_promo_share,        # Q14 shape: broadcast part dim + exact-micros monthly rollup
        "heatmap_counts": ol.q_heatmap_counts,    # (hour x value-band) dashboard grid, grid-bounded shuffle
        "qty_cube": ol.q_qty_cube,                # GROUP BY CUBE: full grouping-set lattice in one scan
        "word_lift": sq.q_word_lift,              # association mining: lift-thresholded pairs, exact cross-multiplied
        "percent_rank": ol.q_percent_rank,        # PERCENT_RANK + CUME_DIST via the sort-free histogram broadcast
        "weekday_revenue": ol.q_weekday_revenue,  # calendar-dimension rollup, pure integer weekday math
        "max_speed": ga.q_max_speed,              # fastest trajectory segment (integer micro-speed, zero-dt guarded)
        "vec_to_centroid": sq.q_vec_to_centroid,  # exact rational distance to own-label centroid (aggregate -> join-back)
        "scd2_intervals": ol.q_scd2_intervals,    # SCD2 validity intervals from the per-user change stream
        "extent_overlap": ga.q_extent_overlap,    # rect-intersection join over per-user envelopes (cell co-shuffle)
        "wow_change": ol.q_wow_change,            # week-over-week delta: LAG over the aggregated weekly series
        "sentence_stats": sq.q_sentence_stats,    # sentence/word counts + words-per-sentence, pure vectorized map
        "chi2_cells": sq.q_chi2_cells,            # lang x source independence grid, exact rational contributions
        "rfm_segments": ol.q_rfm_segments,        # recency/frequency/monetary quartile codes (boundary-comparison bins)
        "nearest_click": ol.q_nearest_click,      # as-of-nearest join with ±15min tolerance (two-sided searchsorted)
        "value_vs_median": sq.q_value_vs_median,  # grouped-median join-back normalization (robust z-score sibling)
        "segment_join": ga.q_segment_join,        # cross-user trajectory crossings: cell co-shuffle + canonical-cell dedup
        "image_rot90": oq.q_image_rot90,          # augmentation: 90° rotation through a double codec roundtrip
        "image_crop": oq.q_image_crop,            # augmentation: 4x4 center crop through a double codec roundtrip
        "rolling_sum_w3": ol.q_rolling_sum_w3,    # bounded window (ROWS 2 PRECEDING) sum, slim boundary repair
        "day_churn": ol.q_day_churn,              # consecutive-day audience Jaccard via per-user day runs
        "dedup_keep_best": cq.q_dedup_keep_best,  # canonical dup groups keep argmin-(len, id) representative
        "max_drawdown": ol.q_max_drawdown,        # peak-to-trough scan via associative segment fold
        "ohlc_bars": ol.q_ohlc_bars,              # tick -> (user, hour) OHLC resampling, argmin/argmax partials
        "decayed_sum": ol.q_decayed_sum,          # recency-weighted (binary-EWMA) feature, exact int taps
        "auc": sq.q_auc,                          # ROC AUC via tie-corrected Mann-Whitney rank sums
        "simpson_diversity": sq.q_simpson_diversity,  # per-user behavioral diversity, fully rational
        "traj_diameter": ga.q_traj_diameter,      # farthest point pair per user (convex-hull prune)
        "rnn_pairs": tq.q_rnn_pairs,              # reciprocal-NN pairs over embeddings (block-pair argmax)
        "volume_shipping": tpch.q_volume_shipping,  # Q7 shape: cross-nation trade flows, 2 slim joins
        "returned_revenue": tpch.q_returned_revenue,  # Q10 shape: top-20 customers by returned revenue
        "customer_order_dist": tpch.q_customer_order_dist,  # Q13 shape: LEFT OUTER order-count histogram (incl 0)
        "volume_customers": tpch.q_volume_customers,  # Q18 shape: HAVING whale orders + join-back
        "top_supplier_quarter": tpch.q_top_supplier_quarter,  # Q15 shape: per-quarter argmax with ties
        "supplier_breadth": tpch.q_supplier_breadth,  # Q16 shape: COUNT DISTINCT suppliers per (brand,type)
        "small_qty_revenue": tpch.q_small_qty_revenue,  # Q17 shape: cross-multiplied avg-comparison subquery
        "or_filter_revenue": tpch.q_or_filter_revenue,  # Q19 shape: OR-of-ANDs disjunctive predicate
        "market_share": tpch.q_market_share,        # Q8 shape: num/den-in-one-pass yearly share
        "nation_profit": tpch.q_nation_profit,      # Q9 shape: exact signed profit per nation-year
        "blame_supplier": tpch.q_blame_supplier,    # Q21 shape: unique last shipper of shared orders
        "idle_customers": tpch.q_idle_customers,    # Q22 shape: cross-multiplied avg filter + anti-join
        "ship_latency": tpch.q_ship_latency,        # Q12 family: lag-bucket x priority grid
        "important_parts": tpch.q_important_parts,  # Q11 shape: group share vs global threshold
        "dominant_supplier": tpch.q_dominant_supplier,  # Q20 shape: group-vs-parent share filter
        "regr_user": sq.q_regr_user,                # REGR_SLOPE/INTERCEPT: exact int moments, hugeint closed forms
        "char_class_hist": sq.q_char_class_hist,    # corpus audit: per-lang char-class counts, RE2 zero-copy
        "ranksum": sq.q_ranksum,                    # grouped Mann-Whitney rank-sum w/ midrank ties
        "lang_impurity": sq.q_lang_impurity,        # per-source Gini impurity (rational split criterion)
        "k_anon_audit": sq.q_k_anon_audit,          # quasi-identifier group-size privacy report
        "token_len_hist": sq.q_token_len_hist,      # tokenizer-design corpus audit, zero-copy Arrow
        "tukey_outliers": tq.q_tukey_outliers,      # 1.5-IQR box-plot outlier audit on exact quartiles
        "tile_revenue": ga.q_tile_revenue,          # revenue heat-tiles at every zoom, halving rollup
        "open_orders_daily": ol.q_open_orders_daily,  # interval stabbing via sweep-line deltas
        "gap_hist": ol.q_gap_hist,                  # inter-event gap histogram (arrival-process audit)
        "vocab_overlap": sq.q_vocab_overlap,        # pairwise source-vocabulary Jaccard audit
        "embed_quant": tq.q_embed_quant,            # exact fixed-point quantization-error audit
        "label_scatter": tq.q_label_scatter,        # per-label per-dim moment mart (LDA/k-means stats)
        "geary_c": ga.q_geary_c,                    # local-contrast autocorrelation, same lattice fold
        "morans_i": ga.q_morans_i,                  # global spatial autocorrelation, object-int fold
        "bearing_sectors": ga.q_bearing_sectors,    # heading rose: exact integer octant classification
        "audio_windows": oq.q_audio_windows,        # frame-level audio energy through the real PCM decode
        "audio_resample": oq.q_audio_resample,      # 2:1 decimation, two codec roundtrips + rate rewrite
        "image_blend": oq.q_image_blend,            # integer mixup augmentation, three codec passes
        "image_equalize": oq.q_image_equalize,      # integer histogram equalization, two codec passes
        "region_value": oq.q_region_value,          # reverse geocode composed with exact money rollup
        "place_popularity": oq.q_place_popularity,  # forward geocode composed with fact-side revenue
        "dense_rank": ol.q_dense_rank,              # DENSE_RANK via the sort-free histogram broadcast
        "image_pipeline": oq.q_image_pipeline,      # composed multimodal chain: decode -> luma filter -> resize
        "reverse_annotations_num": oq.q_reverse_annotations_num,  # gated numeric annotation slice
        "reverse_annotations_geo": oq.q_reverse_annotations_geo,  # gated MGRS/Maidenhead/threeword/sun strings
        # --- rows-only (not SQL-expressible) ---
        "minhash_pairs": tq.q_minhash_pairs,
        "simhash": tq.q_simhash,
        "simhash_pairs": tq.q_simhash_pairs,      # banded SimHash near-dup pairs (Hamming verify)
        "ann_ivf": tq.q_ann_ivf,                  # IVF scale path (approximate by design)
        "embed_dup_ivf": tq.q_embed_dup_ivf,      # centroid-bucketed near-dup scale path (recall-tested)
        "dedup_clusters": tq.q_dedup_clusters,    # near-dup connected components over LSH pairs
        "distinct_users_hll": tq.q_distinct_users_hll,  # HyperLogLog sketch path (error-tested vs exact)
        "reverse_annotations": oq.q_reverse_annotations,  # O4 annotations: DMS/MGRS/sun strings + mercator_y
        "quantile_sketch": sq.q_quantile_sketch,  # one-pass mergeable histogram quantiles + error bounds
        "heavy_hitters": sq.q_heavy_hitters,      # Misra-Gries top terms (mergeable, bound-reporting)
    }


def oracle_sql() -> dict[str, str]:
    return {
        "reverse_pip": oq.SQL_REVERSE_PIP,
        "reverse_knn": oq.SQL_REVERSE_KNN,
        "forward_nation": oq.SQL_FORWARD_NATION,
        "forward_bbox": oq.SQL_FORWARD_BBOX,
        "forward_topk": oq.SQL_FORWARD_TOPK,
        "forward_cc": oq.SQL_FORWARD_CC,
        "forward_shuffle": oq.SQL_FORWARD_TOPK,  # same oracle — different physical plan
        "reverse_shuffle": oq.SQL_REVERSE_PIP,   # same oracle — cell co-shuffle plan
        "reverse_components": oq.SQL_REVERSE_COMPONENTS,
        "reverse_raster": oq.SQL_REVERSE_RASTER,
        "wgs84_to_lv03": oq.SQL_LV03,
        "exif_roundtrip": oq.SQL_EXIF_ROUNDTRIP,
        "image_stats": oq.SQL_IMAGE_STATS,
        "audio_features": oq.SQL_AUDIO_FEATURES,
        "jpeg_roundtrip": oq.SQL_JPEG_ROUNDTRIP,
        "transcode_stats": oq.SQL_TRANSCODE_STATS,
        "video_frames": oq.SQL_VIDEO_FRAMES,
        "video_delta": oq.SQL_VIDEO_DELTA,
        "scene_cuts": oq.SQL_SCENE_CUTS,
        "image_tiles": oq.SQL_IMAGE_TILES,
        "image_grad": oq.SQL_IMAGE_GRAD,
        "image_hist": oq.SQL_IMAGE_HIST,
        "image_flip": oq.SQL_IMAGE_FLIP,
        "image_resize": oq.SQL_IMAGE_RESIZE,
        "image_luma": oq.SQL_IMAGE_LUMA,
        "image_conv3": oq.SQL_IMAGE_CONV3,
        "dedup_exact": tq.SQL_DEDUP_EXACT,
        "token_count": tq.SQL_TOKEN_COUNT,
        "seq_pack": tq.SQL_SEQ_PACK,
        "bpe_token_count": tq.SQL_BPE_TOKEN_COUNT,
        "quality_score": tq.SQL_QUALITY,
        "lang_id": tq.SQL_LANG_ID,
        "fingerprint": tq.SQL_FINGERPRINT,
        "ann_topk": tq.SQL_ANN_TOPK,
        "embed_dup": tq.SQL_EMBED_DUP,
        "text_dup": tq.SQL_TEXT_DUP,
        "train_split": tq.SQL_TRAIN_SPLIT,
        "events_window": tq.SQL_EVENTS_WINDOW,
        "sliding_window": tq.SQL_SLIDING_WINDOW,
        "grouped_median": tq.SQL_GROUPED_MEDIAN,
        "grouped_p90": tq.SQL_GROUPED_P90,
        "sessionize": tq.SQL_SESSIONIZE,
        "asof_last_click": tq.SQL_ASOF_LAST_CLICK,
        "top_docs": tq.SQL_TOP_DOCS,
        "top_events_per_type": tq.SQL_TOP_EVENTS_PER_TYPE,
        "distinct_users": tq.SQL_DISTINCT_USERS,
        "cell_assign": oq.SQL_CELL_ASSIGN,
        "range_join": rj.SQL_RANGE_JOIN,
        "range_join_km": rj.SQL_RANGE_JOIN_KM,
        "group_zscore": sq.SQL_GROUP_ZSCORE,
        "stratified_sample": sq.SQL_STRATIFIED_SAMPLE,
        "quality_filter": sq.SQL_QUALITY_FILTER,
        "unique_docs": sq.SQL_UNIQUE_DOCS,
        "term_df": sq.SQL_TERM_DF,
        "phash_pairs": oq.SQL_PHASH_PAIRS,
        "phash_topk": oq.SQL_PHASH_TOPK,
        "phash_clusters": oq.SQL_PHASH_CLUSTERS,
        "pricing_summary": tpch.SQL_PRICING_SUMMARY,
        "revenue_by_nation": tpch.SQL_REVENUE_BY_NATION,
        "dedup_clusters_exact": tq.SQL_DEDUP_CLUSTERS_EXACT,
        "reverse_annotations_num": oq.SQL_REVERSE_ANNOTATIONS_NUM,
        "reverse_annotations_geo": oq.SQL_REVERSE_ANNOTATIONS_GEO,
        "decontaminate": cq.SQL_DECONTAMINATE,
        "dup_rate": cq.SQL_DUP_RATE,
        "substring_dup": cq.SQL_SUBSTRING_DUP,
        "pii_redact": cq.SQL_PII_REDACT,
        "rep_ratio": cq.SQL_REP_RATIO,
        "compact_lww": cq.SQL_COMPACT_LWW,
        "bloom_semijoin": cq.SQL_BLOOM_SEMIJOIN,
        "order_revenue_topk": cq.SQL_ORDER_REVENUE_TOPK,
        "left_join_enrich": tpch.SQL_LEFT_JOIN_ENRICH,
        "full_outer_align": tpch.SQL_FULL_OUTER_ALIGN,
        "union_distinct": tpch.SQL_UNION_DISTINCT,
        "running_sum": ol.SQL_RUNNING_SUM,
        "global_rank": ol.SQL_GLOBAL_RANK,
        "pivot_user_value": ol.SQL_PIVOT_USER_VALUE,
        "qty_rollup": ol.SQL_QTY_ROLLUP,
        "value_delta": ol.SQL_VALUE_DELTA,
        "orders_no_lineitem": tpch.SQL_ORDERS_NO_LINEITEM,
        "corr_moments": sq.SQL_CORR_MOMENTS,
        "label_centroids": sq.SQL_LABEL_CENTROIDS,
        "json_extract": cq.SQL_JSON_EXTRACT,
        "weighted_sample": sq.SQL_WEIGHTED_SAMPLE,
        "corpus_pipeline": cq.SQL_CORPUS_PIPELINE,
        "snapshot_diff": cq.SQL_SNAPSHOT_DIFF,
        "chunk_dedup": cq.SQL_CHUNK_DEDUP,
        "user_journey": ol.SQL_USER_JOURNEY,
        "ntile": ol.SQL_NTILE,
        "lang_mode": sq.SQL_LANG_MODE,
        "value_histogram": sq.SQL_VALUE_HISTOGRAM,
        "daily_dense": sq.SQL_DAILY_DENSE,
        "grouped_mad": sq.SQL_GROUPED_MAD,
        "funnel": ol.SQL_FUNNEL,
        "word_cooc": sq.SQL_WORD_COOC,
        "retention": ol.SQL_RETENTION,
        "winsorized_mean": sq.SQL_WINSORIZED_MEAN,
        "tfidf_top_term": sq.SQL_TFIDF_TOP_TERM,
        "transitions": ol.SQL_TRANSITIONS,
        "twap": ol.SQL_TWAP,
        "interval_union": ol.SQL_INTERVAL_UNION,
        "profile_orders": tpch.SQL_PROFILE_ORDERS,
        "fuzzy_dedup": cq.SQL_FUZZY_DEDUP,
        "skyline": ol.SQL_SKYLINE,
        "kmeans": sq.SQL_KMEANS,
        "spatial_hotspots": ga.SQL_SPATIAL_HOTSPOTS,
        "knn_join": ga.SQL_KNN_JOIN,
        "tile_pyramid": ga.SQL_TILE_PYRAMID,
        "trajectory_len": ga.SQL_TRAJECTORY_LEN,
        "geo_extent": ga.SQL_GEO_EXTENT,
        "ring_area": ga.SQL_RING_AREA,
        "morton_range_scan": ga.SQL_MORTON_RANGE_SCAN,
        "pagerank": gq.SQL_PAGERANK,
        "triangle_count": gq.SQL_TRIANGLE_COUNT,
        "node_jaccard": gq.SQL_NODE_JACCARD,
        "assortativity": gq.SQL_ASSORTATIVITY,
        "bfs_hops": gq.SQL_BFS_HOPS,
        "kcore": gq.SQL_KCORE,
        "sssp_dist": gq.SQL_SSSP,
        "connected_components": gq.SQL_CONNECTED_COMPONENTS,
        "degree_moments": gq.SQL_DEGREE_MOMENTS,
        "clustering_coeff": gq.SQL_CLUSTERING_COEFF,
        "longest_streak": ol.SQL_LONGEST_STREAK,
        "attribution": ol.SQL_ATTRIBUTION,
        "growth_accounting": ol.SQL_GROWTH_ACCOUNTING,
        "share_of_total": ol.SQL_SHARE_OF_TOTAL,
        "vec_top_components": sq.SQL_VEC_TOP_COMPONENTS,
        "turn_stats": ga.SQL_TURN_STATS,
        "self_intersections": ga.SQL_SELF_INTERSECTIONS,
        "argmin_join": tpch.SQL_ARGMIN_JOIN,
        "quantile_bins": sq.SQL_QUANTILE_BINS,
        "geohash": ga.SQL_GEOHASH,
        "term_freq_hist": sq.SQL_TERM_FREQ_HIST,
        "gini": sq.SQL_GINI,
        "weighted_median": sq.SQL_WEIGHTED_MEDIAN,
        "intersect_except": tpch.SQL_INTERSECT_EXCEPT,
        "table_digest": cq.SQL_TABLE_DIGEST,
        "normalized_dedup": cq.SQL_NORMALIZED_DEDUP,
        "embed_gram": sq.SQL_EMBED_GRAM,
        "dbscan_grid": gc.SQL_DBSCAN_GRID,
        "cell_compact": gc.SQL_CELL_COMPACT,
        "discount_effect": tpch.SQL_DISCOUNT_EFFECT,
        "session_stats": tq.SQL_SESSION_STATS,
        "time_to_purchase": ol.SQL_TIME_TO_PURCHASE,
        "revenue_concentration": tpch.SQL_REVENUE_CONCENTRATION,
        "order_priority_check": tpch.SQL_ORDER_PRIORITY_CHECK,
        "promo_share": tpch.SQL_PROMO_SHARE,
        "heatmap_counts": ol.SQL_HEATMAP_COUNTS,
        "qty_cube": ol.SQL_QTY_CUBE,
        "word_lift": sq.SQL_WORD_LIFT,
        "percent_rank": ol.SQL_PERCENT_RANK,
        "weekday_revenue": ol.SQL_WEEKDAY_REVENUE,
        "max_speed": ga.SQL_MAX_SPEED,
        "vec_to_centroid": sq.SQL_VEC_TO_CENTROID,
        "scd2_intervals": ol.SQL_SCD2_INTERVALS,
        "extent_overlap": ga.SQL_EXTENT_OVERLAP,
        "wow_change": ol.SQL_WOW_CHANGE,
        "sentence_stats": sq.SQL_SENTENCE_STATS,
        "chi2_cells": sq.SQL_CHI2_CELLS,
        "rfm_segments": ol.SQL_RFM_SEGMENTS,
        "nearest_click": ol.SQL_NEAREST_CLICK,
        "value_vs_median": sq.SQL_VALUE_VS_MEDIAN,
        "segment_join": ga.SQL_SEGMENT_JOIN,
        "image_rot90": oq.SQL_IMAGE_ROT90,
        "image_crop": oq.SQL_IMAGE_CROP,
        "rolling_sum_w3": ol.SQL_ROLLING_SUM_W3,
        "day_churn": ol.SQL_DAY_CHURN,
        "dedup_keep_best": cq.SQL_DEDUP_KEEP_BEST,
        "max_drawdown": ol.SQL_MAX_DRAWDOWN,
        "ohlc_bars": ol.SQL_OHLC_BARS,
        "decayed_sum": ol.SQL_DECAYED_SUM,
        "auc": sq.SQL_AUC,
        "simpson_diversity": sq.SQL_SIMPSON_DIVERSITY,
        "traj_diameter": ga.SQL_TRAJ_DIAMETER,
        "rnn_pairs": tq.SQL_RNN_PAIRS,
        "volume_shipping": tpch.SQL_VOLUME_SHIPPING,
        "returned_revenue": tpch.SQL_RETURNED_REVENUE,
        "customer_order_dist": tpch.SQL_CUSTOMER_ORDER_DIST,
        "volume_customers": tpch.SQL_VOLUME_CUSTOMERS,
        "top_supplier_quarter": tpch.SQL_TOP_SUPPLIER_QUARTER,
        "supplier_breadth": tpch.SQL_SUPPLIER_BREADTH,
        "small_qty_revenue": tpch.SQL_SMALL_QTY_REVENUE,
        "or_filter_revenue": tpch.SQL_OR_FILTER_REVENUE,
        "market_share": tpch.SQL_MARKET_SHARE,
        "nation_profit": tpch.SQL_NATION_PROFIT,
        "blame_supplier": tpch.SQL_BLAME_SUPPLIER,
        "idle_customers": tpch.SQL_IDLE_CUSTOMERS,
        "ship_latency": tpch.SQL_SHIP_LATENCY,
        "important_parts": tpch.SQL_IMPORTANT_PARTS,
        "dominant_supplier": tpch.SQL_DOMINANT_SUPPLIER,
        "regr_user": sq.SQL_REGR_USER,
        "char_class_hist": sq.SQL_CHAR_CLASS_HIST,
        "ranksum": sq.SQL_RANKSUM,
        "lang_impurity": sq.SQL_LANG_IMPURITY,
        "k_anon_audit": sq.SQL_K_ANON_AUDIT,
        "token_len_hist": sq.SQL_TOKEN_LEN_HIST,
        "tukey_outliers": tq.SQL_TUKEY_OUTLIERS,
        "tile_revenue": ga.SQL_TILE_REVENUE,
        "open_orders_daily": ol.SQL_OPEN_ORDERS_DAILY,
        "gap_hist": ol.SQL_GAP_HIST,
        "vocab_overlap": sq.SQL_VOCAB_OVERLAP,
        "embed_quant": tq.SQL_EMBED_QUANT,
        "label_scatter": tq.SQL_LABEL_SCATTER,
        "geary_c": ga.SQL_GEARY_C,
        "morans_i": ga.SQL_MORANS_I,
        "bearing_sectors": ga.SQL_BEARING_SECTORS,
        "audio_windows": oq.SQL_AUDIO_WINDOWS,
        "audio_resample": oq.SQL_AUDIO_RESAMPLE,
        "image_blend": oq.SQL_IMAGE_BLEND,
        "image_equalize": oq.SQL_IMAGE_EQUALIZE,
        "region_value": oq.SQL_REGION_VALUE,
        "place_popularity": oq.SQL_PLACE_POPULARITY,
        "dense_rank": ol.SQL_DENSE_RANK,
        "image_pipeline": oq.SQL_IMAGE_PIPELINE,
        # minhash_pairs / simhash / *_ivf / dedup_clusters(LSH) /
        # reverse_annotations strings / traj_simplify (DP recursion):
        # rows-only by design
    }
