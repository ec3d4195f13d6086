"""Tiny-block robustness: every join/window/composition query from the
round-4 batch must produce oracle-exact results when the input parquet
is written with pathological row-group sizes (many tiny blocks, many
empty shuffle partitions) — the regime that exposed the schemaless
empty-block join failure."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = ["documents", "events", "orders", "lineitem", "customer", "embeddings", "part", "supplier", "nation"]
ROW_GROUP = 16

QUERIES = [
    "decontaminate",
    "substring_dup",
    "compact_lww",
    "bloom_semijoin",
    "order_revenue_topk",
    "left_join_enrich",
    "full_outer_align",
    "union_distinct",
    "running_sum",
    "value_delta",
    "orders_no_lineitem",
    "qty_rollup",
    "corpus_pipeline",
    "snapshot_diff",
    "user_journey",
    "ntile",
    # round-4 batch 7/8: clustering, compaction, interval merge, graphs
    "dbscan_grid",
    "cell_compact",
    "interval_union",
    "triangle_count",
    "bfs_hops",
    "term_freq_hist",
    # round-4 batch 9: frontier relaxation, sparsified CC, value-domain fold
    "sssp_dist",
    "connected_components",
    "gini",
    "degree_moments",
    # round-4 batch 10: decode->histogram audit, geometry aggregate
    "image_hist",
    "ring_area",
    "clustering_coeff",
    "longest_streak",
    "geohash",
    "attribution",
    "image_flip",
    "weighted_median",
    "intersect_except",
    "scene_cuts",
    "growth_accounting",
    "share_of_total",
    "vec_top_components",
    "turn_stats",
    "quantile_bins",
    "argmin_join",
    "self_intersections",
    "normalized_dedup",
    # round-4 batch 12: sequence scans, rank stats, mutual-NN join
    "max_drawdown",
    "ohlc_bars",
    "decayed_sum",
    "auc",
    "simpson_diversity",
    "traj_diameter",
    "rnn_pairs",
    # round-4 batch 13: bounded windows, set churn, keep-best, augmentations
    "rolling_sum_w3",
    "day_churn",
    "dedup_keep_best",
    "image_rot90",
    "image_crop",
    "segment_join",
    "nearest_click",
    "value_vs_median",
    "chi2_cells",
    "rfm_segments",
    "extent_overlap",
    "wow_change",
    "sentence_stats",
    "vec_to_centroid",
    "scd2_intervals",
    "percent_rank",
    "weekday_revenue",
    "max_speed",
    "qty_cube",
    "word_lift",
    "promo_share",
    "heatmap_counts",
    "order_priority_check",
    "revenue_concentration",
    "session_stats",
    "time_to_purchase",
    "discount_effect",
    # round-5: annotation strings gate, de-drivered marts, delta video
    "reverse_annotations_geo",
    "unique_docs",
    "video_delta",
    # round-5 TPC-H breadth: Q7 / Q10 / Q13 / Q18 shapes
    "volume_shipping",
    "returned_revenue",
    "customer_order_dist",
    "volume_customers",
    # round-5 TPC-H breadth: Q15 / Q16 / Q17 / Q19 shapes
    "top_supplier_quarter",
    "supplier_breadth",
    "small_qty_revenue",
    "or_filter_revenue",
    # round-5 TPC-H breadth: Q8 / Q9 / Q12 / Q21 / Q22 shapes
    "market_share",
    "nation_profit",
    "blame_supplier",
    "idle_customers",
    "ship_latency",
    # round-5 image-modality breadth: resize / grayscale / conv window
    "image_resize",
    "image_luma",
    "image_conv3",
    # round-5 exact regression
    "regr_user",
    # round-5 audit / heading-rose / audio-frame ops
    "char_class_hist",
    "bearing_sectors",
    "audio_windows",
    # round-5 window completion + composed multimodal chain
    "dense_rank",
    "image_pipeline",
    # round-5 TPC-H completion: Q11 / Q20 shapes
    "important_parts",
    "dominant_supplier",
    # round-5 nonparametric test + link-prediction primitives
    "ranksum",
    "node_jaccard",
    # round-5 multimodal augmentation / rate conversion
    "audio_resample",
    "image_blend",
    # round-5 spatial statistics + corpus mix audit
    "morans_i",
    "lang_impurity",
    "geary_c",
    "vocab_overlap",
    # round-5 vector-compression audit + class moment mart
    "embed_quant",
    "label_scatter",
    # round-5 geo x OLAP composition
    "region_value",
    "place_popularity",
    # round-5 privacy audit + sweep-line occupancy
    "k_anon_audit",
    "open_orders_daily",
    # round-5 corpus audit + raster money rollup
    "token_len_hist",
    "tile_revenue",
    # round-5 graph moments + dedup slice health
    "assortativity",
    "dup_rate",
    # round-5 box-plot data-quality gate
    "tukey_outliers",
    # round-5 contrast normalization through the real codec
    "image_equalize",
    # round-5 arrival-process audit
    "gap_hist",
]


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_rg")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tbl, f"{d}/{t}.parquet", row_group_size=ROW_GROUP)
    return str(d)


@pytest.fixture(scope="module")
def duck(tiny_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tiny_dir}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype) in ("int32", "uint32", "uint64", "int16", "int8", "bool"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_tiny_row_groups_match_oracle(ray_session, tiny_dir, duck, name):
    import __ray_entry__ as em

    got = em.queries()[name](tiny_dir).to_pandas()
    exp = duck.sql(em.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False, check_exact=True)
