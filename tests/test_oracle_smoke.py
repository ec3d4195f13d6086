"""In-suite replica of the driver's correctness gate for a few key
queries, so plain ``pytest`` catches oracle regressions without running
tools/check_oracles.py separately.  (The full gate covers every query;
this smoke picks one per family.)"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype) in ("int32", "uint32", "uint64", "int16", "int8", "bool"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "reverse_pip",
        "reverse_raster",
        "forward_nation",
        "wgs84_to_lv03",
        "dedup_exact",
        "events_window",
        # round-3 gated additions (each also proves the 4-CPU-session
        # pool sizing in conftest keeps the pipeline from starving)
        "cell_assign",
        "dedup_clusters_exact",
        "reverse_annotations_num",
        "grouped_median",
        "sessionize",
        # round-4 batch-3 families: curation, join breadth, window/OLAP,
        # stats, composition
        "decontaminate",
        "bloom_semijoin",
        "full_outer_align",
        "running_sum",
        "value_delta",
        "corr_moments",
        "label_centroids",
        "weighted_sample",
        "corpus_pipeline",
        # round-4 batch-5: time-weighted aggregate + span-level dedup
        "twap",
        "chunk_dedup",
        # round-4 batch-6: record-linkage edit distance + dominance query
        "fuzzy_dedup",
        "skyline",
        "kmeans",
        "spatial_hotspots",
        "pagerank",
        "knn_join",
        "tile_pyramid",
        "trajectory_len",
        "geo_extent",
        "morton_range_scan",
        # round-4 batch-7: spatial clustering + quadtree compaction
        "dbscan_grid",
        "cell_compact",
        "interval_union",
        "triangle_count",
        "embed_gram",
        "image_tiles",
        "kcore",
        "term_freq_hist",
        "table_digest",
        "normalized_dedup",
    ],
)
def test_query_matches_oracle(ray_session, duck, name):
    import __ray_entry__ as em

    got = em.queries()[name](SF).to_pandas()
    exp = duck.sql(em.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False, check_exact=True)


def test_every_oracle_key_has_query():
    import __ray_entry__ as em

    qs, sqls = em.queries(), em.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 25
