"""Driver-style correctness gate: run each queries() entry against its
oracle_sql() via DuckDB on sf0.01, comparing row count, schema-insensitive
column set, and order-insensitive values (mirrors the driver's CORRECTNESS
check)."""

import glob
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def _to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == np.uint64:
            df[c] = df[c].astype("int64", errors="ignore") if df[c].max() < 2**63 else df[c].astype(object)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for f in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(f)[:-8]
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    return c


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e


def _compare(name, entrymod, con):
    ray_out = _to_pandas(entrymod.queries()[name](SF_DIR))
    sql = entrymod.oracle_sql()[name]
    ora = con.execute(sql).df()
    assert len(ray_out) == len(ora), f"{name}: rows {len(ray_out)} vs {len(ora)}"
    a, b = _canon(ray_out), _canon(ora)
    assert list(a.columns) == list(b.columns), f"{name}: cols {a.columns} vs {b.columns}"
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert np.allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=0,
                               equal_nan=True), \
                f"{name}: float col {c} differs"
        else:
            assert a[c].astype(str).equals(b[c].astype(str)), f"{name}: col {c} differs"


@pytest.mark.parametrize("qname", ["rect_filter", "knn_moscow", "text_identity",
                                   "rect_distance_rank",
                                   "covering_setops", "boolean_covering",
                                   "pages_per_lang", "cap_join", "pip_join",
                                   "cap_join_shuffle",
                                   "exact_dedup", "near_dup_pairs",
                                   "cosine_sim_pairs",
                                   "near_dup_clusters", "events_asof",
                                   "event_gaps", "cohort_retention", "events_weekday_hour",
                                   "group_sizes_hist", "standardize_docs",
                                   "events_mad", "doc_deciles",
                                   "cross_lang_nn", "user_streaks", "source_mix",
                                   "langid_confusion", "emb_integrity", "tile_growth",
                                   "grid_smooth", "morans_i", "geary_c",
                                   "knn_hubness", "benford_law",
                                   "new_vs_repeat", "dau_mau",
                                   "day_user_jaccard",
                                   "grid_kde",
                                   "getis_ord", "local_moran", "join_counts",
                                   "tile_mann_kendall", "lang_ellipse",
                                   "product_profit", "part_concentration",
                                   "order_overlap", "bipartite_nn",
                                   "monthly_centroid", "lang_centroid_sim",
                                   "cross_k", "doc_percent_rank",
                                   "city_visits_monthly", "idw_interpolate",
                                   "hourly_anomaly", "daily_autocorr",
                                   "daily_cusum", "daily_ewma", "rfm_segments",
                                   "late_shipments", "excess_shippers",
                                   "covered_days", "order_cadence",
                                   "lexical_simpson", "anagram_groups",
                                   "flesch_lang", "mann_whitney_length",
                                   "log_odds_keywords", "bearing_circular",
                                   "kaplan_meier", "textrank_keywords",
                                   "yules_k", "ks_test_length",
                                   "lognormal_fit_length", "weekday_chi2",
                                   "distance_decay", "markov_entropy_rate",
                                   "vocab_richness", "theil_decomposition",
                                   "pettitt_test", "dup_cluster_purity",
                                   "domain_link_jaccard",
                                   "rank_corr_qty_discount",
                                   "containment_pairs",
                                   "monthly_lang_js", "cramers_v_lang_face",
                                   "cohort_ltv", "tile_month_jaccard",
                                   "kruskal_wallis_qty",
                                   "user_activity_gini",
                                   "anova_len_by_source",
                                   "skipgram_pairs",
                                   "retention_half_life",
                                   "lang_tile_jaccard",
                                   "dup_threshold_curve",
                                   "rich_club", "token_dispersion",
                                   "morans_i_chars",
                                   "time_to_convert",
                                   "token_entropy_rate",
                                   "revenue_seasonality",
                                   "zipf_abbreviation",
                                   "domain_clustering", "colocation_quotient",
                                   "knox_pairs", "basket_pairs", "basket_lift",
                                   "dup_by_length", "activity_curve", "langid_mismatch", "event_trigrams",
                                   "customer_concentration", "source_cooccurrence",
                                   "order_quantiles", "search_rank", "search_bm25", "weekly_ma", "return_rates",
                                   "revenue_growth", "tile_entropy", "doc_lang_runs", "nation_flow", "voronoi_monthly",
                                   "peak_window", "peak_open_orders",
                                   "supplier_lead_time", "char_entropy", "silhouette_hist",
                                   "events_quantiles_cont", "tile_zipf", "tile_gini", "centroid_drift",
                                   "user_growth", "order_size_hist", "token_len_stats",
                                   "lang_radius", "lang_frontier",
                                   "domain_link_graph", "domain_pagerank",
                                   "domain_reciprocity", "domain_assortativity",
                                   "domain_bfs_depth", "domain_components", "quadrat_dispersion", "source_js", "user_burstiness", "ripley_k", "domain_cocitation", "domain_coupling", "clark_evans", "heaps_law", "event_type_trend", "source_vocab_jaccard", "shipping_priority", "geo_destination", "location_codec", "returned_items",
                                   "promo_revenue", "top_supplier", "large_orders",
                                   "order_priority_count", "cust_order_dist",
                                   "small_qty_revenue", "nation_volume",
                                   "supplier_parts_cnt", "idle_customers",
                                   "forecast_revenue", "bracket_revenue",
                                   "market_share", "sole_fault_supplier",
                                   "source_overlap", "pivot_lang_counts",
                                   "user_type_matrix", "value_histogram",
                                   "user_skyline", "latest_event_state",
                                   "user_event_paths", "emb_dim_stats",
                                   "pair_dist_hist", "dominant_dim_hist",
                                   "nn_g_function", "lang_geo_bbox",
                                   "event_cooccurrence", "domain_triangles",
                                   "phrase_search", "session_entry_exit",
                                   "profile_table", "domain_hits",
                                   "source_drift_psi", "domain_gini",
                                   "chi2_lang_source", "zipf_slope",
                                   "knn_graph", "vocab_coverage",
                                   "region_relations", "lsh_knn",
                                   "emb_near_dup_lsh", "minhash_pairs",
                                   "simhash_pairs", "corpus_keep",
                                   "emb_near_dup", "knn_embeddings",
                                   "knn_bulk",
                                   "text_stats", "rect_filter_wrap",
                                   "knn_pruned_moscow", "pages_per_month",
                                   "tile_counts_l8", "covering_member_join", "tile_quantiles", "tile_diversity", "session_quantiles",
                                   "assembled_pip_join", "tile_pyramid",
                                   "adaptive_tiles", "redact_pii",
                                   "inverted_index", "zonal_stats",
                                   "grid_clusters", "quantize_embeddings",
                                   "dup_span_stats", "ngram_novelty",
                                   "revenue_by_nation",
                                   "pricing_summary", "props_field_stats",
                                   "doc_token_rank", "docs_rollup",
                                   "dup_degree_hist", "tile_top_lang",
                                   "tile_centroids",
                                   "events_winsorized",
                                   "events_quantiles", "event_windows", "token_counts", "sample_corpus",
                                   "events_distinct_users", "vocab_top100", "sample_per_lang", "heavy_hitters_top100", "token_doc_freq", "tfidf_top3", "decontaminate", "decontaminate_bloom", "doc_perplexity", "distance_join", "nearest_neighbor",
                                   "nearest_city_stats", "bearing_sectors", "repetition_stats", "chunk_docs", "chunk_dedup", "new_docs", "pack_examples", "split_corpus", "normalize_text", "rare_tokens", "pmi_collocations", "funnel_views", "emb_norm_by_lang", "quality_above_median",
                                   "polyline_near", "boolean_pip_join",
                                   "quality_score",
                                   "lang_id", "fingerprint",
                                   "weighted_sample", "lang_corr",
                                   "domain_lang_entropy",
                                   "events_sliding_distinct",
                                   "user_rolling", "event_transitions",
                                   "token_edit_pairs", "cheapest_supplier",
                                   "event_followups",
                                   "url_domain_counts", "events_hourly",
                                   "emb_centroids", "events_sliding",
                                   "top3_per_city", "user_sessions"])
def test_query_matches_oracle(qname, entrymod, con):
    _compare(qname, entrymod, con)


def test_rows_only_queries_run(entrymod):
    out = _to_pandas(entrymod.queries()["tile_counts_l8"](SF_DIR))
    assert len(out) > 0
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    assert out["n_pages"].sum() == n_docs


def test_entry_smoke(entrymod):
    out = _to_pandas(entrymod.entry())
    assert len(out) > 0
    assert set(out.columns) == {"cell_id", "cell_token", "n_pages"}
