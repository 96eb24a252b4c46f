"""Adversarial replication stress vs the DuckDB oracles.

Replicating the sf tables K-fold (fresh ids, identical content /
timestamps) perturbs everything the plain gate can't: pathological
duplication for the dedup family, tied timestamps across users for the
event family, rare byte patterns at higher row counts (this sweep's
full-scale 8x variant caught a pd.Series.isin bytes-coercion bug that
silently kept ~1/256 duplicated chunks).  The in-suite version runs a
3x corpus over representative queries from each family.
"""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.01"
K = 3

DOC_QUERIES = ["chunk_dedup", "decontaminate", "decontaminate_bloom",
               "doc_perplexity", "distance_join", "nearest_neighbor",
               "nearest_city_stats", "bearing_sectors", "bipartite_nn",
               "voronoi_monthly",
               "city_visits_monthly",
               "exact_dedup", "tile_counts_l8", "cap_join", "tfidf_top3",
               "dup_span_stats", "ngram_novelty", "dup_by_length",
               "source_cooccurrence",
               "inverted_index", "cosine_sim_pairs",
               "group_sizes_hist",
               "pmi_collocations",
               "adaptive_tiles", "grid_clusters", "doc_token_rank",
               "tile_quantiles", "tile_diversity",
               "docs_rollup", "dup_degree_hist", "tile_top_lang",
               "tile_centroids", "monthly_centroid", "tile_zipf", "tile_gini",
               "tile_entropy", "lang_radius",
               "centroid_drift",
               "standardize_docs", "doc_deciles", "doc_percent_rank", "cross_lang_nn",
               "source_mix", "langid_confusion", "langid_mismatch", "emb_integrity", "lang_centroid_sim",
               "tile_growth", "grid_smooth", "morans_i", "grid_kde",
               "getis_ord", "local_moran", "join_counts",
               "tile_mann_kendall", "lang_ellipse", "lang_frontier",
               "domain_link_graph", "domain_pagerank", "domain_triangles",
               "domain_hits",
               "domain_reciprocity", "domain_assortativity",
               "domain_bfs_depth", "domain_components", "quadrat_dispersion", "source_js", "ripley_k",
               "domain_cocitation", "domain_coupling", "clark_evans", "cross_k",
               "heaps_law", "source_vocab_jaccard",
               "geo_destination", "location_codec",
               "phrase_search", "profile_table",
               "source_drift_psi", "domain_gini",
               "chi2_lang_source", "zipf_slope",
               "knn_graph", "idw_interpolate",
               "vocab_coverage", "weighted_sample", "lang_corr", "search_rank",
               "search_bm25",
               "domain_lang_entropy",
               "token_edit_pairs", "source_overlap", "pivot_lang_counts",
               "lexical_simpson", "anagram_groups", "token_len_stats",
               "doc_lang_runs",
               "domain_clustering", "colocation_quotient", "knox_pairs",
               "char_entropy",
               "flesch_lang", "yules_k", "vocab_richness",
               "log_odds_keywords", "textrank_keywords",
               "mann_whitney_length", "ks_test_length",
               "lognormal_fit_length", "dup_cluster_purity",
               "distance_decay", "bearing_circular",
               "theil_decomposition", "domain_link_jaccard",
               "containment_pairs", "monthly_lang_js",
               "cramers_v_lang_face", "tile_month_jaccard",
               "anova_len_by_source", "skipgram_pairs",
               "lang_tile_jaccard", "dup_threshold_curve",
               "rich_club", "token_dispersion", "morans_i_chars",
               "token_entropy_rate", "zipf_abbreviation"]
EVENT_QUERIES = ["hourly_anomaly", "daily_autocorr",
                 "daily_cusum", "daily_ewma", "peak_window", "weekly_ma",
                 "events_quantiles_cont", "user_growth", "activity_curve",
                 "funnel_views", "user_sessions", "events_asof",
                 "event_gaps", "cohort_retention", "session_quantiles",
                 "events_weekday_hour",
                 "events_distinct_users", "props_field_stats",
                 "events_winsorized", "events_mad", "user_streaks",
                 "events_sliding_distinct", "user_rolling",
                 "event_transitions", "event_followups", "event_trigrams",
                 "event_cooccurrence", "session_entry_exit",
                 "user_burstiness", "event_type_trend",
                 "user_type_matrix", "value_histogram", "user_skyline",
                 "latest_event_state", "user_event_paths",
                 "kaplan_meier", "weekday_chi2", "markov_entropy_rate",
                 "pettitt_test", "user_activity_gini",
                 "retention_half_life", "time_to_convert"]


def _assert_matches_oracle(qname, res, con):
    """Column-sorted bit-exact comparison of an engine result vs its
    DuckDB oracle (the one place comparison semantics live)."""
    pdf = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    odf = con.execute(__import__("__ray_entry__").oracle_sql()[qname]).df()
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(cols).reset_index(drop=True)
    odf = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(pdf) == len(odf), (qname, len(pdf), len(odf))
    for c in cols:
        a, b = np.asarray(pdf[c]), np.asarray(odf[c])
        if a.dtype.kind == "f" and b.dtype.kind == "f":
            # SQL NULL round-trips as NaN in both frames; NaN == NaN here
            assert np.array_equal(a, b, equal_nan=True), (qname, c)
        else:
            assert np.array_equal(a, b), (qname, c)
    return pdf


@pytest.fixture(scope="module")
def stress_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stress"))
    docs = pq.read_table(f"{SRC}/documents.parquet")
    pq.write_table(pa.concat_tables([
        docs.set_column(docs.schema.get_field_index("doc_id"), "doc_id",
                        pa.array(docs["doc_id"].to_numpy() + k * 100000,
                                 type=pa.int64()))
        for k in range(K)]), f"{d}/documents.parquet")
    ev = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for k in range(K):
        t = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                          pa.array(ev["event_id"].to_numpy() + k * 10**7,
                                   type=pa.int64()))
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pa.array(ev["user_id"].to_numpy() + k * 10**6,
                                  type=pa.int64()))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{d}/events.parquet")
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    pq.write_table(pa.concat_tables([
        emb.set_column(emb.schema.get_field_index("vec_id"), "vec_id",
                       pa.array(emb["vec_id"].to_numpy() + k * 100000,
                                type=pa.int64()))
        for k in range(K)]), f"{d}/embeddings.parquet")
    return d


@pytest.fixture(scope="module")
def stress_con(stress_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{stress_dir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("qname", DOC_QUERIES + EVENT_QUERIES)
def test_stress_query_matches_oracle(qname, stress_dir, stress_con,
                                     ray_session):
    import __ray_entry__ as e

    _assert_matches_oracle(qname, e.queries()[qname](stress_dir), stress_con)


def test_distributed_cc_matches_union_find(stress_dir, ray_session):
    """Hash-min label propagation (the 100-TB path, no driver edge list)
    must produce the identical (doc_id, cluster_id) table as the driver
    union-find fast path on the duplication-heavy stress corpus."""
    from s2ray.pipelines.dedup import near_dup_clusters
    from s2ray.sources.readers import read_table

    ds = read_table(stress_dir, "documents", columns=["doc_id", "text"])
    a = near_dup_clusters(ds, method="driver").to_pandas()
    b = near_dup_clusters(ds, method="distributed").to_pandas()
    cols = ["doc_id", "cluster_id"]
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) > 0            # the 3x corpus must actually cluster
    pd.testing.assert_frame_equal(a, b)


def test_label_propagation_raises_instead_of_wrong_labels(ray_session):
    """A component whose diameter exceeds max_rounds must raise — NOT
    return mid-propagation labels that silently mis-cluster (the 100-TB
    path has no driver cross-check to catch it)."""
    import ray.data

    from s2ray.pipelines.dedup import _cc_label_propagation

    n = 12
    chain = pd.DataFrame({"i": np.arange(n, dtype=np.int64),
                          "j": np.arange(1, n + 1, dtype=np.int64)})
    pairs = ray.data.from_pandas(chain)
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_label_propagation(pairs, max_rounds=3).to_pandas()
    ok = _cc_label_propagation(pairs, max_rounds=n + 2).to_pandas()
    assert (ok["label"] == 0).all() and len(ok) == n + 1


NULL_QUERIES = ["text_stats", "normalize_text", "near_dup_pairs",
                "cosine_sim_pairs",
                "pack_examples", "exact_dedup", "minhash_pairs", "lang_corr"]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    """sf0.01 documents with ~5% null text — the engine's null-text
    contract (null == empty body, except exact_dedup's distinct null
    group) must match the coalesce-mirroring oracles."""
    d = str(tmp_path_factory.mktemp("nulls"))
    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = docs["text"].to_pylist()
    for i in range(0, len(texts), 19):
        texts[i] = None
    pq.write_table(docs.set_column(docs.schema.get_field_index("text"),
                                   "text",
                                   pa.array(texts, type=pa.string())),
                   f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("qname", NULL_QUERIES)
def test_null_text_matches_oracle(qname, null_dir, ray_session):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{null_dir}/documents.parquet')")
    _assert_matches_oracle(qname, e.queries()[qname](null_dir), con)


UNICODE_QUERIES = ["text_stats", "fingerprint", "vocab_top100",
                   "pmi_collocations",
                   "chunk_docs", "near_dup_pairs", "chunk_dedup"]


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    """Docs with non-ASCII whitespace (NBSP, U+2028, thin space), astral
    codepoints, CJK and combining marks — the tokenizer must match the
    oracles' RE2 ASCII \\s+ split, not Unicode whitespace (a real
    divergence this sweep caught)."""
    d = str(tmp_path_factory.mktemp("unicode"))
    texts = [
        "plain ascii words here",
        "nbsp separated words",
        "line sep and para",
        "emoji \U0001F600 and astral \U0001D11E",
        "cjk 中文 字符 mixed with latin",
        "combining á é marks",
        "tabs\tand\nnewlines\rand\x0bvt\x0cff",
        "zero​width and thin space",
    ]
    n = 160
    rows = [texts[i % len(texts)] + f" tail{i}" for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["web"] * n),
        "text": pa.array(rows)}), f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("qname", UNICODE_QUERIES)
def test_unicode_whitespace_matches_oracle(qname, unicode_dir, ray_session):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{unicode_dir}/documents.parquet')")
    _assert_matches_oracle(qname, e.queries()[qname](unicode_dir), con)


NULL_USER_QUERIES = ["user_growth", "activity_curve", "event_trigrams",
                     "user_sessions", "funnel_views", "event_gaps",
                     "cohort_retention", "user_streaks",
                     "events_distinct_users", "events_asof",
                     "events_sliding_distinct", "user_type_matrix",
                     "user_skyline", "latest_event_state",
                     "user_event_paths", "dau_mau", "day_user_jaccard"]


@pytest.fixture(scope="module")
def null_user_dir(tmp_path_factory):
    """Events with ~3% null user ids — user-keyed operators ignore
    unattributable events (oracles mirror with WHERE user_id IS NOT NULL
    where SQL would otherwise form a NULL group)."""
    d = str(tmp_path_factory.mktemp("nulluser"))
    ev = pq.read_table(f"{SRC}/events.parquet")
    uid = ev["user_id"].to_pylist()
    for i in range(0, len(uid), 37):
        uid[i] = None
    pq.write_table(ev.set_column(ev.schema.get_field_index("user_id"),
                                 "user_id",
                                 pa.array(uid, type=pa.int64())),
                   f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("qname", NULL_USER_QUERIES)
def test_null_user_matches_oracle(qname, null_user_dir, ray_session):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{null_user_dir}/events.parquet')")
    _assert_matches_oracle(qname, e.queries()[qname](null_user_dir), con)


NEG_ID_QUERIES = ["split_corpus", "sample_corpus", "sample_per_lang",
                  "weighted_sample"]


@pytest.fixture(scope="module")
def neg_id_dir(tmp_path_factory):
    """Documents with ~14% negative doc ids — the splitmix SQL mirrors
    must reproduce numpy's uint64 wrap (a naive HUGEINT id*MIX % 2^64
    takes the dividend's sign and overflows INT128 for u >= 2^63)."""
    d = str(tmp_path_factory.mktemp("negids"))
    docs = pq.read_table(f"{SRC}/documents.parquet")
    ids = docs["doc_id"].to_numpy().copy()
    ids[::7] = -ids[::7] - 1
    pq.write_table(docs.set_column(docs.schema.get_field_index("doc_id"),
                                   "doc_id",
                                   pa.array(ids, type=pa.int64())),
                   f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("qname", NEG_ID_QUERIES)
def test_negative_ids_match_oracle(qname, neg_id_dir, ray_session):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{neg_id_dir}/documents.parquet')")
    _assert_matches_oracle(qname, e.queries()[qname](neg_id_dir), con)


def test_asof_tied_right_timestamps_deterministic(tmp_path, ray_session):
    """Exact-duplicate (user, ts) click rows: the as-of match is pinned to
    max(event_id) among ties on BOTH sides (bare ASOF JOIN / merge_asof
    pick an arbitrary tied row)."""
    import __ray_entry__ as e

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [
        (1, base, "click", 10), (1, base, "click", 11),       # tied pair
        (1, base + 60 * s, "purchase", 12),
        (2, base, "click", 20), (2, base, "click", 21),
        (2, base, "click", 22),                               # triple tie
        (2, base + 5 * s, "purchase", 23),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[3] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows], type=pa.string()),
        "value": pa.array(np.zeros(len(rows))),
    }), str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    pdf = _assert_matches_oracle(
        "events_asof", e.queries()["events_asof"](str(tmp_path)), con)
    got = dict(zip(pdf["event_id"], pdf["match_event_id"]))
    assert got == {12: 11, 23: 22}            # max event_id among ties


def test_all_empty_batch_sketches_no_crash(tmp_path, ray_session):
    """A block whose docs are ALL null/empty/whitespace-only must flow
    through the shingle/minhash paths (regression: drop_empty made the
    zero-posting batch reachable and reduceat crashed on it)."""
    import __ray_entry__ as e

    texts = [None, "", "   \t  ", None] * 50
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["web"] * len(texts)),
        "text": pa.array(texts, type=pa.string()),
    }), str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    for q in ["near_dup_pairs", "minhash_pairs"]:
        _assert_matches_oracle(q, __import__("__ray_entry__")
                               .queries()[q](str(tmp_path)), con)


NULL_VALUE_QUERIES = ["events_hourly", "events_quantiles",
                      "value_histogram"]


@pytest.fixture(scope="module")
def null_value_dir(tmp_path_factory):
    """Events with ~4% null values — sums of only-NULL groups are NULL
    (not pandas' 0.0) and quantiles ignore NULLs like quantile_disc."""
    d = str(tmp_path_factory.mktemp("nullval"))
    ev = pq.read_table(f"{SRC}/events.parquet")
    val = ev["value"].to_pylist()
    for i in range(0, len(val), 23):
        val[i] = None
    pq.write_table(ev.set_column(ev.schema.get_field_index("value"),
                                 "value",
                                 pa.array(val, type=pa.float64())),
                   f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("qname", NULL_VALUE_QUERIES)
def test_null_values_match_oracle(qname, null_value_dir, ray_session):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{null_value_dir}/events.parquet')")
    _assert_matches_oracle(qname, e.queries()[qname](null_value_dir), con)


NULL_TS_QUERIES = ["events_hourly", "events_sliding", "user_sessions",
                   "event_gaps", "cohort_retention", "events_weekday_hour",
                   "events_asof", "funnel_views", "event_windows",
                   "user_streaks"]


@pytest.fixture(scope="module")
def null_ts_dir(tmp_path_factory):
    """Events with ~4% null timestamps — the time-keyed operator
    contract: NULL-ts events are unattributable to any bucket / window /
    session and ignored (oracles mirror with WHERE ts IS NOT NULL; the
    packed int64 group keys would otherwise overflow on NaT)."""
    d = str(tmp_path_factory.mktemp("nullts"))
    ev = pq.read_table(f"{SRC}/events.parquet")
    ts = ev["ts"].to_pylist()
    for i in range(0, len(ts), 27):
        ts[i] = None
    pq.write_table(ev.set_column(ev.schema.get_field_index("ts"), "ts",
                                 pa.array(ts, type=ev.schema.field("ts").type)),
                   f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("qname", NULL_TS_QUERIES)
def test_null_ts_matches_oracle(qname, null_ts_dir, ray_session):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{null_ts_dir}/events.parquet')")
    _assert_matches_oracle(qname, e.queries()[qname](null_ts_dir), con)


@pytest.mark.parametrize("qname", ["doc_perplexity", "distance_join", "nearest_neighbor",
               "nearest_city_stats", "bearing_sectors",
                                   "decontaminate_bloom", "knn_bulk",
                                   "adaptive_tiles", "inverted_index",
                                   "dup_span_stats", "doc_token_rank",
                                   "lang_corr", "events_sliding_distinct"])
def test_tiny_blocks_match_oracle(qname, ray_session):
    """64 KB target blocks reshuffle every per-batch partial boundary —
    the round-3 operators' compact-partial tricks (gram counts, bucket
    emission, OR-merged bloom blobs, partial top-k) must be exact under
    ANY block layout, verified against the plain-gate DuckDB oracle."""
    import ray.data

    import __ray_entry__ as e

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        res = e.queries()[qname](SRC)
    finally:
        ctx.target_max_block_size = old
    con = duckdb.connect()
    for p in glob.glob(f"{SRC}/*.parquet"):
        con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS "
                    f"SELECT * FROM read_parquet('{p}')")
    _assert_matches_oracle(qname, res, con)


@pytest.fixture(scope="module")
def extreme_event_dir(tmp_path_factory):
    """Events with user ids above 2^53 and pre-1970 timestamps — the two
    silent-divergence classes the round-3 advice flagged: a float64
    user-id roundtrip collapses distinct ids above 2^53, and a
    truncating (not flooring) SQL window base shifts negative-epoch
    events one window late."""
    d = str(tmp_path_factory.mktemp("extremeev"))
    ev = pq.read_table(f"{SRC}/events.parquet")
    uid = ev["user_id"].to_numpy().astype(np.int64).copy()
    # adjacent huge ids that collide after a float64 roundtrip
    big = np.int64(2**61)
    uid[::5] = big + uid[::5] * 2
    uid[1::5] = big + uid[1::5] * 2 + 1
    ts = ev["ts"].to_numpy(zero_copy_only=False).copy()
    # push ~1/3 of events before 1970 (epoch seconds < 0), not aligned
    # to the 1800 s slide so floor-vs-truncate actually differs
    ts[::3] = ts[::3] - np.timedelta64(60 * 365 * 86400 + 1234, "s")
    t = ev.set_column(ev.schema.get_field_index("user_id"), "user_id",
                      pa.array(uid, type=pa.int64()))
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     pa.array(ts, type=ev.schema.field("ts").type))
    pq.write_table(t, f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("qname", ["events_sliding_distinct",
                                   "events_distinct_users",
                                   "user_streaks"])
def test_extreme_user_ids_and_negative_epoch(qname, extreme_event_dir,
                                             ray_session):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{extreme_event_dir}/events.parquet')")
    _assert_matches_oracle(qname, e.queries()[qname](extreme_event_dir),
                           con)


def test_majority_duplicate_corpus_anti_join_plan(tmp_path, ray_session):
    """A corpus where ~90% of documents are near-duplicates makes the
    near-dup drop set corpus-proportional — the regime where the
    broadcast np.isin filter in corpus_dedup_keep is unbounded.  Forcing
    broadcast_drop_max=0 routes the drop set through the co-partition
    anti-join (and driver_pairs_max=0 forces distributed label
    propagation); both scale plans must keep exactly the ids the default
    broadcast/union-find plans keep."""
    from s2ray.pipelines.dedup import corpus_dedup_keep, near_dup_clusters
    from s2ray.sources.readers import read_table

    rng = np.random.RandomState(7)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dog", "and", "runs", "through", "green", "fields", "while",
             "birds", "sing", "in", "morning", "light", "today"]
    templates = [" ".join(rng.choice(words, 30)) for _ in range(10)]
    texts, n = [], 400
    for i in range(n):
        if i % 10 == 0:   # 10% unique documents
            texts.append(" ".join(rng.choice(words, 30)) + f" unique{i}")
        else:             # 90% near-dups of a template
            texts.append(templates[i % 10] + f" tail{i % 3}")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["web"] * n),
        "text": pa.array(texts)}), str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    base = sorted(corpus_dedup_keep(sf).to_pandas()["doc_id"])
    anti = sorted(corpus_dedup_keep(sf, broadcast_drop_max=0)
                  .to_pandas()["doc_id"])
    assert anti == base and len(base) < n // 2   # plan-equal, mostly dropped

    ds = read_table(sf, "documents", columns=["doc_id", "text"])
    auto_dist = near_dup_clusters(ds, driver_pairs_max=0).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    drv = near_dup_clusters(ds, method="driver").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert auto_dist.equals(drv)


def test_doc_lang_runs_fold_invariance(ray_session):
    """The segment-concat fold must be bucket-size invariant: tiny
    buckets (every boundary case exercised) == one giant bucket
    (driver brute force)."""
    from s2ray.pipelines.analytics import doc_lang_runs

    tiny = doc_lang_runs(SRC, bucket=7).to_pandas()
    brute = doc_lang_runs(SRC, bucket=1 << 40).to_pandas()
    pd.testing.assert_frame_equal(tiny, brute)
