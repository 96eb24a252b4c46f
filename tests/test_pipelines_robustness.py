"""Robustness: malformed pages (missing/truncated geo meta, empty html)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from s2ray.functions.extract import drop_html, extract_geotag, extract_text
from s2ray.stages.assign import assign_cells


def _page(html: str, pid: int) -> dict:
    return {"page_id": pid, "url": f"https://x.example.com/doc/{pid}",
            "html": html.encode(), "lang": "en"}


def test_malformed_pages_flow_through():
    rows = [
        _page('<html><head><meta name="geo.position" content="5000;6000"/>'
              '</head><body><article>ok text</article></body></html>', 0),
        _page("<html><body><article>no geo tag here</article></body></html>", 1),
        _page("<html><body>no article tag at all</body></html>", 2),
        _page("", 3),
        _page('<html><meta name="geo.position" content="garbage;data"/>'
              "<article>bad coords</article>", 4),
    ]
    batch = pa.Table.from_pylist(rows)
    out = extract_text(batch)
    texts = out["text"].to_pylist()
    assert texts[0] == "ok text"
    assert texts[1] == "no geo tag here"
    assert texts[2] is None and texts[3] is None
    out = extract_geotag(out)
    has_geo = out["has_geo"].to_pylist()
    assert has_geo == [True, False, False, False, False]
    out = drop_html(out)
    out = assign_cells(out, token_level=8)
    ids = out["cell_id"].to_numpy(zero_copy_only=False)
    assert ids[0] != 0          # valid geo -> real cell
    assert all(i == 0 for i in ids[1:])  # no geo -> sentinel 0, no crash


def test_emb_integrity_counts_actual_mismatches(tmp_path, ray_session):
    """The audit must count real orphans on both sides (the sf tables are
    fully matched, so the oracle gate alone never exercises n_missing>0)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array(["a"] * 5), "lang": pa.array(["en"] * 5),
        "source": pa.array(["s"] * 5),
        "n_chars": pa.array([1] * 5, type=pa.int64()),
    }), f"{d}/documents.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([3, 4, 5, 6, 7, 8], type=pa.int64()),
        "embedding": pa.array([[0.0, 1.0]] * 6,
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * 6, type=pa.int32()),
    }), f"{d}/embeddings.parquet")
    out = e.queries()["emb_integrity"](d).to_pandas() \
        .sort_values("side").reset_index(drop=True)
    assert out.loc[0, "side"] == "documents"
    assert (out.loc[0, ["n_total", "n_matched", "n_missing"]]
            .tolist() == [5, 3, 2])
    assert (out.loc[1, ["n_total", "n_matched", "n_missing"]]
            .tolist() == [6, 3, 3])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")
    ora = con.execute(e.oracle_sql()["emb_integrity"]).df() \
        .sort_values("side").reset_index(drop=True)
    assert ora.equals(out.astype(ora.dtypes.to_dict()))


def test_domain_pagerank_empty_corpus(tmp_path, ray_session):
    """A zero-row documents table must yield an empty 3-column result,
    not an IndexError from a float64 empty mask used as indices."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s2ray.pipelines.webgraph import domain_pagerank

    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64()),
    }), f"{d}/documents.parquet")
    out = domain_pagerank(d).to_pandas()
    assert len(out) == 0
    # an entirely-empty upstream may collapse to a zero-column dataset;
    # if any schema survives it must be the documented one
    assert list(out.columns) in ([], ["domain", "out_links", "pagerank"])


def test_event_cooccurrence_raises_past_mask_budget(tmp_path, ray_session):
    """63+ distinct event types must raise (bit 63 would wrap the signed
    int64 mask Sum) rather than silently corrupt per-user masks."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from s2ray.pipelines.analytics import event_cooccurrence

    d = str(tmp_path)
    n = 63
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array([0] * n, type=pa.timestamp("us")),
        "user_id": pa.array([1] * n, type=pa.int64()),
        "event_type": pa.array([f"t{i:03d}" for i in range(n)]),
        "value": pa.array([0.0] * n, type=pa.float64()),
        "props": pa.array(["{}"] * n, type=pa.string()),
    }), f"{d}/events.parquet")
    with _pytest.raises(ValueError, match="62-bit"):
        event_cooccurrence(d)


def test_graph_stats_on_sparse_graph(tmp_path, ray_session):
    """The sf corpora produce the complete K20 domain graph (assortativity
    NULL, every BFS depth 1); a small doc_id slice makes the graph sparse
    and irregular so reciprocity < 1, assortativity is non-NULL, and BFS
    reaches depth >= 2 — all still gated bit-exact against the oracles."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = str(tmp_path)
    n = 40
    ids = np.arange(n, dtype=np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(["w"] * n),
        "lang": pa.array(["en"] * n),
        # only 4 source domains -> sparse, irregular degrees
        "source": pa.array([f"src{i % 4}" for i in range(n)]),
        "n_chars": pa.array([1] * n, type=pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    qs, os_ = e.queries(), e.oracle_sql()
    for name in ("domain_reciprocity", "domain_assortativity",
                 "domain_bfs_depth"):
        out = qs[name](d).to_pandas()
        ora = con.execute(os_[name]).df()
        a = out[sorted(out.columns)].sort_values(
            list(sorted(out.columns))).reset_index(drop=True)
        b = ora[sorted(ora.columns)].sort_values(
            list(sorted(ora.columns))).reset_index(drop=True)
        assert a.astype(str).equals(b.astype(str)), name
    rec = qs["domain_reciprocity"](d).to_pandas()
    assert 0 < rec.loc[0, "n_reciprocal"] <= rec.loc[0, "n_edges"]
    asr = qs["domain_assortativity"](d).to_pandas()
    assert not np.isnan(asr.loc[0, "assortativity"])


def test_heaps_law_on_growing_vocabulary(tmp_path, ray_session):
    """The sf corpora saturate their 31-token vocabulary in the first
    checkpoint (beta == 0); a corpus whose docs introduce fresh tokens
    over doc_id order exercises a non-degenerate sublinear fit, still
    bit-exact against the oracle."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = str(tmp_path)
    n = 200
    rng = []
    for i in range(n):
        # doc i speaks tokens from a prefix alphabet that grows ~sqrt(i)
        kmax = max(1, int((i + 1) ** 0.5) * 3)
        words = [f"w{(i * 7 + j * 13) % kmax}" for j in range(20)]
        rng.append(" ".join(words))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array(rng),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array([len(t) for t in rng], type=pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    out = e.queries()["heaps_law"](d).to_pandas()
    ora = con.execute(e.oracle_sql()["heaps_law"]).df()
    cols = sorted(out.columns)
    for c in cols:
        a, b = np.asarray(out[c]), np.asarray(ora[c])
        assert np.array_equal(a, b, equal_nan=(a.dtype.kind == "f")), c
    assert 0.1 < out.loc[0, "beta"] < 1.0


def test_shipping_priority_plans_agree(ray_session):
    """The Q3 broadcast plan and the double co-partition scale plan must
    produce the identical top-10 (forced by broadcast_threshold_bytes=0)."""
    from s2ray.pipelines.join import shipping_priority

    sf = "/root/testdata/sf0.001"
    a = shipping_priority(sf).to_pandas()
    b = shipping_priority(sf, broadcast_threshold_bytes=0).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype(str).equals(b.astype(str))
    assert len(a) == 10


def test_spatial_stats_empty_corpus(tmp_path, ray_session):
    """ripley_k must yield one NULL-K row per radius and clark_evans one
    NULL-stats row on an empty corpus — matching their oracles' shapes
    instead of collapsing to zero rows (cf. domain_pagerank fix)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    rip = e.queries()["ripley_k"](d).to_pandas()
    ora = con.execute(e.oracle_sql()["ripley_k"]).df()
    assert len(rip) == len(ora) == 3
    assert rip["n_pairs"].tolist() == [0, 0, 0]
    assert rip["k_km2"].isna().all() and ora["k_km2"].isna().all()
    ce = e.queries()["clark_evans"](d).to_pandas()
    cora = con.execute(e.oracle_sql()["clark_evans"]).df()
    assert len(ce) == len(cora) == 1
    assert ce.loc[0, "n_points"] == 0 and ce.loc[0, "n_with_nn"] == 0
    assert ce["ce"].isna().all() and cora["ce"].isna().all()


def test_returned_items_plans_agree(ray_session):
    """Q10 broadcast and co-partition dimension plans must return
    identical rows (cf. shipping_priority)."""
    from s2ray.pipelines.join import returned_items

    sf = "/root/testdata/sf0.01"
    a = returned_items(sf).to_pandas()
    b = returned_items(sf, broadcast_threshold_bytes=0).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype(str).equals(b.astype(str))
    assert len(a) == 20


def test_pmi_joined_path(ray_session):
    """The web-vocabulary PMI path (co-partition marginal joins, forced
    with marginal_broadcast_max=0) must return bit-identical rows to
    the broadcast-dict path (round-4 review: no vocab-sized driver
    dict above the threshold)."""
    from s2ray.pipelines.text import pmi_collocations

    sf = "/root/testdata/sf0.001"
    a = pmi_collocations(sf, min_count=3).to_pandas()
    b = pmi_collocations(sf, min_count=3,
                         marginal_broadcast_max=0).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)


def test_skipgram_textrank_bounded_topk(ray_session):
    """The reworked two-level top-k paths still produce full-k frames
    with strictly ordered ranks on the real corpus."""
    from s2ray.pipelines.text import skipgram_pairs, textrank_keywords

    sf = "/root/testdata/sf0.001"
    sg = skipgram_pairs(sf, k=25).to_pandas()
    assert len(sg) == 25
    assert sg["rank"].tolist() == list(range(1, 26))
    assert (np.diff(sg["n"].to_numpy()) <= 0).all()
    tr = textrank_keywords(sf, n_nodes=50, k=10).to_pandas()
    assert len(tr) == 10
    assert tr["rank"].tolist() == list(range(1, 11))
    assert (np.diff(tr["score"].to_numpy()) <= 0).all()


def test_tfidf_joined_path(ray_session):
    """The web-vocabulary TF-IDF path (co-partition DF join + doc-id
    re-bucket, forced with df_broadcast_max=0) must return
    bit-identical rows to the broadcast-Series path."""
    from s2ray.pipelines.text import tfidf_top_terms

    sf = "/root/testdata/sf0.001"
    a = tfidf_top_terms(sf).to_pandas()
    b = tfidf_top_terms(sf, df_broadcast_max=0).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)


def test_token_dispersion_bounded_topk(ray_session):
    """The two-level dispersion cut still yields the full top-k frame
    with the doc-count sentinel folded in (fano well-defined)."""
    from s2ray.pipelines.text import token_dispersion

    sf = "/root/testdata/sf0.001"
    td = token_dispersion(sf, k=15).to_pandas()
    assert len(td) == 15
    assert td["rank"].tolist() == list(range(1, 16))
    assert (np.diff(td["n_total"].to_numpy()) <= 0).all()
    assert td["fano"].notna().all()


def test_sliding_distinct_negative_epochs(tmp_path, ray_session):
    """Pre-1970 timestamps: numpy's `//` floors while DuckDB's integer
    `//` truncates toward zero, so the oracle's double-mod window base
    (es - ((es % s) + s) % s) is load-bearing — engine and oracle must
    agree bit-exactly on a corpus straddling the epoch."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = str(tmp_path)
    n = 400
    # timestamps from 1969-12-29 to 1970-01-02, every ~17 minutes
    es = np.arange(n, dtype=np.int64) * 1021 - 200_000
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(es.astype("datetime64[s]").astype(
            "datetime64[us]")),
        "user_id": pa.array((np.arange(n) * 7) % 23, type=pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n),
    }), f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    for q in ("events_sliding_distinct", "events_sliding"):
        out = e.queries()[q](d).to_pandas()
        ora = con.execute(e.oracle_sql()[q]).df()
        cols = sorted(out.columns)
        a = out[cols].sort_values(cols, ignore_index=True)
        b = ora[cols].sort_values(cols, ignore_index=True)
        assert len(a) == len(b) and len(a) > 0, q
        for c in cols:
            assert np.array_equal(np.asarray(a[c]),
                                  np.asarray(b[c])), (q, c)


def test_group_keys_with_nul_and_flag_bytes(tmp_path, ray_session):
    """Group values containing NUL bytes, the old separator byte, and
    strings that mimic the flag prefixes ("N", "V3:abc") must neither
    alias NULL groups nor each other (review finding: the former
    sentinel packing could alias) — engine vs oracle bit-exact for the
    three repacked operators."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = str(tmp_path)
    langs = ["en", None, "\x00", "N", "V2:en", "a\x1fb", "", "en"]
    srcs = ["s1", "s1", None, "\x1f", "s1", "a", "b\x00", "s1"]
    n = len(langs)
    texts = [f"tok{i} tok{i} alpha" for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(srcs, type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    for q in ("group_sizes_hist", "doc_deciles"):
        out = e.queries()[q](d).to_pandas()
        ora = con.execute(e.oracle_sql()[q]).df()
        cols = sorted(out.columns)
        a = out[cols].sort_values(cols, ignore_index=True)
        b = ora[cols].sort_values(cols, ignore_index=True)
        assert len(a) == len(b) and len(a) > 0, q
        for c in cols:
            av, bv = np.asarray(a[c]), np.asarray(b[c])
            if av.dtype.kind == "f":
                assert np.array_equal(av, bv, equal_nan=True), (q, c)
            else:
                assert np.array_equal(
                    pd.isna(av), pd.isna(bv)), (q, c)
                m = ~pd.isna(av)
                assert np.array_equal(av[m], bv[m]), (q, c)
    # docs_rollup: rollup NULLs and data NULLs must stay separate rows
    from s2ray.pipelines.analytics import docs_rollup

    r = docs_rollup(d).to_pandas()
    both_null = r[r["lang"].isna() & r["source"].isna()]
    # grand-total rollup + any (NULL lang, NULL source) data group
    assert int(both_null["n_docs"].max()) == n
    assert int(r["n_docs"].max()) == n


def test_standardize_all_null_value_group(tmp_path, ray_session):
    """A group whose values are ALL NULL never enters the moment table;
    its rows must come out z=NULL (oracle outer-join semantics), not
    crash the score pass (review finding, reproduced as KeyError)."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = str(tmp_path)
    langs = ["en", "en", "xx", "xx", "de"]
    chars = [10, 20, None, None, 7]
    texts = ["a b", "c d", "e", "f", "g h i"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(5), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(["s"] * 5),
        "n_chars": pa.array(chars, type=pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    out = e.queries()["standardize_docs"](d).to_pandas()
    ora = con.execute(e.oracle_sql()["standardize_docs"]).df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols, ignore_index=True)
    b = ora[cols].sort_values(cols, ignore_index=True)
    assert len(a) == len(b) == 5
    assert a["z"].isna().sum() == 2 and b["z"].isna().sum() == 2


def test_quality_median_filter_null_lang(tmp_path, ray_session):
    """NULL-lang documents drop (the oracle's JOIN USING (lang)
    semantics) instead of crashing the per-language median shuffle
    (review finding, reproduced as TypeError)."""
    import pyarrow.parquet as pq

    from s2ray.pipelines.text import quality_median_filter

    d = str(tmp_path)
    langs = ["en", "en", None, "de", "de", None]
    texts = [f"word{i} text here more tokens now" for i in range(6)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(6), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(["s"] * 6),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), f"{d}/documents.parquet")
    out = quality_median_filter(d).to_pandas()
    assert out["lang"].notna().all()
    assert set(out["lang"]) <= {"en", "de"}
    assert len(out) >= 2            # each lang keeps >= its median doc


def test_group_quantiles_null_group_key(tmp_path, ray_session):
    """A NULL event_type must form its own quantile group (the
    _dict_codes contract) instead of crashing the driver's group sort
    (review finding, reproduced as TypeError on sorted([None, ...]))."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = str(tmp_path)
    n = 60
    types = [None if i % 10 == 0 else f"t{i % 3}" for i in range(n)]
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(np.arange(n) * 1000, type=pa.timestamp("us")),
        "user_id": pa.array(np.arange(n) % 7, type=pa.int64()),
        "event_type": pa.array(types, type=pa.string()),
        "value": pa.array((np.arange(n) * 13 % 97).astype(np.float64)),
        "props": pa.array(["{}"] * n),
    }), f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    out = e.queries()["events_quantiles"](d)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ora = con.execute(e.oracle_sql()["events_quantiles"]).df()
    assert len(out) == len(ora)
    # the NULL group yields one row per requested quantile (3), on
    # both engines, with identical values
    assert out["event_type"].isna().sum() \
        == ora["event_type"].isna().sum() == 3
    a = out[out["event_type"].isna()].sort_values("q", ignore_index=True)
    b = ora[ora["event_type"].isna()].sort_values("q", ignore_index=True)
    assert a["value"].tolist() == b["value"].tolist()


def test_emb_integrity_duplicate_ids(tmp_path, ray_session):
    """Duplicate ids — the very corruption an integrity audit exists
    for — must mirror the oracle's LEFT-JOIN fan-out counts, not
    distinct-id intersection counts (review finding)."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["a"] * 4), "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([1] * 4, type=pa.int64()),
    }), f"{d}/documents.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 3, 3, 9], type=pa.int64()),
        "embedding": pa.array([[0.0, 1.0]] * 4,
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * 4, type=pa.int32()),
    }), f"{d}/embeddings.parquet")
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    out = e.queries()["emb_integrity"](d).to_pandas() \
        .sort_values("side").reset_index(drop=True)
    ora = con.execute(e.oracle_sql()["emb_integrity"]).df() \
        .sort_values("side").reset_index(drop=True)
    assert ora.equals(out.astype(ora.dtypes.to_dict()))
