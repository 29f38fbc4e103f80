"""Driver-contract sanity: entry() produces rows; every oracle key has
a query; flagship schema is stable."""

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # the driver grades the first 50 registry entries — stay at 50
    assert len(q) == 50
    # r4: image_validation gained a derived-boolean oracle (the last
    # rows-only row) — every registry entry now carries a hard oracle.
    rows_only = set(q) - set(o)
    assert rows_only == set()


def test_suites_carry_retired_coverage(spark):
    """Every RETIRED_INTO target exists and still exposes the retired
    rows/columns (VERDICT r3 #8: consolidation must not drop hard
    coverage)."""
    q = entry_mod.queries()
    for _, (suite, _) in entry_mod.RETIRED_INTO.items():
        assert suite in q, suite
    sf = "/root/testdata/sf0.001"
    norm = q["normalize_suite"](spark, sf)
    assert {"norm_url", "norm_deep", "norm_eff"} <= set(norm.columns)
    ds = q["domain_sources"](spark, sf)
    srcs = {r["source"] for r in ds.select("source").distinct().collect()}
    assert srcs == {"wayback", "crt", "probe", "feed"}
    # r5: sitemap_seeds + cc_seeds → seeds_suite, one tagged row group each
    ss = q["seeds_suite"](spark, sf)
    s_srcs = {r["source"] for r in ss.select("source").distinct().collect()}
    assert s_srcs == {"sitemap", "cc"}
    # r5: exact_dedup + minhash_signature + simhash → dedup_suite
    ds2 = q["dedup_suite"](spark, sf)
    kinds = {r["kind"] for r in ds2.select("kind").distinct().collect()}
    assert kinds == {"exact", "minhash", "simhash"}
    # r5: head_bm25 → content_relevance_filter column text_bm25_fp
    assert "text_bm25_fp" in q["content_relevance_filter"](spark, sf).columns
    # r5: chunk_suite covers 3 strategies × 2 parameterizations
    strats = {
        r["strat"]
        for r in q["chunk_suite"](spark, sf).select("strat").distinct().collect()
    }
    assert strats == {
        "fixed_50", "fixed_120", "sliding_30_10", "sliding_45_15",
        "overlap_60_20", "overlap_40_10",
    }
    suite_cols = {
        "scorer_suite": {"kw_score", "ctype_score", "fresh_score",
                         "domauth_score", "depth_score", "comp_score"},
        "filter_chain": {"pat_pass", "ctype_pass", "dom_pass", "valid_pass",
                         "chain_pass"},
        "text_stats_suite": {"n_tokens", "quality", "lang_pred", "stop_ratio",
                             "fp"},
    }
    for name, cols in suite_cols.items():
        have = set(q[name](spark, sf).columns)
        assert cols <= have, (name, cols - have)


def test_entry_runs_and_has_rows(spark):
    df = entry_mod.entry(spark)
    assert df.columns == [
        "url", "emit_seq", "image_id",
        "psnr_db", "pixels_ok", "caption_ok", "phash_match",
    ]
    rows = df.collect()
    assert len(rows) > 0
    # the north-rule invariant holds for every crawled page
    assert all(r["pixels_ok"] and r["caption_ok"] and r["phash_match"]
               for r in rows)
    assert all(r["psnr_db"] >= 40.0 for r in rows)
