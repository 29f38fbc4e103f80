"""Driver-contract sanity: entry() produces rows; every oracle key has
a query; flagship schema is stable."""

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
    # rows-only (non-SQL-expressible) queries are expected and documented
    rows_only = set(q) - set(o)
    assert rows_only <= {
        "bff_crawl", "dfs_crawl", "politeness_backoff", "minhash_lsh_pairs",
        "ann_lsh_topk", "image_validation", "url_relevance",
        "ann_knn_join",
    }


def test_entry_runs_and_has_rows(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["url", "depth", "n"]
    assert df.count() > 0
