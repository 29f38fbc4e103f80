"""LSH bucket-size cap (degenerate-bucket corpus) and batch k-NN joins
(exact + LSH-bucketed vs brute-force recall)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions import dedup as D
from crawl4ai_spark.functions import similarity as SIM


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    # 40 byte-identical boilerplate docs (every band collides) + 2 true
    # near-dups + unique fillers
    boiler = "the same boilerplate text repeated again and again for every page"
    near_a = "unique alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_b = "unique alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [(i, boiler) for i in range(40)]
    rows += [(100, near_a), (101, near_b)]
    rows += [(200 + i, f"filler {i} totally different words here {i * 7} end") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_cap_bounds_pairs(spark, degenerate_docs):
    sig = D.minhash_signature(degenerate_docs, num_hashes=16, shingle_n=3)
    uncapped = D.minhash_lsh_pairs(sig, max_bucket_size=None).count()
    capped = D.minhash_lsh_pairs(sig, max_bucket_size=10)
    capped_rows = capped.collect()
    # uncapped: the 40-clone bucket alone yields 40*39/2 = 780 pairs
    assert uncapped >= 780
    # capped: the degenerate bucket is dropped entirely...
    ids = {(r["id_a"], r["id_b"]) for r in capped_rows}
    assert all(not (a < 40 and b < 40) for a, b in ids)
    # ...but the small near-dup bucket survives
    assert (100, 101) in ids


def test_bucket_stats_report_dropped_mass(spark, degenerate_docs):
    sig = D.minhash_signature(degenerate_docs, num_hashes=16, shingle_n=3)
    stats = {r["band"]: r for r in D.lsh_bucket_stats(sig, max_bucket_size=10).collect()}
    assert len(stats) == 4
    for band, r in stats.items():
        assert r["max_bucket"] == 40          # the clone bucket
        assert r["buckets_over_cap"] >= 1
        assert r["rows_dropped"] >= 40


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(60):
        # deterministic vectors on a ring + radius wobble
        ang = (i * 37) % 360 / 180.0 * math.pi
        r = 1.0 + (i % 5) * 0.1
        rows.append((i, [r * math.cos(ang), r * math.sin(ang), (i % 7) * 0.2, 1.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_knn_join_matches_per_query_topk(spark, vectors):
    queries = vectors.filter(F.col("vec_id").isin(0, 5, 11)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.brute_force_knn_join(queries, vectors, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cos_sim"]))
    assert set(by_q) == {0, 5, 11}
    for qid, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == [1, 2, 3, 4]
        # rank 1 is the query itself (cosine 1.0)
        assert rows[0][1] == qid and rows[0][2] == pytest.approx(1.0)
        # single-query oracle agrees
        qvec = [r["embedding"] for r in queries.filter(F.col("query_id") == qid).collect()][0]
        single = SIM.brute_force_topk(vectors, list(qvec), k=4).collect()
        assert [r[1] for r in rows] == [s["vec_id"] for s in single]


def test_lsh_knn_join_recall(spark, vectors):
    queries = vectors.filter(F.col("vec_id").isin(0, 5, 11)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = SIM.brute_force_knn_join(queries, vectors, k=4).collect()
    approx = SIM.lsh_knn_join(queries, vectors, dim=4, k=4, planes=6).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    # self-match always survives (hamming-0 bucket contains the query)
    for q in (0, 5, 11):
        assert (q, q) in ap
    # multi-probe recall: at least half the exact neighbors found
    assert len(ex & ap) >= len(ex) // 2
    # every approx candidate's score equals the exact cosine (scores are
    # computed the same way — only the candidate set is approximate)
    ex_scores = {(r["query_id"], r["vec_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in ex_scores:
            assert r["cos_sim"] == pytest.approx(ex_scores[key])


def test_universal_family_matches_python_mirror(spark, degenerate_docs):
    """The universal affine family must be bit-reproducible outside
    Spark (same md5 base, same (a, b) literals) — that determinism is
    what the DuckDB oracle relies on."""
    import hashlib

    from crawl4ai_spark.functions.dedup import uhash_chunks

    docs = degenerate_docs.filter(F.col("doc_id").isin(100, 101, 200))
    sig = {
        r["doc_id"]: r["sig"]
        for r in D.minhash_signature(
            docs, num_hashes=8, shingle_n=3, hash_family="universal"
        ).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    chunks = uhash_chunks(8)
    for doc_id, text in texts.items():
        toks = [t for t in text.lower().strip().split() if t]
        shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        want = [
            min(
                int(
                    hashlib.md5((salt + s).encode()).hexdigest()[off : off + 8],
                    16,
                )
                for s in shingles
            )
            for salt, off in chunks
        ]
        assert list(sig[doc_id]) == want, doc_id


def test_universal_family_finds_same_near_dups(spark, degenerate_docs):
    """Family swap changes WHICH buckets collide, not the confirmed
    near-dup semantics: both families must surface the true pair and
    the clone clique on this fixture."""
    for fam in ("md5", "universal"):
        sig = D.minhash_signature(
            degenerate_docs, num_hashes=16, shingle_n=3, hash_family=fam
        )
        ids = {
            (r["id_a"], r["id_b"])
            for r in D.minhash_lsh_pairs(sig, max_bucket_size=None).collect()
        }
        assert (100, 101) in ids, fam
        assert (0, 1) in ids, fam


def test_short_docs_yield_empty_shingles_not_crash(spark):
    # < n tokens => empty shingle array; sequence(1, 0) is the
    # DESCENDING [1, 0] and used to abort the job via element_at(, 0)
    docs = spark.createDataFrame(
        [(0, ""), (1, "one"), (2, "two words"), (3, "three word doc")],
        "doc_id long, text string",
    )
    sh = docs.select(
        "doc_id", F.size(D.word_shingles(F.col("text"), 3)).alias("n")
    ).collect()
    got = {r["doc_id"]: r["n"] for r in sh}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1}
    # downstream minhash over short docs also survives; shingle-less
    # docs simply have no signature row (min over an empty shingle set
    # is undefined, and the explode drops them)
    sig = D.minhash_signature(docs, num_hashes=8, shingle_n=3)
    assert [r["doc_id"] for r in sig.collect()] == [3]


def test_band_overflow_raises_loudly(spark):
    # bands * rows_per_band > num_hashes must error, not silently hash
    # empty-string mega-buckets (quadratic self-join at scale)
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    sig = D.minhash_signature(docs, num_hashes=8, shingle_n=3)
    with pytest.raises(Exception, match="bands\\*rows_per_band"):
        D.minhash_lsh_pairs(sig, bands=4, rows_per_band=4).collect()
