"""Dedup suite: exact, minhash-LSH, simhash, n-gram Jaccard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_search_pagerank_project_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_dedup,
    minhash_jaccard_estimate,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dups,
    simhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun near the garden"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE + " extra tail words here"),  # near dup of 0
        (3, "completely different content about spark dataframes and shuffles"),
        (4, "  THE   quick brown fox jumps over the lazy dog while the cat watches "
            "from a warm windowsill in the late afternoon sun near the garden  "),
        # 4 = exact dup of 0 after normalization (case/whitespace)
        (5, "another unrelated document mentioning pagerank and web graphs"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    kept = exact_dedup(docs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 0 in ids and 1 not in ids and 4 not in ids
    assert ids == {0, 2, 3, 5}
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3 and groups[0]["keep_id"] == 0


def test_minhash_estimates_jaccard(spark, docs):
    sigs = minhash_signatures(docs, num_hashes=128)
    all_pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
    )
    est = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in minhash_jaccard_estimate(sigs, all_pairs).collect()
    }
    assert est[(0, 1)] == 1.0  # identical docs -> identical signatures
    assert est[(0, 2)] > 0.5  # near dup
    assert est[(0, 3)] < 0.2  # unrelated


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = minhash_dedup(docs, threshold=0.5, num_hashes=64, bands=16)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in found and (0, 4) in found
    assert (0, 3) not in found and (3, 5) not in found


def test_simhash(spark, docs):
    sigs = simhash_signatures(docs)
    vals = {r["id"]: r["simhash"] for r in sigs.collect()}
    assert vals[0] == vals[1]  # identical text -> identical simhash
    pairs = simhash_near_dups(sigs, max_hamming=16)
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert found[(0, 1)] == 0
    assert (0, 2) in found  # near dup within 16 bits
    assert (0, 3) not in found


def test_ngram_jaccard(spark, docs):
    cands = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, cands, n=3).collect()
    }
    assert np.isclose(got[(0, 1)], 1.0)
    assert 0.5 < got[(0, 2)] < 1.0
    assert got[(0, 3)] < 0.05


def test_null_and_empty_text_survive(spark, docs):
    """ADVICE r2 (medium): a dirty corpus row with NULL text must not crash
    any signature path — it degrades to the empty-string signature."""
    dirty = docs.unionAll(
        spark.createDataFrame([(6, None), (7, ""), (8, "   ")],
                              "doc_id long, text string")
    )
    # simhash: the path that crashed (np.asarray(None) TypeError)
    sh = {r["id"]: r["simhash"] for r in simhash_signatures(dirty).collect()}
    assert len(sh) == 9
    assert sh[6] == sh[7] == sh[8]  # null == empty == whitespace-only
    # minhash: null shingle array would crash the reduceat path identically
    ms = {r["id"]: r["sig"] for r in minhash_signatures(dirty).collect()}
    assert len(ms) == 9 and ms[6] == ms[7] == ms[8]
    # ngram jaccard: null vs empty counts as identical (jaccard of the
    # degenerate single empty shingle)
    cands = spark.createDataFrame([(6, 7), (0, 6)], "id_a long, id_b long")
    nj = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dirty, cands, n=3).collect()
    }
    assert nj[(6, 7)] == 1.0 and nj[(0, 6)] == 0.0
    # exact dedup: null/empty/whitespace fingerprint-group together
    groups = exact_dup_groups(dirty).collect()
    sizes = sorted(g["n_dups"] for g in groups)
    assert sizes == [3, 3]  # {0,1,4} and {6,7,8}
