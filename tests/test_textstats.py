"""Text-analysis functions: token counts, quality, language-ID, fingerprints."""

import numpy as np
from pyspark.sql import functions as F

from web_search_pagerank_project_spark.functions.textstats import (
    add_text_stats,
    bpe_ish_token_count,
    detect_language,
    fingerprint,
    punct_ratio,
    quality_score,
    rolling_shingle_hashes,
    stopword_ratio,
    token_count,
)


def one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert one(spark, "a b  c", token_count("text")) == 3
    assert one(spark, "", token_count("text")) == 0
    assert one(spark, "   ", token_count("text")) == 0
    assert one(spark, "single", token_count("text")) == 1


def test_bpe_ish_token_count(spark):
    # words + digit runs + punct marks
    assert one(spark, "hello world", bpe_ish_token_count("text")) == 2
    assert one(spark, "covid-19!", bpe_ish_token_count("text")) == 4


def test_punct_ratio(spark):
    assert one(spark, "abcd", punct_ratio("text")) == 0.0
    assert np.isclose(one(spark, "ab!!", punct_ratio("text")), 0.5)


def test_stopword_ratio_counts_duplicates(spark):
    v = one(spark, "the the the fox", stopword_ratio("text"))
    assert np.isclose(v, 0.75)


def test_quality_score_ranges(spark):
    good = one(
        spark,
        "The quick brown fox jumps over the lazy dog and runs far away.",
        quality_score("text"),
    )
    bad = one(spark, "!!! ??? ### $$$", quality_score("text"))
    assert good == 1.0
    assert bad <= 0.5


def test_detect_language(spark):
    assert one(spark, "the cat and the dog of the house", detect_language("text")) == "en"
    assert one(spark, "der hund und die katze und der vogel", detect_language("text")) == "de"
    assert one(spark, "zzz qqq xxx", detect_language("text")) == "und"


def test_fingerprint_normalization(spark):
    a = one(spark, "Hello   World", fingerprint("text"))
    b = one(spark, "  hello world ", fingerprint("text"))
    c = one(spark, "hello worlds", fingerprint("text"))
    assert a == b and a != c


def test_rolling_shingles(spark):
    v = one(spark, "a b c d e", rolling_shingle_hashes("text", k=3))
    assert len(v) == 3  # 5 tokens -> 3 trigram shingles
    v2 = one(spark, "a b", rolling_shingle_hashes("text", k=3))
    assert len(v2) == 1  # shorter than k -> whole-text hash


def test_add_text_stats_on_documents(spark):
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = add_text_stats(docs)
    rows = out.limit(5).collect()
    assert {"n_tokens", "punct_ratio", "quality", "lang_guess", "fingerprint"} <= set(
        out.columns
    )
    assert all(r["n_tokens"] >= 0 for r in rows)
