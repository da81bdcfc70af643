"""HTML extraction (X1): byte-identical text invariant + outlink parity +
dedupe-by-latest-capture."""

from pyspark.sql import functions as F

from web_search_pagerank_project_spark.functions.html import (
    dedupe_latest_capture,
    edges_from_pages,
    extract_pages,
    extract_text_py,
)
from web_search_pagerank_project_spark.sources.synth import (
    render_page_html,
    synth_pages,
)


def test_extract_text_roundtrip_unit():
    html = render_page_html(
        "u", "Ti&amp;tle <b>x</b>", ["para one", "p &lt;2&gt;"], ["a", "b"]
    )
    assert extract_text_py(html) == "Ti&tle x\npara one\np <2>"


def test_byte_identical_text_invariant(spark):
    pages = synth_pages(spark, n=200, seed=7, dup_fraction=0.2)
    extracted = extract_pages(pages, dedupe=True)
    latest = dedupe_latest_capture(pages).select("url", F.col("text").alias("expected"))
    joined = extracted.join(latest, "url")
    mismatches = joined.filter(F.col("text") != F.col("expected")).count()
    assert mismatches == 0
    assert joined.count() == 200  # every url extracted exactly once


def test_dedupe_keeps_latest_capture(spark):
    pages = synth_pages(spark, n=100, seed=3, dup_fraction=1.1)  # all duplicated
    assert pages.count() == 200
    latest = dedupe_latest_capture(pages)
    assert latest.count() == 100
    # the stale capture's text starts with 'OLD '; none may survive
    assert latest.filter(F.col("text").startswith("OLD ")).count() == 0


def test_edges_from_pages_multiplicity(spark):
    pages = synth_pages(spark, n=50, seed=11, dup_fraction=0.0)
    edges = edges_from_pages(pages)
    # every edge's src must be a real page url
    n_bad = edges.join(
        pages.select(F.col("url").alias("src")).distinct(), "src", "left_anti"
    ).count()
    assert n_bad == 0
    assert edges.count() > 0
