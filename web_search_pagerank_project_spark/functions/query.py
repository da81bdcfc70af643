"""Query predicate + personalization vector (reference O15/O18).

Predicate semantics (/root/reference/pagerank.py:188-229, incl. 8 doctests):
  * whitespace-tokenized query; a bare term is a positive *substring* test;
    a ``-term`` is a veto;
  * match iff (any positive term is a substring of the url, OR there are no
    positive terms) AND no negative term is a substring.

Compiled to a single Catalyst boolean expression over ``contains`` — fully
JVM-side, pushable, no Python in the row path. An optional synonym table
(term -> [synonyms]) widens positive terms, mirroring ws_pagerank.py:255-263;
it defaults to empty, which reproduces pagerank.py exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.graph_build import GraphTables


def _split_terms(query: str) -> tuple[list[str], list[str]]:
    pos, neg = [], []
    for term in query.split():
        if term.startswith("-"):
            if len(term) > 1:
                neg.append(term[1:])
            else:
                neg.append("")  # reference: '-' vetoes on '' (always present)
        else:
            pos.append(term)
    return pos, neg


def query_predicate(
    query: str,
    url_col: str | Column = "url",
    synonyms: dict[str, list[str]] | None = None,
) -> Column:
    """Boolean Column implementing url_satisfies_query(url, query)."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    pos, neg = _split_terms(query)
    if synonyms:
        widened = []
        for t in pos:
            widened.append(t)
            widened.extend(synonyms.get(t, []))
        pos_terms = widened
    else:
        pos_terms = pos

    if pos:  # note: "no positive terms" is judged on the raw query, not synonyms
        positive = None
        for t in pos_terms:
            c = col.contains(t)
            positive = c if positive is None else (positive | c)
    else:
        positive = F.lit(True)

    vetoes = F.lit(False)
    for t in neg:
        vetoes = vetoes | col.contains(t)

    return positive & ~vetoes


# alias used by tests for parity with the reference function name
def url_satisfies_query_col(url_col, query: str) -> Column:
    return query_predicate(query, url_col)


def make_personalization_vector(
    graph: GraphTables,
    query: str | None = None,
    synonyms: dict[str, list[str]] | None = None,
) -> DataFrame:
    """(id: long, v: double) — indicator of the query over urls, L1-normalized
    (ws_pagerank.py:96-119). Dense: non-matching vertices carry v=0.0.
    Raises if no url matches (reference asserts sum > 0)."""
    if query is None:
        ind = graph.vertices.select("id", F.lit(1.0).alias("ind"))
    else:
        ind = graph.vertices.select(
            "id",
            F.when(query_predicate(query, "url", synonyms), 1.0)
            .otherwise(0.0)
            .alias("ind"),
        )
    total_df = ind.agg(F.sum("ind").alias("_total"))
    total = total_df.collect()[0]["_total"]
    if not total or total <= 0:
        raise ValueError(f"personalization query matched no urls: {query!r}")
    return ind.select("id", (F.col("ind") / F.lit(float(total))).alias("v"))
