"""Query predicate (O18), personalization (O15), search sink (O17/O19/O21)."""

import numpy as np
import pytest

from conftest import SMALL_EDGES

from web_search_pagerank_project_spark import (
    build_graph,
    make_personalization_vector,
    pagerank,
    search,
)
from web_search_pagerank_project_spark.functions.query import query_predicate

from pyspark.sql import functions as F

DOCTEST_URL = "www.lawfareblog.com/covid-19-speech"
DOCTEST_CASES = [
    ("covid", True),
    ("coronavirus covid", True),
    ("coronavirus", False),
    ("covid -speech", False),
    ("covid -corona", True),
    ("-speech", False),
    ("-corona", True),
    ("", True),
]


def test_query_predicate_doctable(spark):
    df = spark.createDataFrame([(DOCTEST_URL,)], "url string")
    for q, expected in DOCTEST_CASES:
        got = df.select(query_predicate(q, "url").alias("m")).collect()[0]["m"]
        assert got is expected, q


def test_query_predicate_synonyms(spark):
    df = spark.createDataFrame([(DOCTEST_URL,)], "url string")
    # 'coronavirus' alone fails, but with synonym 'covid' it matches
    got = df.select(
        query_predicate("coronavirus", "url", {"coronavirus": ["covid"]}).alias("m")
    ).collect()[0]["m"]
    assert got is True


def test_personalization_normalization(spark):
    df = spark.createDataFrame(SMALL_EDGES, "src string, dst string")
    graph = build_graph(df, cache=False)
    v = make_personalization_vector(graph, None)
    vals = [r["v"] for r in v.collect()]
    assert np.isclose(sum(vals), 1.0)
    v4 = make_personalization_vector(graph, "4")
    rows = {r["id"]: r["v"] for r in v4.collect()}
    urls = {r["url"]: r["id"] for r in graph.vertices.collect()}
    assert np.isclose(rows[urls["4"]], 1.0)
    assert sum(1 for x in rows.values() if x > 0) == 1
    assert len(rows) == 6  # dense vector incl. zeros


def test_personalization_empty_match_raises(spark):
    df = spark.createDataFrame(SMALL_EDGES, "src string, dst string")
    graph = build_graph(df, cache=False)
    with pytest.raises(ValueError):
        make_personalization_vector(graph, "nomatch")


def test_search_top_k(spark):
    df = spark.createDataFrame(SMALL_EDGES, "src string, dst string")
    graph = build_graph(df, cache=True)
    res = pagerank(graph)
    out = search(graph, res, query="", max_results=3).collect()
    assert [r["url"] for r in out] == ["4", "6", "5"]
    # negation: exclude "4"
    out2 = search(graph, res, query="-4", max_results=10).collect()
    assert "4" not in {r["url"] for r in out2}
    # positive term: only urls containing "5"
    out3 = search(graph, res, query="5", max_results=10).collect()
    assert {r["url"] for r in out3} == {"5"}
    graph.unpersist()


def test_search_synonym_rescoring(spark):
    df = spark.createDataFrame(
        [("covid-news", "covid-speech"), ("covid-speech", "corona-bill"),
         ("corona-bill", "covid-news")],
        "src string, dst string",
    )
    graph = build_graph(df, cache=True)
    res = pagerank(graph, max_iterations=20)
    syn = {"corona": [("covid", 0.9), ("corona", 1.0)]}
    out = search(graph, res, query="corona", max_results=10, synonyms=syn).collect()
    # with synonyms, covid-* urls match too
    urls = {r["url"] for r in out}
    assert "covid-news" in urls and "corona-bill" in urls
    # ranking = pagerank * sum(count(word)*sim^50); spot-check one row
    ranks = {r["url"]: r["rank"] for r in res.by_url(graph).collect()}
    scored = {r["url"]: r["ranking"] for r in out}
    # corona-bill contains 'corona' once (sim 1.0) and 'covid' zero times
    assert np.isclose(scored["corona-bill"], ranks["corona-bill"] * 1.0)
    # covid-news contains 'covid' once -> 0.9^50
    assert np.isclose(scored["covid-news"], ranks["covid-news"] * 0.9**50)
    graph.unpersist()


def _write_w2v(path, vecs: dict[str, list[float]]):
    dim = len(next(iter(vecs.values())))
    with open(path, "w") as f:
        f.write(f"{len(vecs)} {dim}\n")
        for w, v in vecs.items():
            f.write(w + " " + " ".join(str(x) for x in v) + "\n")


def test_word2vec_loader_most_similar(tmp_path):
    from web_search_pagerank_project_spark.functions.synonyms import WordVectors

    p = str(tmp_path / "vecs.txt")
    _write_w2v(
        p,
        {
            "corona": [1.0, 0.0, 0.0],
            "covid": [0.9, 0.1, 0.0],   # nearest to corona
            "speech": [0.0, 1.0, 0.0],
            "banana": [0.0, 0.0, 1.0],
        },
    )
    wv = WordVectors.load_word2vec_text(p)
    sims = wv.most_similar("corona", topn=2)
    assert sims[0][0] == "covid" and sims[0][1] > 0.98
    assert sims[1][0] == "speech"
    # self-exclusion and OOV behavior
    assert all(w != "corona" for w, _ in sims)
    assert wv.most_similar("notaword") == []


def _write_w2v_binary(path, vecs: dict[str, list[float]], newline=True):
    import struct

    dim = len(next(iter(vecs.values())))
    with open(path, "wb") as f:
        f.write(f"{len(vecs)} {dim}\n".encode())
        for w, v in vecs.items():
            f.write(w.encode() + b" ")
            f.write(struct.pack(f"<{dim}f", *v))
            if newline:  # the C tool writes one, gensim does not
                f.write(b"\n")


def test_word2vec_binary_loader_matches_text(tmp_path):
    """The C-binary reader yields the same model as the text reader (float32
    round-trip tolerance), with and without inter-entry newlines, and
    WordVectors.load auto-detects both formats."""
    from web_search_pagerank_project_spark.functions.synonyms import WordVectors

    vecs = {
        "corona": [1.0, 0.0, 0.0],
        "covid": [0.9, 0.1, 0.0],
        "speech": [0.0, 1.0, 0.0],
        "banana": [0.0, 0.0, 1.0],
    }
    pt = str(tmp_path / "vecs.txt")
    _write_w2v(pt, vecs)
    for newline in (True, False):
        pb = str(tmp_path / f"vecs_{newline}.bin")
        _write_w2v_binary(pb, vecs, newline=newline)
        wv = WordVectors.load_word2vec_binary(pb)
        ref = WordVectors.load_word2vec_text(pt)
        for term in vecs:
            got, want = wv.most_similar(term, 3), ref.most_similar(term, 3)
            assert [w for w, _ in got] == [w for w, _ in want]
            assert all(
                abs(a - b) < 1e-6 for (_, a), (_, b) in zip(got, want)
            )
    # auto-detect: same file contents through the format-sniffing entrypoint
    assert WordVectors.load(pb).most_similar("corona", 1)[0][0] == "covid"
    assert WordVectors.load(pt).most_similar("corona", 1)[0][0] == "covid"
    # truncated binary fails loudly, not silently
    import pytest

    raw = open(pb, "rb").read()
    ptrunc = str(tmp_path / "trunc.bin")
    with open(ptrunc, "wb") as f:
        f.write(raw[:-7])
    with pytest.raises(ValueError):
        WordVectors.load_word2vec_binary(ptrunc)


def test_pipeline_synonyms_file_end_to_end(spark, tmp_path):
    """O20 end-to-end: --synonyms_file drives ws_pagerank.py:209-225's
    formula (top-5 most_similar, sim**50 re-scoring, widened predicate)
    from a local word2vec text file."""
    from web_search_pagerank_project_spark.plans.pipeline import run_pipeline

    # graph whose urls mention covid but the query says corona
    import gzip

    data = str(tmp_path / "edges.csv.gz")
    with gzip.open(data, "wt") as f:
        f.write("source,target\n")
        f.write("covid-news,covid-speech\n")
        f.write("covid-speech,corona-bill\n")
        f.write("corona-bill,covid-news\n")
    p = str(tmp_path / "vecs.txt")
    _write_w2v(
        p,
        {
            "corona": [1.0, 0.05, 0.0],
            "covid": [0.95, 0.1, 0.0],
            "other": [0.0, 1.0, 0.0],
        },
    )
    out = run_pipeline(
        spark,
        data=data,
        search_query="corona",
        max_iterations=20,
        synonyms_file=p,
    ).collect()
    urls = {r["url"] for r in out}
    # exact-match-only semantics would return just corona-bill; the synonym
    # table must widen the predicate to the covid urls
    assert "corona-bill" in urls
    assert "covid-news" in urls and "covid-speech" in urls
    # re-scoring applied: rankings of covid urls carry sim**50 weight > 0
    scored = {r["url"]: r["ranking"] for r in out}
    assert scored["covid-news"] > 0


def test_synonym_golden_transcript_order_change(spark, tmp_path, caplog):
    """VERDICT r3 item 5: end-to-end synonym golden against the committed
    50-word word2vec fixture (tests/fixtures/w2v_50words.txt), checking
    ws_pagerank.py:196-225 semantics with hand-computed expected rankings:

      * expansion of "corona" = most_similar top-5, SELF-EXCLUDED —
        [covid 0.8, virus 0.6, <three sim-0.0 fillers>] (cosines exact by
        fixture construction);
      * ranking(url) = pagerank(url) * sum count(word, url) * sim**50 —
        a url matching ONLY the literal query term scores 0 and sinks;
      * so sim**50 rescoring CHANGES the order vs plain PageRank;
      * the result log reproduces the ws transcript SHAPE
        ``rank=i pagerank=<e-notation> url=...``.
    """
    import gzip
    import logging
    import os
    import re

    from oracle import pagerank_by_url

    from web_search_pagerank_project_spark.functions.synonyms import WordVectors
    from web_search_pagerank_project_spark.plans.pipeline import run_pipeline

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "w2v_50words.txt")

    # pinned expansion: exact cosines from the committed fixture
    wv = WordVectors.load(fixture)
    top5 = wv.most_similar("corona", topn=5)
    assert [w for w, _ in top5[:2]] == ["covid", "virus"]
    assert abs(top5[0][1] - 0.8) < 1e-12 and abs(top5[1][1] - 0.6) < 1e-12
    assert all(abs(s) < 1e-12 for _, s in top5[2:])  # orthogonal fillers

    rows = [
        ("badger-den", "corona-hq"),
        ("covid-lab", "corona-hq"),
        ("virus-wire", "corona-hq"),
        ("corona-hq", "covid-lab"),
    ]
    data = str(tmp_path / "edges.csv.gz")
    with gzip.open(data, "wt") as f:
        f.write("source,target\n")
        for s, t in rows:
            f.write(f"{s},{t}\n")

    pr = pagerank_by_url(rows, max_iterations=100, epsilon=1e-6)
    # plain PageRank order among the three matching urls
    plain_order = sorted(
        ["corona-hq", "covid-lab", "virus-wire"], key=lambda u: -pr[u]
    )
    assert plain_order[0] == "corona-hq"  # 3 in-links

    with caplog.at_level(logging.INFO, logger="wspr.engine"):
        out = run_pipeline(
            spark, data=data, search_query="corona",
            max_iterations=100, synonyms_file=fixture,
        ).collect()

    got_order = [r["url"] for r in out]
    scored = {r["url"]: r["ranking"] for r in out}
    # hand-computed: ranking = pr * count * sim**50 (count = 1 everywhere)
    assert np.isclose(scored["covid-lab"], pr["covid-lab"] * 0.8**50, rtol=1e-9)
    assert np.isclose(scored["virus-wire"], pr["virus-wire"] * 0.6**50, rtol=1e-9)
    assert scored["corona-hq"] == 0.0  # literal-term-only match scores 0
    assert got_order == ["covid-lab", "virus-wire", "corona-hq"]
    assert got_order != plain_order  # rescoring changed the order

    lines = [m for m in caplog.messages if m.startswith("rank=")]
    assert len(lines) == 3
    shape = re.compile(r"^rank=\d+ pagerank=\d\.\d{4}e[+-]\d{2} url=\S+$")
    for i, line in enumerate(lines):
        assert shape.match(line), line
        assert line.startswith(f"rank={i} ")
    assert lines[0].endswith("url=covid-lab")


def test_cli_synonyms_glove_slice_transcript(spark, tmp_path, caplog):
    """VERDICT r4 item 7: realistic GloVe-shaped golden through the FULL
    CLI surface. tests/fixtures/glove_slice_50w_25d.txt is a committed
    50-word x 25-dim word2vec-text slice with dense non-orthogonal vectors
    and GloVe-like norms (the 4-dim orthogonal fixture above pins the
    formula; this one pins the loader + expansion + CLI plumbing against
    vectors shaped like the reference's glove-wiki-gigaword download,
    ws_pagerank.py:15-17, 207-214). Expected top-5 is recomputed
    INDEPENDENTLY from the file with plain numpy; the CLI run must
    reproduce the reranked transcript shape and ordering."""
    import gzip
    import logging
    import os
    import re

    from web_search_pagerank_project_spark.functions.synonyms import WordVectors
    from web_search_pagerank_project_spark.plans.cli import main as cli_main

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "glove_slice_50w_25d.txt"
    )

    # independent numpy replay of gensim most_similar over the raw file
    words, rows = [], []
    with open(fixture) as f:
        n, dim = map(int, f.readline().split())
        for line in f:
            parts = line.split()
            words.append(parts[0])
            rows.append(np.asarray(parts[1:], dtype=np.float64))
    assert (n, dim) == (50, 25) and len(words) == 50
    m = np.vstack(rows)
    unit = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = unit @ unit[words.index("corona")]
    order = [i for i in np.argsort(-sims) if words[i] != "corona"]
    expected_top5 = [(words[i], sims[i]) for i in order[:5]]
    assert [w for w, _ in expected_top5[:4]] == [
        "covid", "virus", "pandemic", "vaccine",
    ]

    got_top5 = WordVectors.load(fixture).most_similar("corona", topn=5)
    assert [w for w, _ in got_top5] == [w for w, _ in expected_top5]
    for (gw, gs), (_, es) in zip(got_top5, expected_top5):
        assert gs == pytest.approx(es, abs=1e-12), gw

    # CLI end-to-end: urls named after expansion terms; the literal-only
    # match scores 0 under sim**50 rescoring and sinks below the synonyms
    data = str(tmp_path / "glove_edges.csv.gz")
    with gzip.open(data, "wt") as f:
        f.write("source,target\n")
        for s, t in [
            ("press-desk", "corona-hq"),
            ("covid-lab", "corona-hq"),
            ("virus-wire", "corona-hq"),
            ("corona-hq", "covid-lab"),
            ("covid-lab", "virus-wire"),
        ]:
            f.write(f"{s},{t}\n")
    with caplog.at_level(logging.INFO, logger="wspr.engine"):
        cli_main(
            [
                "--data", data,
                "--search_query", "corona",
                "--synonyms_file", fixture,
                "--max_iterations", "100",
                "--master", "local[4]",
                "--partitions", "4",
            ]
        )
    lines = [msg for msg in caplog.messages if msg.startswith("rank=")]
    assert len(lines) == 3
    shape = re.compile(r"^rank=\d+ pagerank=\d\.\d{4}e[+-]\d{2} url=(\S+)$")
    got_urls = []
    for line in lines:
        mm = shape.match(line)
        assert mm, line
        got_urls.append(mm.group(1))
    # covid (sim ~.92) outranks virus (~.8) under sim**50; corona-hq
    # matches only the literal term -> ranking 0 -> last
    assert got_urls[0] == "covid-lab"
    assert got_urls[1] == "virus-wire"
    assert got_urls[2] == "corona-hq"
