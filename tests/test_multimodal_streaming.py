"""Multimodal plumbing (stubbed codecs) + structured-streaming smoke tests."""

import os
import time

import pytest
from pyspark.sql import functions as F

from web_search_pagerank_project_spark.functions.multimodal import (
    audio_window_energy_stub,
    frame_sample,
    image_features,
    synth_media,
)


def test_image_features_plumbing(spark):
    media = synth_media(spark, n=30)
    feats = image_features(media, feature_dim=8)
    rows = feats.collect()
    assert len(rows) == 10  # every 3rd row is an image
    for r in rows:
        assert len(r["features"]) == 8
        assert r["width"] >= 1 and r["height"] >= 1
    # determinism: second run bit-identical
    again = {r["media_id"]: r["features"] for r in image_features(media, 8).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_image_features_strict_marks_codec_boundary(spark):
    media = synth_media(spark, n=6)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        image_features(media, strict=True).collect()


def test_frame_sample_grid(spark):
    media = synth_media(spark, n=30)
    frames = frame_sample(media, every_ms=1000)
    per_vid = (
        frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    )
    durs = {r["media_id"]: r["duration_ms"] for r in media.filter(F.col("kind") == "video").collect()}
    for r in per_vid:
        expected = (durs[r["media_id"]] - 1) // 1000 + 1
        assert r["n"] == expected


def test_audio_energy_stub(spark):
    media = synth_media(spark, n=30)
    en = audio_window_energy_stub(media, window_ms=500)
    rows = en.collect()
    assert rows and all(0.0 <= r["energy"] <= 1.0 for r in rows)


def test_streaming_edge_ingest(spark, tmp_path):
    from web_search_pagerank_project_spark.streaming.ingest import (
        sink_to_parquet,
        stream_edges_from_csv,
    )

    landing = tmp_path / "landing"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    landing.mkdir()
    (landing / "batch1.csv").write_text(
        "source,target,ts\na,b,2024-01-01T00:00:00\nb,c,2024-01-01T00:01:00\n"
    )
    edges = stream_edges_from_csv(spark, str(landing))
    assert edges.isStreaming
    q = sink_to_parquet(edges, str(out), str(ck))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(out))
    assert got.count() == 2
    assert {r["src"] for r in got.collect()} == {"a", "b"}


def test_streaming_degree_counts(spark, tmp_path):
    from web_search_pagerank_project_spark.streaming.ingest import (
        stream_edges_from_csv,
        streaming_degree_counts,
    )

    landing = tmp_path / "landing2"
    landing.mkdir()
    rows = ["source,target,ts"]
    for i in range(10):
        rows.append(f"u{i},hub,2024-01-01T00:0{i % 10}:00")
    (landing / "b.csv").write_text("\n".join(rows) + "\n")
    edges = stream_edges_from_csv(spark, str(landing))
    agg = streaming_degree_counts(edges, window="10 minutes", slide="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("deg_counts")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from deg_counts").collect()
    # watermark append-mode may hold the open window; accept either emitted
    # rows or (valid) empty set, but the query must run without error
    assert isinstance(got, list)


def test_streaming_to_batch_graph_bridge(spark, tmp_path):
    """Round-5 item 5: the streaming surface pinned to the BATCH numeric
    contract — edges ingested through readStream -> exactly-once parquet
    sink must build the same graph and produce the same PageRank scores as
    the batch path fed the identical edge rows. Two landing files exercise
    multi-batch file discovery; scores compare at 1e-12 (same engine, same
    float path, only the ingest route differs)."""
    from web_search_pagerank_project_spark import build_graph, pagerank
    from web_search_pagerank_project_spark.streaming.ingest import (
        sink_to_parquet,
        stream_edges_from_csv,
    )

    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b"), ("a", "b"), ("d", "a")]
    landing = tmp_path / "landing_bridge"
    landing.mkdir()
    (landing / "crawl1.csv").write_text(
        "source,target,ts\n"
        + "".join(f"{s},{t},2024-01-01T00:00:00\n" for s, t in rows[:3])
    )
    (landing / "crawl2.csv").write_text(
        "source,target,ts\n"
        + "".join(f"{s},{t},2024-01-01T00:05:00\n" for s, t in rows[3:])
    )

    out, ck = tmp_path / "bridge_out", tmp_path / "bridge_ck"
    q = sink_to_parquet(
        stream_edges_from_csv(spark, str(landing)), str(out), str(ck)
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = spark.read.parquet(str(out)).select("src", "dst")
    assert streamed.count() == len(rows)

    g_stream = build_graph(streamed, cache=True)
    g_batch = build_graph(
        spark.createDataFrame(rows, "src string, dst string"), cache=True
    )
    r_stream = pagerank(g_stream, max_iterations=3, epsilon=0.0)
    r_batch = pagerank(g_batch, max_iterations=3, epsilon=0.0)
    by_url_s = {r["url"]: r["rank"] for r in r_stream.by_url(g_stream).collect()}
    by_url_b = {r["url"]: r["rank"] for r in r_batch.by_url(g_batch).collect()}
    assert by_url_s.keys() == by_url_b.keys()
    for u in by_url_b:
        assert by_url_s[u] == pytest.approx(by_url_b[u], abs=1e-12), u
    g_stream.unpersist()
    g_batch.unpersist()
