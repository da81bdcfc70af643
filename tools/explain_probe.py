#!/usr/bin/env python3
"""Print the physical plan of one CSR iteration (lineage cut disabled) to
audit exchanges/stage structure."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import web_search_pagerank_project_spark.operators.csr_kernel as ck
    from web_search_pagerank_project_spark.session import get_spark
    from web_search_pagerank_project_spark.operators.graph_build import build_graph
    from web_search_pagerank_project_spark.sources.synth import synth_edges

    aqe = sys.argv[1] if len(sys.argv) > 1 else "false"
    spark = get_spark(
        app_name="explain-probe", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": aqe},
    )
    edges = synth_edges(spark, n_vertices=2000, n_edges=20000, seed=42, zipf_a=1.5)
    graph = build_graph(edges, cache=True)
    blocks = ck.build_csr_blocks(graph, 16)
    state = ck._make_state(graph, None, 16)

    import pandas as pd
    import numpy as np
    from pyspark.sql import functions as F

    def spmv(key, left, right):
        return pd.DataFrame({"block_out": pd.Series([], dtype="int32"),
                             "dst_pos": pd.Series([], dtype=object),
                             "contribs": pd.Series([], dtype=object)})

    def merge(key, left, right):
        return pd.DataFrame({"block": [0], "xs": [np.zeros(1)], "v": [None],
                             "dang_idx": [np.array([], np.int32)],
                             "res_sq": [0.0], "dang_sum": [0.0]})

    partials = (
        blocks.groupBy("block").cogroup(state.groupBy("block"))
        .applyInPandas(spmv, ck._PARTIAL_SCHEMA)
    )
    st = (
        state.groupBy("block").cogroup(partials.groupBy("block_out"))
        .applyInPandas(merge, ck._STATE_SCHEMA)
    )
    agg = st.agg(F.sqrt(F.sum("res_sq")).alias("r"), F.sum("dang_sum").alias("d"))
    agg.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
