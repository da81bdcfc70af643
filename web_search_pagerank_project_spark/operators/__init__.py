from .graph_build import GraphTables, build_graph
from .pagerank import pagerank, PageRankResult
from .components import connected_components
from .hits import hits, HitsResult
from .kcore import k_core
from .labelprop import label_propagation
from .triangles import triangle_count

__all__ = [
    "GraphTables",
    "build_graph",
    "pagerank",
    "PageRankResult",
    "hits",
    "HitsResult",
    "connected_components",
    "k_core",
    "label_propagation",
    "triangle_count",
]
