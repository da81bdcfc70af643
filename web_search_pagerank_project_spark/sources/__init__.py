from .edges import read_edge_csv, read_edge_parquet, edges_from_dataframe

__all__ = ["read_edge_csv", "read_edge_parquet", "edges_from_dataframe"]
