from .pipeline import search, run_pipeline

__all__ = ["search", "run_pipeline"]
