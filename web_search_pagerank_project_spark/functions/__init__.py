from .query import query_predicate, make_personalization_vector, url_satisfies_query_col

__all__ = [
    "query_predicate",
    "make_personalization_vector",
    "url_satisfies_query_col",
]
