from . import dedup, graph, index, relational, similarity, text, text_quality, timeseries

__all__ = [
    "text",
    "index",
    "graph",
    "timeseries",
    "relational",
    "dedup",
    "similarity",
    "text_quality",
]
