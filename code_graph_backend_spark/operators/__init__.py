from . import aggregates, lookups, neighbors, rangejoin, search, traversal

__all__ = ["lookups", "neighbors", "traversal", "aggregates", "search", "rangejoin"]
