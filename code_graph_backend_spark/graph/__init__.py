from .model import EDGES_SCHEMA, NODES_SCHEMA, PropertyGraph

__all__ = ["PropertyGraph", "NODES_SCHEMA", "EDGES_SCHEMA"]
