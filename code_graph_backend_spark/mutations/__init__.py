from .merge import MergeMetrics, merge_edges, merge_nodes
from .delete import cascade_delete
from .oplog import OpLog

__all__ = ["merge_nodes", "merge_edges", "MergeMetrics", "cascade_delete", "OpLog"]
