from .api import CodeGraphService

__all__ = ["CodeGraphService"]
