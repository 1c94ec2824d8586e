from . import lcov, python_analyzer, source_scan

__all__ = ["lcov", "python_analyzer", "source_scan"]
