from .engine import IndexEngine
from .graph import Graph, OverlayLevel
from .knn import exact_knn

__all__ = ["Graph", "IndexEngine", "OverlayLevel", "exact_knn"]
