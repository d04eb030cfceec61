"""alayalite_tpu — a TPU-native vector database / ANN search engine.

A ground-up JAX/XLA/Pallas re-design with the capabilities of AlayaLite
(graph ANN indices, quantized spaces, batched query engine, client SDK):
distances run as MXU contractions, graph traversal as batched lockstep beam
search, index builds as vectorized rounds, and multi-chip scaling via
jax.sharding meshes.
"""

from .client import Client
from .collection import Collection
from .index_api import Index
from .params import IndexParams, IndexType, MetricType, QuantizationType

__version__ = "0.1.0"

__all__ = [
    "Client",
    "Collection",
    "Index",
    "IndexParams",
    "IndexType",
    "MetricType",
    "QuantizationType",
    "__version__",
]
