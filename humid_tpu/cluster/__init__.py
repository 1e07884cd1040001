from .exact import cluster_exact, ClusterResult
from .labelprop import connected_components_device

__all__ = ["cluster_exact", "ClusterResult", "connected_components_device"]
