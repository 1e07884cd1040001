from .exact import cluster_exact, cluster_max_from_components, ClusterResult
from .labelprop import connected_components_device

__all__ = ["cluster_exact", "cluster_max_from_components",
           "ClusterResult", "connected_components_device"]
