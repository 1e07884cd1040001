from .mesh import data_mesh, shard_rows, replicate
from .neighbors import sharded_neighbor_pairs
from .labelprop import distributed_components, dedup_step
from .pipeline import run_distributed, run_sharded

__all__ = [
    "data_mesh",
    "shard_rows",
    "replicate",
    "sharded_neighbor_pairs",
    "distributed_components",
    "dedup_step",
    "run_distributed",
    "run_sharded",
]
