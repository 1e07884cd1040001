from .unique import unique_words
from .neighbors import find_neighbor_pairs, pairs_to_csr

__all__ = ["unique_words", "find_neighbor_pairs", "pairs_to_csr"]
