"""Nearest-neighbour distances for adaptive training noise.

Reference: ``nessai/utils/distance.py``.
"""

import numpy as np

__all__ = ["compute_minimum_distances"]


def compute_minimum_distances(samples: np.ndarray, metric: str = "euclidean"):
    """Distance to the nearest other sample for each sample.

    Reference: ``nessai/utils/distance.py:10``.
    """
    from scipy.spatial.distance import cdist

    d = cdist(samples, samples, metric)
    np.fill_diagonal(d, np.inf)
    return d.min(axis=1)
