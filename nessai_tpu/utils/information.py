"""Information/entropy helpers. Reference: ``nessai/utils/information.py``."""

import numpy as np

__all__ = ["differential_entropy"]


def differential_entropy(log_p: np.ndarray) -> float:
    """Monte-Carlo differential entropy estimate ``-mean(log p)``.

    Reference: ``nessai/utils/information.py:10``.
    """
    return float(-np.mean(np.asarray(log_p, dtype=float)))
