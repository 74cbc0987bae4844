"""Insertion-index diagnostics. Reference: ``nessai/utils/indices.py``."""

import logging

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["compute_indices_ks_test", "bonferroni_correction"]


def compute_indices_ks_test(indices, nlive: int, mode: str = "D+"):
    """KS test of insertion indices against a uniform distribution on
    ``[0, nlive)``.

    Returns ``(D, p)``. Reference: ``nessai/utils/indices.py:10``.
    """
    indices = np.asarray(indices)
    if not indices.size:
        return None, None
    counts = np.bincount(indices, minlength=nlive)
    ecdf = np.cumsum(counts) / indices.size
    uniform_cdf = np.arange(1, nlive + 1) / nlive
    if mode == "D+":
        D = np.max(uniform_cdf - ecdf)
    elif mode == "D-":
        D = np.max(ecdf - uniform_cdf)
    else:
        raise RuntimeError(f"Invalid mode: {mode}")
    # One-sided KS p-value (asymptotic)
    n = indices.size
    p = np.exp(-2.0 * n * D**2)
    return float(D), float(min(max(p, 0.0), 1.0))


def bonferroni_correction(p_values, alpha: float = 0.05):
    """Bonferroni correction for multiple tests.

    Returns ``(rejected, corrected_p, corrected_alpha)``.
    Reference: ``nessai/utils/indices.py:45``.
    """
    p_values = np.asarray(p_values, dtype=float)
    n = len(p_values)
    corrected_alpha = alpha / n
    corrected_p = np.minimum(p_values * n, 1.0)
    rejected = p_values < corrected_alpha
    return rejected, corrected_p, corrected_alpha
