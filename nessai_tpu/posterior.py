"""Posterior sample extraction.

Reference: ``nessai/posterior.py`` — trapezoid NS weights incl. the
live-point tail (``compute_weights:17-77``), ``draw_posterior_samples:80``.
"""

import logging

import numpy as np
from scipy.special import logsumexp

from .evidence import log_integrate_log_trap, logsubexp
from .utils.stats import effective_sample_size

logger = logging.getLogger(__name__)

__all__ = ["compute_weights", "draw_posterior_samples"]


def compute_weights(samples, nlive, expectation: str = "logt"):
    """Log posterior weights of a chain of nested samples.

    ``nlive`` may be an int (constant) or an array per sample (e.g.
    decreasing nlive → 1 over the final live points).

    Returns ``(log_z, log_w)``. Reference: ``nessai/posterior.py:17``.
    """
    samples = np.asarray(samples, dtype=float)
    n = len(samples)
    if isinstance(nlive, (int, np.integer, float)):
        # constant nlive, except the final live points which are consumed
        # one by one (nlive, nlive-1, ..., 1) at finalise
        nlive = int(nlive)
        nlive_per_it = np.full(n, float(nlive))
        nlive_per_it[-nlive:] = np.arange(
            min(nlive, n), 0, -1, dtype=float
        )
    else:
        nlive_per_it = np.asarray(nlive, dtype=float)
        if len(nlive_per_it) != n:
            raise ValueError("nlive and samples are different lengths")
    if expectation == "logt":
        log_t = -1.0 / nlive_per_it
    elif expectation == "t":
        log_t = -np.log1p(1.0 / nlive_per_it)
    else:
        raise ValueError(f"Expectation must be t or logt, got: {expectation}")

    # one point at X=1 and one closing point at X=0 with L = max(L)
    log_vols = np.zeros(n + 2)
    log_vols[1:-1] = np.cumsum(log_t)
    log_vols[-1] = -np.inf
    log_likelihoods = np.concatenate([[-np.inf], samples, [samples[-1]]])

    log_z = log_integrate_log_trap(log_likelihoods, log_vols)
    log_w = logsubexp(log_vols[:-1], log_vols[1:])
    log_post_w = log_likelihoods[1:-1] + log_w[:-1] - log_z
    return float(log_z), log_post_w


def draw_posterior_samples(
    nested_samples,
    nlive=None,
    n=None,
    log_w=None,
    method: str = "rejection_sampling",
    return_indices: bool = False,
    expectation: str = "logt",
    rng=None,
):
    """Draw posterior samples from nested samples.

    Reference: ``nessai/posterior.py:80-174``.
    """
    if rng is None:
        rng = np.random.default_rng()
    if log_w is None:
        _, log_w = compute_weights(
            nested_samples["logL"], nlive, expectation=expectation
        )
    if method == "rejection_sampling":
        if n is not None:
            # reference: ``nessai/posterior.py:139-143``
            logger.warning(
                "Number of samples cannot be specified when using "
                "rejection sampling"
            )
        log_w_norm = log_w - np.max(log_w)
        log_u = np.log(rng.random(len(log_w)))
        indices = np.flatnonzero(log_w_norm > log_u)
    elif method in ("importance_sampling", "multinomial_resampling"):
        if n is None:
            n = int(effective_sample_size(log_w))
        p = np.exp(log_w - logsumexp(log_w))
        indices = rng.choice(len(log_w), size=n, replace=True, p=p)
    else:
        raise ValueError(f"Unknown method: {method}")
    samples = nested_samples[indices]
    if return_indices:
        return samples, indices
    return samples
