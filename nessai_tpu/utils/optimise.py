"""Optimisation of INS meta-proposal weights.

Reference: ``nessai/utils/optimise.py:16``.
"""

import logging

import numpy as np
from scipy.optimize import minimize
from scipy.special import logsumexp

logger = logging.getLogger(__name__)

__all__ = ["optimise_meta_proposal_weights"]


def optimise_meta_proposal_weights(
    samples_log_likelihood: np.ndarray,
    log_q: np.ndarray,
    initial_weights: np.ndarray,
    method: str = "SLSQP",
    options: dict = None,
    **kwargs,
):
    """Optimise the mixture weights of the INS meta-proposal by minimising
    the KL divergence between the posterior and the meta-proposal, subject
    to a simplex constraint.

    Parameters
    ----------
    samples_log_likelihood : [n] log-likelihood of each sample
    log_q : [n, n_proposals] per-proposal log densities
    initial_weights : [n_proposals] starting weights (normalised)

    Returns the optimised, normalised weights.
    """
    initial_weights = np.asarray(initial_weights, dtype=float)
    initial_weights = initial_weights / initial_weights.sum()
    log_q = np.asarray(log_q, dtype=float)
    logL = np.asarray(samples_log_likelihood, dtype=float)

    def loss(w):
        w = np.clip(w, 1e-300, None)
        log_Q = logsumexp(log_q, b=w[None, :], axis=1)
        log_w_post = logL - log_Q
        log_w_post -= logsumexp(log_w_post)
        # KL(posterior || meta-proposal) up to a constant
        return float(np.sum(np.exp(log_w_post) * (log_w_post + np.log(len(logL)))))

    constraints = {"type": "eq", "fun": lambda w: w.sum() - 1.0}
    bounds = [(0.0, 1.0)] * len(initial_weights)
    if options is None:
        options = {"maxiter": 200}
    result = minimize(
        loss,
        initial_weights,
        method=method,
        bounds=bounds,
        constraints=constraints,
        options=options,
        **kwargs,
    )
    if not result.success:
        logger.warning("Weight optimisation did not converge: %s", result.message)
    w = np.clip(result.x, 0, None)
    return w / w.sum()
