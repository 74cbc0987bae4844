"""Rejection proposal: uninformed bootstrap proposal with vectorised
rejection sampling. Reference: ``nessai/proposal/rejection.py:91-120``.
"""

import datetime
import logging

import numpy as np

from .analytic import AnalyticProposal

logger = logging.getLogger(__name__)

__all__ = ["RejectionProposal"]


class RejectionProposal(AnalyticProposal):
    """Draw from ``model.new_point`` and reject against the prior so the
    pool is exactly prior-distributed."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._checked_population = True
        self.population_acceptance = None

    def draw_proposal(self, N=None):
        """Draw ``N`` (default ``poolsize``) points from the proposal
        (``model.new_point``). Reference:
        ``nessai/proposal/rejection.py:29-45``."""
        if N is None:
            N = self.poolsize
        return self.model.new_point(N=N)

    def log_proposal(self, x):
        """Log proposal probability (``model.new_point_log_prob``).
        Reference: ``nessai/proposal/rejection.py:47-62``."""
        return self.model.new_point_log_prob(x)

    def compute_weights(self, x, return_log_prior=False):
        """logW = logP - logQ where logQ is the proposal density of
        ``new_point``. Reference: ``nessai/proposal/rejection.py:64``."""
        x["logP"] = self.model.batch_evaluate_log_prior(x)
        log_q = self.log_proposal(x)
        log_w = x["logP"] - log_q
        if return_log_prior:
            return log_w, x["logP"]
        return log_w

    def populate(self, N=None) -> None:
        """Vectorised rejection sampling. Reference:
        ``nessai/proposal/rejection.py:91``."""
        if N is None:
            N = self.poolsize
        st = datetime.datetime.now()
        x = self.draw_proposal(N=N)
        log_w = self.compute_weights(x)
        log_w = log_w - np.nanmax(log_w)
        log_u = np.log(self.rng.random(N))
        indices = np.flatnonzero(log_w > log_u)
        self.samples = x[indices]
        self.population_acceptance = self.samples.size / N
        self.indices = self.rng.permutation(self.samples.size).tolist()
        self.samples["logL"] = self.model.batch_evaluate_log_likelihood(
            self.samples
        )
        self.population_time += datetime.datetime.now() - st
        self.populated = True
        self._checked_population = False
