"""Analytic proposal: draw directly from the prior.

Reference: ``nessai/proposal/analytic.py:38-84``.
"""

import datetime
import logging

from .base import Proposal

logger = logging.getLogger(__name__)

__all__ = ["AnalyticProposal"]


class AnalyticProposal(Proposal):
    """Populate a pool with exact prior draws via ``model.new_point``."""

    def __init__(self, *args, poolsize: int = 1000, **kwargs):
        super().__init__(*args, **kwargs)
        self.populated = False
        self._poolsize = int(poolsize)

    @property
    def poolsize(self) -> int:
        return self._poolsize

    def populate(self, N=None) -> None:
        """Reference: ``nessai/proposal/analytic.py:38``."""
        if N is None:
            N = self.poolsize
        st = datetime.datetime.now()
        self.samples = self.model.new_point(N=N)
        self.samples["logP"] = self.model.batch_evaluate_log_prior(
            self.samples
        )
        self.indices = self.rng.permutation(self.samples.size).tolist()
        self.samples["logL"] = self.model.batch_evaluate_log_likelihood(
            self.samples
        )
        self.population_time += datetime.datetime.now() - st
        self.populated = True

    def draw(self, old_sample):
        """Pop one sample from the pool, repopulating when empty.

        Reference: ``nessai/proposal/analytic.py:63``.
        """
        if not self.populated:
            self.populate()
        index = self.indices.pop()
        new_sample = self.samples[index]
        if not self.indices:
            self.populated = False
        return new_sample
