"""Proposal base class. Reference: ``nessai/proposal/base.py:17``."""

import datetime
import logging
import os
from abc import ABC, abstractmethod

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["Proposal"]


class Proposal(ABC):
    """Base object for proposals: ``draw(old_point)`` returns a new sample.

    Tracks population wall-time and supports pickling without the model.
    """

    def __init__(self, model, rng=None):
        self.model = model
        self.rng = rng if rng is not None else np.random.default_rng()
        self.populated = True
        self._initialised = False
        self.training_count = 0
        self.population_acceptance = None
        self.population_time = datetime.timedelta()
        self.r = np.nan
        self.samples = []
        self.indices = []
        self._checked_population = True

    @property
    def initialised(self) -> bool:
        return self._initialised

    @initialised.setter
    def initialised(self, boolean: bool):
        self._initialised = bool(boolean)

    def initialise(self) -> None:
        """Initialise the proposal."""
        self.initialised = True

    def update_output(self, output: str) -> None:
        """Update the output directory, if the proposal has one.
        Reference: ``nessai/proposal/base.py:64-80``."""
        if hasattr(self, "output"):
            logger.debug("Updating output directory to %s", output)
            self.output = output
            os.makedirs(self.output, exist_ok=True)
        else:
            logger.debug("No output directory to update")

    def evaluate_likelihoods(self) -> None:
        """Evaluate the likelihoods of the current samples."""
        self.samples["logL"] = self.model.batch_evaluate_log_likelihood(
            self.samples
        )

    @abstractmethod
    def draw(self, old_param):
        raise NotImplementedError

    def train(self, x, **kwargs) -> None:
        logger.debug("This proposal cannot be trained")

    def resume(self, model) -> None:
        """Rebind the model after unpickling."""
        self.model = model

    def reset(self) -> None:
        self.samples = []
        self.indices = []
        self.populated = False
        self._checked_population = True

    def __getstate__(self):
        state = self.__dict__.copy()
        state["model"] = None
        # Device-populate eligibility depends on the bound model's
        # hooks/bounds; a resumed run may rebind a modified model, so
        # the verdict must be re-derived, never pickled.
        state.pop("_device_populate_cached", None)
        # per-populate scratch owned by the current sampler process
        state.pop("_pending_ns_scan", None)
        state.pop("_ns_scan_request", None)
        return state
