"""Base nested sampler: RNG seeding, output management, periodic logging
and checkpointing, pickle-based resume.

Reference: ``nessai/samplers/base.py:24-468``.
"""

import datetime
import logging
import os
import pickle
import random
import time
from abc import ABC, abstractmethod
from typing import Callable, Optional

import numpy as np

from ..utils.io import safe_file_dump

logger = logging.getLogger(__name__)

__all__ = ["BaseNestedSampler"]


class BaseNestedSampler(ABC):
    """Common scaffolding for the standard and importance nested samplers."""

    def __init__(
        self,
        model,
        nlive: int,
        output: Optional[str] = None,
        seed: Optional[int] = None,
        rng: Optional[np.random.Generator] = None,
        checkpointing: bool = True,
        checkpoint_interval: int = 600,
        checkpoint_on_iteration: bool = False,
        checkpoint_callback: Optional[Callable] = None,
        logging_interval: Optional[int] = None,
        log_on_iteration: bool = True,
        resume_file: Optional[str] = None,
        plot: bool = True,
        n_pool: Optional[int] = None,
        pool=None,
    ):
        self.info_enabled = logger.isEnabledFor(logging.INFO)
        self.model = model
        self.nlive = int(nlive)
        self.plot = plot
        self.checkpointing = checkpointing
        self.checkpoint_interval = checkpoint_interval
        self.checkpoint_on_iteration = checkpoint_on_iteration
        self.checkpoint_callback = checkpoint_callback
        self._last_checkpoint_time = time.time()
        self._last_checkpoint_iteration = 0
        self.configure_rng(seed=seed, rng=rng)
        if self.model.rng is None:
            self.model.set_rng(self.rng)
        self.model.verify_model()
        #: Reference ``samplers/base.py:84-96``
        self.n_pool = n_pool
        if pool is not None or n_pool is not None:
            self.model.configure_pool(pool=pool, n_pool=n_pool)

        self.iteration = 0
        self.sampling_start_time = datetime.datetime.now()
        self.sampling_time = datetime.timedelta()
        self.finalised = False
        self.history = None

        self.output = self.configure_output(output, resume_file)
        self.configure_periodic_logging(logging_interval, log_on_iteration)

    # ------------------------------------------------------------------
    def configure_rng(self, seed=None, rng=None) -> None:
        """Seed the host RNG (device PRNG keys are derived from it).

        Reference: ``nessai/samplers/base.py:186-222``.
        """
        if seed is None:
            logger.debug("Seed not specified, generating random seed")
            if rng is None:
                seed = random.randint(0, 2**32 - 1)
            else:
                seed = int(rng.integers(0, 2**32 - 1))
        self.seed = seed
        if rng is None:
            rng = np.random.default_rng(self.seed)
        self.rng = rng

    def configure_output(self, output, resume_file=None) -> str:
        """Reference: ``nessai/samplers/base.py:224``."""
        if output is None:
            output = os.getcwd()
        os.makedirs(output, exist_ok=True)
        if resume_file is None:
            resume_file = os.path.join(output, "nested_sampler_resume.pkl")
        else:
            resume_file = os.path.join(output, resume_file)
        self.resume_file = resume_file
        return output

    def update_output(self, output: str) -> None:
        """Update the output directory and resume-file path. Subclasses
        extend this to relocate proposal/flow outputs. Reference:
        ``nessai/samplers/base.py:174``."""
        self.output = output
        os.makedirs(output, exist_ok=True)
        self.resume_file = os.path.join(
            output, os.path.basename(self.resume_file)
        )

    def configure_periodic_logging(
        self, logging_interval, log_on_iteration
    ) -> None:
        """Configure periodic logging (by iteration count or wall time);
        with both disabled, falls back to logging on iteration every
        ``nlive``. Reference: ``nessai/samplers/base.py:262-287``."""
        self.logging_interval = logging_interval
        self.log_on_iteration = log_on_iteration
        if not self.logging_interval and not self.log_on_iteration:
            logger.warning(
                "All logging disabled. Enabling logging on iteration"
            )
            self.log_on_iteration = True
        if self.log_on_iteration:
            if self.logging_interval is None:
                self.logging_interval = self.nlive
            self._last_log = 0
        else:
            self._last_log = time.time()

    # ------------------------------------------------------------------
    @property
    def current_sampling_time(self):
        if self.finalised:
            return self.sampling_time
        return self.sampling_time + (
            datetime.datetime.now() - self.sampling_start_time
        )

    @property
    def likelihood_evaluation_time(self):
        return self.model.likelihood_evaluation_time

    @property
    def total_likelihood_evaluations(self):
        return self.model.likelihood_evaluations

    @property
    def likelihood_calls(self):
        """Alias of :attr:`total_likelihood_evaluations` (reference
        ``samplers/base.py:139``)."""
        return self.model.likelihood_evaluations

    @property
    def posterior_effective_sample_size(self):
        """Defined by subclasses (reference ``samplers/base.py:144``)."""
        raise NotImplementedError()

    # ------------------------------------------------------------------
    def initialise_history(self) -> None:
        if self.history is None:
            self.history = dict(
                iterations=[],
                sampling_time=[],
                likelihood_evaluations=[],
                checkpoint_iterations=[],
            )

    def update_history(self) -> None:
        self.history["iterations"].append(self.iteration)
        self.history["sampling_time"].append(
            self.current_sampling_time.total_seconds()
        )
        self.history["likelihood_evaluations"].append(
            self.total_likelihood_evaluations
        )

    # ------------------------------------------------------------------
    def periodically_log_state(self) -> None:
        """Log by iteration count or wall time.

        Reference: ``nessai/samplers/base.py:224-273``.
        """
        if self.log_on_iteration:
            if (self.iteration - self._last_log) < self.logging_interval:
                return
            self._last_log = self.iteration
        else:
            now = time.time()
            if (now - self._last_log) < (self.logging_interval or 60):
                return
            self._last_log = now
        self.log_state()

    def log_state(self) -> None:
        logger.info("it: %s", self.iteration)

    # ------------------------------------------------------------------
    def checkpoint(
        self,
        periodic: bool = False,
        force: bool = False,
        save_existing: Optional[bool] = None,
    ) -> None:
        """Pickle the sampler to the resume file (atomic, with ``.old``
        rotation). ``save_existing=False`` overwrites the previous
        checkpoint instead of rotating it to ``.old`` (per-call override
        of ``save_existing_checkpoint``).
        Reference: ``nessai/samplers/base.py:296-349``.
        """
        if not force:
            if not self.checkpointing:
                return
            if periodic and not force:
                if self.checkpoint_on_iteration:
                    due = (
                        self.iteration - self._last_checkpoint_iteration
                    ) >= self.checkpoint_interval
                else:
                    due = (
                        time.time() - self._last_checkpoint_time
                    ) >= self.checkpoint_interval
                if not due:
                    return
        if not periodic:
            # non-periodic (signal/forced) checkpoints are marked on the
            # state plot (reference: ``samplers/base.py:316-323``)
            if self.history is not None:
                self.history.setdefault("checkpoint_iterations", []).append(
                    self.iteration
                )
            else:
                logger.warning(
                    "Could not log checkpoint iteration in the history"
                )
        st = datetime.datetime.now()
        self.sampling_time += st - self.sampling_start_time
        logger.info("Checkpointing nested sampling")
        if self.checkpoint_callback is not None:
            self.checkpoint_callback(self)
        else:
            safe_file_dump(
                self,
                self.resume_file,
                module=pickle,
                save_existing=(
                    save_existing
                    if save_existing is not None
                    else getattr(self, "save_existing_checkpoint", True)
                ),
            )
        self.sampling_start_time = datetime.datetime.now()
        self._last_checkpoint_time = time.time()
        self._last_checkpoint_iteration = self.iteration

    @classmethod
    def resume_from_pickled_sampler(
        cls,
        sampler,
        model,
        output=None,
        checkpoint_callback=None,
        rng=None,
        **kwargs,
    ):
        """Rebind the model (and counters) to an unpickled sampler.

        ``output`` moves the run to a new output directory;
        ``checkpoint_callback`` replaces the checkpointing hook.
        Reference: ``nessai/samplers/base.py:351-396``.
        """
        logger.info("Resuming sampler at iteration %s", sampler.iteration)
        model.likelihood_evaluations += sampler._previous_likelihood_evaluations
        model.likelihood_evaluation_time += datetime.timedelta(
            seconds=sampler._previous_likelihood_evaluation_time
        )
        if output is not None and output != sampler.output:
            logger.info(
                "Overwriting output from %s to %s", sampler.output, output
            )
            os.makedirs(output, exist_ok=True)
            sampler.update_output(output)
        sampler.checkpoint_callback = checkpoint_callback
        sampler.model = model
        if rng is not None:
            sampler.rng = rng
        if sampler.model.rng is None:
            sampler.model.set_rng(sampler.rng)
        sampler.sampling_start_time = datetime.datetime.now()
        return sampler

    @classmethod
    def resume(cls, filename, model, output=None, rng=None, **kwargs):
        """Load a pickled sampler and rebind the model.

        Reference: ``nessai/samplers/base.py:398``.
        """
        logger.info("Resuming sampler from %s", filename)
        with open(filename, "rb") as f:
            sampler = pickle.load(f)
        return cls.resume_from_pickled_sampler(
            sampler, model, output=output, rng=rng, **kwargs
        )

    # ------------------------------------------------------------------
    def close_pool(self, code=None) -> None:
        """Close the model's multiprocessing pool. Reference:
        ``nessai/samplers/base.py:434``."""
        self.model.close_pool(code=code)

    def get_result_dictionary(self) -> dict:
        """Reference: ``nessai/samplers/base.py:438``."""
        from .. import __version__

        d = dict(
            version=__version__,
            seed=self.seed,
            sampling_time=self.sampling_time.total_seconds(),
            total_likelihood_evaluations=self.total_likelihood_evaluations,
            likelihood_evaluation_time=self.likelihood_evaluation_time.total_seconds(),
            history=self.history,
        )
        if hasattr(self.model, "truth"):
            d["truth"] = self.model.truth
        return d

    # ------------------------------------------------------------------
    @abstractmethod
    def nested_sampling_loop(self):
        raise NotImplementedError

    def __getstate__(self):
        """Exclude the model; stash its counters.

        Reference: ``nessai/samplers/base.py:458``.
        """
        d = self.__dict__
        # unlike the reference, proposals stay in the pickle (they carry
        # the flow weights pointer needed by this package's resume path)
        exclude = {"model", "checkpoint_callback"}
        state = {k: d[k] for k in d.keys() - exclude}
        model = d.get("model")
        state["_previous_likelihood_evaluations"] = (
            model.likelihood_evaluations if model else 0
        )
        state["_previous_likelihood_evaluation_time"] = (
            model.likelihood_evaluation_time.total_seconds()
            if model
            else 0.0
        )
        return state
