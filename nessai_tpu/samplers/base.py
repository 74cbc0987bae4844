"""Base nested sampler: RNG seeding, output management, periodic logging
and checkpointing, pickle-based resume.

Reference: ``nessai/samplers/base.py:24-468``.
"""

import datetime
import logging
import os
import pickle
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
        self.logging_interval = logging_interval
        self.log_on_iteration = log_on_iteration
        self._last_log_time = time.time()
        self._last_log_iteration = 0

        self.configure_rng(seed=seed, rng=rng)
        if self.model.rng is None:
            self.model.set_rng(self.rng)
        self.model.verify_model()

        self.iteration = 0
        self.sampling_start_time = datetime.datetime.now()
        self.sampling_time = datetime.timedelta()
        self.finalised = False
        self.history = None

        self.output = self.configure_output(output, resume_file)

    # ------------------------------------------------------------------
    def configure_rng(self, seed=None, rng=None) -> None:
        """Seed the host RNG (device PRNG keys are derived from it).

        Reference: ``nessai/samplers/base.py:186-222``.
        """
        if rng is not None:
            self.rng = rng
            self.seed = seed
        else:
            if seed is None:
                seed = int.from_bytes(os.urandom(4), "little")
            self.seed = seed
            self.rng = np.random.default_rng(seed)

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

    # ------------------------------------------------------------------
    @property
    def current_sampling_time(self):
        return self.sampling_time + (
            datetime.datetime.now() - self.sampling_start_time
        )

    @property
    def likelihood_evaluation_time(self):
        return self.model.likelihood_evaluation_time

    @property
    def total_likelihood_evaluations(self):
        return self.model.likelihood_evaluations

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
        if not self.info_enabled:
            return
        if self.log_on_iteration:
            interval = self.logging_interval or self.nlive
            if (self.iteration - self._last_log_iteration) >= interval:
                self.log_state()
                self._last_log_iteration = self.iteration
        else:
            interval = self.logging_interval or 60
            if (time.time() - self._last_log_time) >= interval:
                self.log_state()
                self._last_log_time = time.time()

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
        return dict(
            seed=self.seed,
            sampling_time=self.sampling_time.total_seconds(),
            total_likelihood_evaluations=self.total_likelihood_evaluations,
            likelihood_evaluation_time=self.likelihood_evaluation_time.total_seconds(),
            history=self.history,
        )

    # ------------------------------------------------------------------
    @abstractmethod
    def nested_sampling_loop(self):
        raise NotImplementedError

    def __getstate__(self):
        """Exclude the model; stash its counters.

        Reference: ``nessai/samplers/base.py:458``.
        """
        d = self.__dict__.copy()
        d["_previous_likelihood_evaluations"] = (
            self.model.likelihood_evaluations if self.model else 0
        )
        d["_previous_likelihood_evaluation_time"] = (
            self.model.likelihood_evaluation_time.total_seconds()
            if self.model
            else 0.0
        )
        d["model"] = None
        d["checkpoint_callback"] = None
        return d
