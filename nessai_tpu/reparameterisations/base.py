"""Reparameterisation base class.

Reference: ``nessai/reparameterisations/base.py:15``. Reparameterisations
are host-side bijections x ↔ x' applied to structured live points before
the (device-side) flow; signature
``reparameterise(x, x_prime, log_j) -> (x, x_prime, log_j)``.
"""

import logging
from typing import List

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["Reparameterisation"]


class Reparameterisation:
    """Base reparameterisation.

    Parameters
    ----------
    parameters : name or list of names of the x-space parameters handled.
    prior_bounds : dict of [min, max] per parameter.
    rng : numpy Generator.
    """

    #: One x parameter maps to exactly one x' parameter.
    one_to_one = True
    #: Parameters (in either space) that must exist before this
    #: reparameterisation's inverse can run.
    requires: List[str] = []
    #: Whether this reparameterisation requires prior bounds
    requires_prior_bounds = False
    #: Set if the reparameterisation defines a prior on x' space
    has_prime_prior = False
    #: Set if update_bounds/update is required before use
    requires_bounded_prior = False

    def __init__(self, parameters=None, prior_bounds=None, rng=None):
        if parameters is None:
            raise RuntimeError("Must specify parameters")
        if isinstance(parameters, str):
            parameters = [parameters]
        if not all(isinstance(p, str) for p in parameters):
            raise TypeError("Parameters must be a str or list of str")
        self.parameters = list(parameters)
        self.prime_parameters = [p + "_prime" for p in self.parameters]
        #: Extra x-space fields this reparameterisation creates (e.g. a
        #: sampled auxiliary radius); added to the x dtype by the proposal.
        self.auxiliary_parameters: List[str] = []
        self.rng = rng if rng is not None else np.random.default_rng()

        if prior_bounds is not None:
            if isinstance(prior_bounds, (list, tuple, np.ndarray)):
                if len(self.parameters) != 1:
                    raise RuntimeError(
                        "Prior bounds must be a dict for multiple parameters"
                    )
                prior_bounds = {self.parameters[0]: np.asarray(prior_bounds)}
            missing = set(self.parameters) - set(prior_bounds.keys())
            if missing:
                raise RuntimeError(f"Mismatched prior bounds: {missing}")
            self.prior_bounds = {
                p: np.asarray(prior_bounds[p]).astype(float)
                for p in self.parameters
            }
        else:
            if self.requires_bounded_prior:
                raise RuntimeError(
                    f"{type(self).__name__} requires prior bounds"
                )
            self.prior_bounds = None

    @staticmethod
    def get_parameter_value(name, x, x_prime):
        """Read a parameter from whichever space defines it.

        Reference: ``nessai/reparameterisations/base.py:296``."""
        if x.dtype.names and name in x.dtype.names:
            return np.asarray(x[name], dtype=float)
        return np.asarray(x_prime[name], dtype=float)

    @staticmethod
    def set_parameter_value(name, value, x, x_prime):
        """Write a parameter into whichever space defines it."""
        if x.dtype.names and name in x.dtype.names:
            x[name] = value
        else:
            x_prime[name] = value
        return x, x_prime

    @property
    def name(self) -> str:
        return (
            type(self).__name__.lower() + "_" + "_".join(self.parameters)
        )

    def reparameterise(self, x, x_prime, log_j, **kwargs):
        """Apply x -> x'. Must be implemented by subclasses."""
        raise NotImplementedError

    def inverse_reparameterise(self, x, x_prime, log_j, **kwargs):
        """Apply x' -> x. Must be implemented by subclasses."""
        raise NotImplementedError

    def update(self, x) -> None:
        """Update internal state (e.g. running bounds) from training data."""

    def reset(self) -> None:
        """Reset any data-driven state."""

    def update_bounds(self, x) -> None:
        """Alias kept for parity with the reference API."""

    def jax_inverse(self):
        """Jittable device-side inverse x' -> x, or None if unsupported.

        Returns ``(fn, fingerprint)`` where
        ``fn(cols: dict[str, jnp.ndarray], c) -> (updates, log_j)``:
        ``cols`` maps parameter names (prime space, plus any x-space
        parameters written by reparameterisations applied earlier in the
        inverse order) to ``[n]`` arrays; ``updates`` are the x-space
        columns this reparameterisation produces and ``log_j`` its
        ``log|dx/dx'|`` contribution. ``c`` is the pytree returned by
        :meth:`jax_inverse_consts` — ALL runtime numbers (bounds, scales,
        detected edges) must flow through it so the traced program stays
        valid across :meth:`update` calls; ``fingerprint`` must cover all
        static structure baked into the trace (parameter names, chosen
        branches, named rescaling functions).

        Enables the fused single-program populate path
        (``proposal/flowproposal/flowproposal.py``); reparameterisations
        that return None fall back to the host-side inverse.
        """
        return None

    def jax_inverse_consts(self):
        """Current runtime values for :meth:`jax_inverse` (re-fetched on
        every device call, so data-driven updates need no recompile)."""
        return ()

    def jax_log_prior_fn(self):
        """Jittable counterpart of :meth:`log_prior` (auxiliary-parameter
        prior terms), or None if unsupported. Returns
        ``(fn, fingerprint)`` with ``fn(cols) -> log_p`` reading x-space
        columns. Only consulted when :attr:`has_prior` is set; used by
        the single-dispatch device populate loop."""
        return None

    def x_prime_log_prior(self, x_prime):
        """Log-prior defined directly in the prime space (optional)."""
        raise RuntimeError(
            f"{type(self).__name__} does not have a prime prior"
        )

    def log_prior(self, x):
        """Additional log-prior contribution from auxiliary parameters."""
        return 0.0

    def __str__(self):
        return f"{type(self).__name__}({self.parameters})"
