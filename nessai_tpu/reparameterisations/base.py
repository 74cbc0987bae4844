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
    input_parameters : str or list
        Names of the parameters required in the forward direction.
    output_parameters : str or list, optional
        Names of the parameters produced in the prime space. Defaults to
        the input parameters with ``_prime`` appended.
    persistent_parameters : str or list, optional
        Subset of ``input_parameters`` that should remain exposed in the
        flow-facing parameter set after this reparameterisation.
    auxiliary_parameters : str or list, optional
        Extra x-space fields this reparameterisation creates (e.g. a
        sampled auxiliary radius); added to the x dtype by the proposal.
    prior_bounds : list, dict or None
        Prior bounds for the parameter(s).
    rng : numpy Generator, optional
    inverse_input_parameters : str or list, optional
        Parameters required for the inverse reparameterisation.
    parameters : str or list, optional
        Alias for ``input_parameters``.
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
    #: Set if the reparameterisation contributes a log-prior term
    has_prior = False
    #: Set if update_bounds/update is required before use
    requires_bounded_prior = False
    _update = False
    prior_bounds = None

    def __init__(
        self,
        input_parameters=None,
        output_parameters=None,
        persistent_parameters=None,
        auxiliary_parameters=None,
        prior_bounds=None,
        rng=None,
        inverse_input_parameters=None,
        parameters=None,
    ):
        self.rng = rng if rng is not None else np.random.default_rng()
        if parameters is not None and input_parameters is not None:
            if self._format_parameters(parameters) != self._format_parameters(
                input_parameters
            ):
                raise RuntimeError(
                    "Received conflicting values for `parameters` and "
                    "`input_parameters`."
                )
        if input_parameters is None:
            input_parameters = parameters
        if input_parameters is None:
            raise RuntimeError("Must specify parameters")
        if not isinstance(input_parameters, (str, list)):
            raise TypeError("Parameters must be a str or list.")
        self.input_parameters = self._format_parameters(input_parameters)
        if not all(isinstance(p, str) for p in self.input_parameters):
            raise TypeError("Parameters must be a str or list of str")

        if isinstance(prior_bounds, (list, tuple, np.ndarray)):
            if len(prior_bounds) == 2:
                prior_bounds = {
                    self.input_parameters[0]: np.asarray(prior_bounds)
                }
            else:
                raise RuntimeError("Prior bounds got a list of len > 2")
        elif prior_bounds is None:
            if self.requires_bounded_prior:
                raise RuntimeError(
                    f"Reparameterisation {self.name} requires prior bounds!"
                )
            self.prior_bounds = None
        elif not isinstance(prior_bounds, dict):
            raise TypeError(
                "Prior bounds must be a dict, tuple, list or numpy array"
                " of len 2 or None."
            )

        if prior_bounds is not None:
            missing_bounds = set(self.input_parameters) - set(
                prior_bounds.keys()
            )
            if missing_bounds and self.requires_bounded_prior:
                raise RuntimeError(
                    "Mismatch between parameters and prior bounds: "
                    f"{set(self.input_parameters)}, "
                    f"{set(prior_bounds.keys())}"
                )
            self.prior_bounds = {
                p: np.asarray(b, dtype=float) for p, b in prior_bounds.items()
            }
            if missing_bounds:
                logger.debug(
                    "Missing prior bounds for parameters %s in %s",
                    sorted(missing_bounds),
                    self.name,
                )
        else:
            logger.debug("No prior bounds for %s", self.name)

        if self.requires_bounded_prior:
            is_finite = np.isfinite(
                [pb for pb in self.prior_bounds.values()]
            ).all()
            if not is_finite:
                raise RuntimeError(
                    f"Reparameterisation {self.name} requires finite prior "
                    f"bounds. Received: {self.prior_bounds}"
                )

        self.output_parameters = self._format_parameters(
            output_parameters
        ) or [f"{p}_prime" for p in self.input_parameters]
        self.persistent_parameters = self._format_parameters(
            persistent_parameters
        )
        if not set(self.persistent_parameters).issubset(
            self.input_parameters
        ):
            raise RuntimeError(
                "Persistent parameters must be a subset of the input "
                f"parameters. Received {self.persistent_parameters} for "
                f"{self.input_parameters}."
            )
        self.auxiliary_parameters = self._format_parameters(
            auxiliary_parameters
        )
        self.inverse_input_parameters = self._format_parameters(
            inverse_input_parameters
        )
        self._x_input_parameters = []
        self._x_prime_input_parameters = []
        self._x_persistent_parameters = []
        self._x_prime_persistent_parameters = []
        self._x_inverse_input_parameters = []
        self._x_prime_inverse_input_parameters = []
        self._resolved_forward_inputs = False
        self._resolved_inverse_inputs = False

    @staticmethod
    def _format_parameters(parameters):
        """Format the parameters to be a list of strings."""
        if isinstance(parameters, str):
            return [parameters]
        elif isinstance(parameters, list):
            return parameters.copy()
        elif parameters is None:
            return []
        else:
            raise TypeError(
                "Parameters must be a string or a list of strings."
            )

    # ------------------------------------------------------------------
    # Parameter-space plumbing (reference ``base.py:174-294``)
    # ------------------------------------------------------------------
    @property
    def input_parameters(self):
        return self._input_parameters

    @input_parameters.setter
    def input_parameters(self, value):
        self._input_parameters = self._format_parameters(value)
        self._resolved_forward_inputs = False
        self._resolved_inverse_inputs = False

    @property
    def parameters(self):
        """Compatibility alias for ``input_parameters``."""
        return self.input_parameters

    @parameters.setter
    def parameters(self, value):
        self.input_parameters = value

    @property
    def prime_parameters(self):
        """Compatibility alias for ``output_parameters``."""
        return self.output_parameters

    @prime_parameters.setter
    def prime_parameters(self, value):
        self.output_parameters = self._format_parameters(value)

    @property
    def x_input_parameters(self):
        """Resolved x-space forward inputs."""
        if self._resolved_forward_inputs:
            return self._x_input_parameters.copy()
        return self.input_parameters.copy()

    @property
    def x_prime_input_parameters(self):
        """Resolved x'-space forward inputs."""
        return self._x_prime_input_parameters.copy()

    @property
    def prime_input_parameters(self):
        """Compatibility alias for ``x_prime_input_parameters``."""
        return self.x_prime_input_parameters

    @property
    def x_output_parameters(self):
        """All x-space parameters available after this
        reparameterisation."""
        return list(
            dict.fromkeys(
                self.x_input_parameters + self.auxiliary_parameters
            )
        )

    @property
    def x_persistent_parameters(self):
        """Resolved persistent x-space inputs."""
        return self._x_persistent_parameters.copy()

    @property
    def x_prime_persistent_parameters(self):
        """Resolved persistent x'-space inputs."""
        return self._x_prime_persistent_parameters.copy()

    @property
    def x_inverse_input_parameters(self):
        """Resolved x-space inverse inputs."""
        return self._x_inverse_input_parameters.copy()

    @property
    def x_prime_inverse_input_parameters(self):
        """Resolved x'-space inverse inputs."""
        return self._x_prime_inverse_input_parameters.copy()

    def resolve_forward_input_spaces(
        self, available_parameters, available_prime_parameters
    ):
        """Resolve forward inputs against the x and prime namespaces.

        Returns the list of input parameters found in neither space.
        Reference: ``base.py:242-274``."""
        x_inputs = []
        prime_inputs = []
        missing = []
        for parameter in self.input_parameters:
            if parameter in available_parameters:
                x_inputs.append(parameter)
            elif parameter in available_prime_parameters:
                prime_inputs.append(parameter)
            else:
                missing.append(parameter)

        self._x_input_parameters = x_inputs
        self._x_prime_input_parameters = prime_inputs
        self._x_persistent_parameters = [
            p for p in self.persistent_parameters if p in x_inputs
        ]
        self._x_prime_persistent_parameters = [
            p for p in self.persistent_parameters if p in prime_inputs
        ]
        self._resolved_forward_inputs = True
        return missing

    def resolve_inverse_input_spaces(
        self, available_parameters, available_prime_parameters
    ):
        """Resolve inverse inputs against the x and prime namespaces.

        Returns the list of inverse input parameters found in neither
        space. Reference: ``base.py:276-294``."""
        x_inputs = []
        x_prime_inputs = []
        missing = []
        for parameter in self.inverse_input_parameters:
            if parameter in available_parameters:
                x_inputs.append(parameter)
            elif parameter in available_prime_parameters:
                x_prime_inputs.append(parameter)
            else:
                missing.append(parameter)

        self._x_inverse_input_parameters = x_inputs
        self._x_prime_inverse_input_parameters = x_prime_inputs
        self._resolved_inverse_inputs = True
        return missing

    def get_parameter_value(self, parameter, x, x_prime=None):
        """Read a parameter from whichever space defines it.

        Routes to x' for resolved prime-space inputs (reference
        ``base.py:296-312``); otherwise falls back to dtype membership
        so auxiliary parameters living in either array resolve."""
        x_prime_inputs = getattr(self, "_x_prime_input_parameters", [])
        if not isinstance(x_prime_inputs, (list, tuple, set)):
            x_prime_inputs = []
        if parameter in x_prime_inputs:
            if x_prime is None:
                raise RuntimeError(
                    f"Prime-space input `{parameter}` requested for "
                    f"{self.name} but no x_prime array was provided."
                )
            return np.asarray(x_prime[parameter], dtype=float)
        if (
            x_prime is not None
            and (x.dtype.names is None or parameter not in x.dtype.names)
        ):
            return np.asarray(x_prime[parameter], dtype=float)
        return np.asarray(x[parameter], dtype=float)

    def set_parameter_value(self, parameter, value, x, x_prime=None):
        """Write a parameter into whichever space defines it.

        Reference: ``base.py:314-332``."""
        x_prime_inputs = getattr(self, "_x_prime_input_parameters", [])
        if not isinstance(x_prime_inputs, (list, tuple, set)):
            x_prime_inputs = []
        if parameter in x_prime_inputs:
            if x_prime is None:
                raise RuntimeError(
                    f"Prime-space input `{parameter}` requested for "
                    f"{self.name} but no x_prime array was provided."
                )
            x_prime[parameter] = value
        elif x.dtype.names and parameter in x.dtype.names:
            x[parameter] = value
        else:
            x_prime[parameter] = value
        return x, x_prime

    @property
    def name(self) -> str:
        return (
            type(self).__name__.lower()
            + "_"
            + "_".join(self.input_parameters)
        )

    def reparameterise(self, x, x_prime, log_j, **kwargs):
        """Apply x -> x'. Must be implemented by subclasses."""
        raise NotImplementedError

    def inverse_reparameterise(self, x, x_prime, log_j, **kwargs):
        """Apply x' -> x. Must be implemented by subclasses."""
        raise NotImplementedError

    def update(self, x, x_prime=None) -> None:
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
