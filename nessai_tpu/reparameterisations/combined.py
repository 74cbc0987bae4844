"""Combined reparameterisation: ordered application of multiple
reparameterisations. Reference:
``nessai/reparameterisations/combined.py:22``.
"""

import logging

from ..utils.sorting import sort_reparameterisations
from .base import Reparameterisation

logger = logging.getLogger(__name__)

__all__ = ["CombinedReparameterisation"]


class CombinedReparameterisation(dict):
    """Ordered dict of reparameterisations, applied in dependency order.

    Forward applies in insertion/topological order; inverse applies in
    reverse order. Reference: ``nessai/reparameterisations/combined.py``.
    """

    def __init__(
        self,
        reparameterisations=None,
        reverse_order: bool = False,
        initial_parameters=None,
    ):
        super().__init__()
        self.reverse_order = reverse_order
        self.parameters = []
        self.prime_parameters = []
        #: Parameters available before any reparameterisation runs
        #: (reference ``combined.py:40,48-50``) — lets chained stages
        #: consume model parameters no stage produces.
        self.initial_parameters = (
            list(initial_parameters) if initial_parameters is not None else []
        )
        if reparameterisations is not None:
            self.add_reparameterisations(reparameterisations)

    @property
    def has_prime_prior(self) -> bool:
        return all(r.has_prime_prior for r in self.values())

    @property
    def auxiliary_parameters(self):
        out = []
        for r in self.values():
            out += list(getattr(r, "auxiliary_parameters", []))
        return out

    @property
    def one_to_one(self) -> bool:
        return all(r.one_to_one for r in self.values())

    def _order(self):
        order = list(self.values())
        return list(reversed(order)) if self.reverse_order else order

    @property
    def to_prime_order(self):
        """Application order to the prime space. Reference:
        ``nessai/reparameterisations/combined.py:59``."""
        return [r.name for r in self._order()]

    @property
    def from_prime_order(self):
        """Application order from the prime space. Reference:
        ``nessai/reparameterisations/combined.py:67``."""
        return [r.name for r in reversed(self._order())]

    def add_reparameterisation(self, reparameterisation):
        if isinstance(reparameterisation, Reparameterisation):
            reparameterisation = [reparameterisation]
        self.add_reparameterisations(reparameterisation)

    def add_reparameterisations(self, reparameterisations):
        if isinstance(reparameterisations, Reparameterisation):
            reparameterisations = [reparameterisations]
        ordered = sort_reparameterisations(
            list(reparameterisations),
            existing_parameters=(
                getattr(self, "initial_parameters", []) + self.parameters
            ),
            existing_prime_parameters=self.prime_parameters,
        )
        for r in ordered:
            self[r.name] = r
            self.parameters += [p for p in r.parameters if p not in self.parameters]
            self.prime_parameters += [
                p for p in r.prime_parameters if p not in self.prime_parameters
            ]
        self.check_order()

    def check_order(self) -> None:
        """Verify every reparameterisation's requirements are met by the
        time it runs. Reference: ``combined.py:128``."""
        produced = (
            list(getattr(self, "initial_parameters", []))
            + list(self.parameters)
            + list(self.prime_parameters)
        )
        for r in self._order():
            missing = [q for q in (r.requires or []) if q not in produced]
            if missing:
                raise RuntimeError(
                    f"{r.name} requires {missing} which are not available"
                )

    def reparameterise(self, x, x_prime, log_j, **kwargs):
        for r in self._order():
            x, x_prime, log_j = r.reparameterise(x, x_prime, log_j, **kwargs)
        return x, x_prime, log_j

    def inverse_reparameterise(self, x, x_prime, log_j, **kwargs):
        for r in reversed(self._order()):
            x, x_prime, log_j = r.inverse_reparameterise(
                x, x_prime, log_j, **kwargs
            )
        return x, x_prime, log_j

    def jax_inverse(self):
        """Compose the children's jittable inverses in the same order as
        :meth:`inverse_reparameterise`; None if any child lacks one."""
        order = list(reversed(self._order()))
        parts = []
        for r in order:
            built = r.jax_inverse()
            if built is None:
                return None
            parts.append(built)
        fns = tuple(f for f, _ in parts)
        fingerprint = ("combined",) + tuple(fp for _, fp in parts)

        def fn(cols, consts):
            log_j = 0.0
            for f, c in zip(fns, consts):
                updates, lj = f(cols, c)
                cols = {**cols, **updates}
                log_j = log_j + lj
            return cols, log_j

        return fn, fingerprint

    def jax_inverse_consts(self):
        return tuple(
            r.jax_inverse_consts() for r in reversed(self._order())
        )

    def jax_log_prior_fn(self):
        """Composed jittable auxiliary priors; None if any child with a
        prior lacks a device form. Children without priors contribute
        nothing (mirrors :meth:`log_prior`)."""
        parts = []
        fps = []
        for r in self.values():
            if not getattr(r, "has_prior", False):
                continue
            built = r.jax_log_prior_fn()
            if built is None:
                return None
            parts.append(built[0])
            fps.append(built[1])
        if not parts:
            return (lambda cols: 0.0), ("no-aux-priors",)

        def fn(cols):
            log_p = 0.0
            for p in parts:
                log_p = log_p + p(cols)
            return log_p

        return fn, tuple(fps)

    def update(self, x) -> None:
        """Reference: ``combined.py:219``."""
        for r in self.values():
            r.update(x)

    update_bounds = update

    def reset(self) -> None:
        for r in self.values():
            r.reset()

    def reset_inversion(self) -> None:
        """Reset any boundary-inversion state. Reference:
        ``nessai/reparameterisations/combined.py:211``."""
        for r in self.values():
            if hasattr(r, "reset_inversion"):
                r.reset_inversion()

    def log_prior(self, x):
        """Aggregate auxiliary-parameter priors."""
        log_p = 0.0
        for r in self.values():
            if getattr(r, "has_prior", False):
                log_p = log_p + r.log_prior(x)
        return log_p

    def x_prime_log_prior(self, x_prime):
        log_p = 0.0
        for r in self.values():
            log_p = log_p + r.x_prime_log_prior(x_prime)
        return log_p
