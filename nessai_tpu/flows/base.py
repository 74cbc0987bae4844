"""Flow container: a bijector chain + base distribution.

Functional analogue of the reference's ``NFlow`` (``nessai/flows/base.py:170``),
which composes a glasflow ``Transform`` with a ``Distribution``. Here both
are static objects and all state lives in a params pytree::

    params = flow.init(key)
    z, log_j = flow.forward(params, x)        # data -> latent, log|dz/dx|
    x, log_j = flow.inverse(params, z)        # latent -> data, log|dx/dz|
    log_p    = flow.log_prob(params, x)
    x, log_p = flow.sample_and_log_prob(params, key, n)

Everything is jit-compatible; ``vmap`` over a stacked params pytree gives
the multi-flow ``log_prob_all`` used by the importance sampler.
"""

import jax
import jax.numpy as jnp

from .bijectors import Bijector

__all__ = ["Flow"]


class Flow:
    """A normalising flow: ``base`` distribution in latent space plus a
    bijector mapping data to latent."""

    def __init__(self, bijector: Bijector, base, dim: int):
        self.bijector = bijector
        self.base = base
        self.dim = dim

    # ------------------------------------------------------------------
    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "bijector": self.bijector.init(k1),
            "base": self.base.init(k2),
        }

    # ------------------------------------------------------------------
    def forward(self, params, x, context=None, rng=None):
        """x -> z with log|dz/dx|. Reference: ``nessai/flows/base.py:200``.

        ``rng`` enables train-time stochastic layers (conditioner
        dropout); ``None`` is deterministic eval mode."""
        return self.bijector.forward(params["bijector"], x, context, rng=rng)

    def inverse(self, params, z, context=None, rng=None):
        """z -> x with log|dx/dz|. Reference: ``nessai/flows/base.py:215``."""
        return self.bijector.inverse(params["bijector"], z, context, rng=rng)

    def log_prob(self, params, x, context=None, rng=None):
        z, log_j = self.forward(params, x, context, rng=rng)
        return self.base.log_prob(params["base"], z) + log_j

    def forward_and_log_prob(self, params, x, context=None, rng=None):
        z, log_j = self.forward(params, x, context, rng=rng)
        return z, self.base.log_prob(params["base"], z) + log_j

    def base_log_prob(self, params, z):
        return self.base.log_prob(params["base"], z)

    #: Reference-parity alias (``nessai/flows/base.py:BaseFlow
    #: .base_distribution_log_prob``).
    def base_distribution_log_prob(self, params, z, context=None):
        """Reference: ``nessai/flows/base.py`` — ``context`` is accepted
        for API parity; the bundled base distributions are
        unconditional."""
        return self.base_log_prob(params, z)

    def end_iteration(self, params, key):
        """Per-iteration update applied between training and validation
        (functional form of ``nessai/flows/base.py:300-308``): refreshes
        the LARS base's normalisation-constant estimate when the base
        distribution carries one; otherwise a no-op."""
        if hasattr(self.base, "update_log_z"):
            params = dict(params)
            params["base"] = self.base.update_log_z(params["base"], key)
        return params

    def finalise(self, params, key):
        """Finalise the flow before inference (functional form of
        ``nessai/flows/base.py:310-318``): a final from-scratch MC
        estimate of the LARS base's normalisation constant when the
        base distribution carries one; otherwise a no-op."""
        if hasattr(self.base, "finalise"):
            params = dict(params)
            params["base"] = self.base.finalise(params["base"], key)
        return params

    def sample_base(self, params, key, n: int):
        return self.base.sample(params["base"], key, n)

    def sample(self, params, key, n: int, context=None):
        z = self.sample_base(params, key, n)
        x, _ = self.inverse(params, z, context)
        return x

    def sample_and_log_prob(self, params, key, n: int, context=None):
        z = self.sample_base(params, key, n)
        log_p_z = self.base.log_prob(params["base"], z)
        x, log_j = self.inverse(params, z, context)
        return x, log_p_z - log_j

    # ------------------------------------------------------------------
    def loss(self, params, x, weights=None, context=None):
        """Negative (weighted) mean log-likelihood.

        Weighted variant matches the INS weighted-KL loss
        (``nessai/flowmodel/base.py:404``).
        """
        log_p = self.log_prob(params, x, context)
        if weights is None:
            return -jnp.mean(log_p)
        return -jnp.sum(weights * log_p) / jnp.sum(weights)
