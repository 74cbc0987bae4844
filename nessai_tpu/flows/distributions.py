"""Base (latent) distributions.

Replaces glasflow's ``StandardNormal``/``MultivariateUniform`` and the
reference's ``MultivariateNormal``/``ResampledGaussian`` wrappers
(``nessai/flows/distributions.py:17,76``; registry
``nessai/flows/utils.py:35-102``).

Each distribution is a static object with pure functions over an optional
params pytree (LARS has trainable parameters and MC-estimated state).
"""

import jax
import jax.numpy as jnp

from .nets import apply_mlp, init_mlp

__all__ = [
    "StandardNormal",
    "MultivariateNormal",
    "MultivariateUniform",
    "ResampledGaussian",
]


class StandardNormal:
    """Unit Gaussian base distribution."""

    def __init__(self, dim: int):
        self.dim = dim

    def init(self, key):
        return {}

    def log_prob(self, params, z):
        return -0.5 * jnp.sum(z**2, axis=-1) - 0.5 * self.dim * jnp.log(
            2 * jnp.pi
        )

    def sample(self, params, key, n: int):
        return jax.random.normal(key, (n, self.dim))


class MultivariateNormal(StandardNormal):
    """Zero-mean Gaussian with scalar variance.

    Reference: ``nessai/flows/distributions.py:17``.
    """

    def __init__(self, dim: int = None, var: float = 1.0, shape=None):
        # ``shape`` is the reference ctor argument
        # (``nessai/flows/distributions.py:30``): a 1-tuple of the dim
        if shape is not None:
            if dim is not None:
                raise ValueError("Specify either dim or shape, not both")
            dim = int(jnp.prod(jnp.asarray(shape)))
        if dim is None:
            raise ValueError("Must specify dim or shape")
        super().__init__(dim)
        self.var = float(var)
        # reference attribute name (``nessai/flows/distributions.py:40``)
        self._var = self.var

    def log_prob(self, params, z):
        return -0.5 * jnp.sum(z**2, axis=-1) / self.var - 0.5 * self.dim * (
            jnp.log(2 * jnp.pi) + jnp.log(self.var)
        )

    def sample(self, params, key, n: int):
        return jnp.sqrt(self.var) * jax.random.normal(key, (n, self.dim))


class MultivariateUniform:
    """Uniform on ``[low, high]^dim`` (used with unit-hypercube flows;
    ``nessai/flows/utils.py:57``)."""

    def __init__(self, dim: int, low: float = 0.0, high: float = 1.0):
        self.dim = dim
        self.low = float(low)
        self.high = float(high)

    def init(self, key):
        return {}

    def log_prob(self, params, z):
        inside = jnp.all((z >= self.low) & (z <= self.high), axis=-1)
        lp = -self.dim * jnp.log(self.high - self.low)
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, params, key, n: int):
        return jax.random.uniform(
            key, (n, self.dim), minval=self.low, maxval=self.high
        )


class ResampledGaussian:
    """Learnt-acceptance resampled Gaussian base distribution (LARS,
    arXiv:2110.15828). Reference: ``nessai/flows/distributions.py:76``.

    ``log_prob(z) = log a(z) + log N(z) - log Z`` where ``a`` is a sigmoid
    MLP and ``Z = E_N[a]`` is tracked as an exponential moving average in
    ``params['log_Z_state']`` (updated by :meth:`end_iteration` /
    :meth:`finalise` on the host, outside jit).
    """

    def __init__(
        self,
        dim: int,
        n_neurons: int = 128,
        n_layers: int = 2,
        eps: float = 0.05,
        T: int = 100,
        trainable: bool = True,
    ):
        self.dim = dim
        self.n_neurons = n_neurons
        self.n_layers = n_layers
        self.eps = eps
        self.T = T

    def init(self, key):
        net = init_mlp(key, self.dim, 1, self.n_neurons, self.n_layers)
        # Zero-init output => a(z) = sigmoid(0) = 0.5 everywhere => Z = 0.5
        return {"net": net, "log_Z": jnp.log(jnp.array(0.5))}

    def _log_accept(self, params, z):
        return jax.nn.log_sigmoid(
            apply_mlp(params["net"], z, activation="tanh")[..., 0]
        )

    def log_prob(self, params, z):
        base = -0.5 * jnp.sum(z**2, axis=-1) - 0.5 * self.dim * jnp.log(
            2 * jnp.pi
        )
        log_a = self._log_accept(params, z)
        # alpha = (1 - eps) a/Z + eps  (truncated resampling, T steps)
        a_over_z = jnp.exp(log_a - params["log_Z"])
        alpha = (1.0 - self.eps) * a_over_z + self.eps
        return base + jnp.log(alpha)

    def estimate_log_z(self, params, key, n: int = 10000):
        z = jax.random.normal(key, (n, self.dim))
        log_a = self._log_accept(params, z)
        return jax.nn.logsumexp(log_a) - jnp.log(n)

    def update_log_z(self, params, key, n: int = 10000, decay: float = 0.99):
        """EMA update of the normalisation estimate (host-side, between
        training iterations — cf. ``end_iteration`` in the reference)."""
        new = self.estimate_log_z(params, key, n)
        old = params["log_Z"]
        merged = jnp.logaddexp(
            jnp.log(decay) + old, jnp.log(1 - decay) + new
        )
        params = dict(params)
        params["log_Z"] = merged
        return params

    def finalise(
        self, params, key, n_samples: int = 10_000, n_batches: int = 10
    ):
        """Final, from-scratch MC estimate of the normalisation
        constant over ``n_samples * n_batches`` draws (functional form
        of ``nessai/flows/distributions.py:89-93``)."""
        return self.update_log_z(
            params, key, n=n_samples * n_batches, decay=0.0
        )

    def sample(self, params, key, n: int):
        """Rejection-resample from N(0, I) with acceptance a(z); after T
        failed rounds a sample is taken unconditionally (truncated LARS)."""
        def body(i, state):
            out, accepted, k = state
            k, k1, k2 = jax.random.split(k, 3)
            z = jax.random.normal(k1, (n, self.dim))
            log_a = self._log_accept(params, z)
            u = jax.random.uniform(k2, (n,))
            accept_now = (jnp.log(u) < log_a) & (~accepted)
            last = i == self.T - 1
            take = accept_now | (last & ~accepted)
            out = jnp.where(take[:, None], z, out)
            accepted = accepted | take
            return out, accepted, k

        out = jnp.zeros((n, self.dim))
        accepted = jnp.zeros((n,), dtype=bool)
        out, _, _ = jax.lax.fori_loop(0, self.T, body, (out, accepted, key))
        return out
