"""Distribution helpers on device.

JAX equivalents of the reference's torch helpers
(``nessai/utils/distributions.py``): box-uniform and multivariate-normal
log-densities/samplers used for auxiliary latent distributions.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "get_uniform_distribution",
    "get_multivariate_normal",
    "BoxUniform",
    "DiagonalNormal",
]


class BoxUniform:
    """Uniform on ``[-r, r]^dims`` (reference:
    ``get_uniform_distribution``, ``nessai/utils/distributions.py:14``)."""

    def __init__(self, dims: int, r: float = 1.0):
        self.dims = dims
        self.r = float(r)

    def log_prob(self, z):
        inside = jnp.all(jnp.abs(z) <= self.r, axis=-1)
        lp = -self.dims * jnp.log(2 * self.r)
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key, n: int):
        return jax.random.uniform(
            key, (n, self.dims), minval=-self.r, maxval=self.r
        )


class DiagonalNormal:
    """Zero-mean Gaussian with scalar variance (reference:
    ``get_multivariate_normal``, ``nessai/utils/distributions.py:40``)."""

    def __init__(self, dims: int, var: float = 1.0):
        self.dims = dims
        self.var = float(var)

    def log_prob(self, z):
        return -0.5 * jnp.sum(z**2, axis=-1) / self.var - 0.5 * self.dims * (
            jnp.log(2 * jnp.pi) + jnp.log(self.var)
        )

    def sample(self, key, n: int):
        return jnp.sqrt(self.var) * jax.random.normal(key, (n, self.dims))


def get_uniform_distribution(dims: int, r: float, device=None) -> BoxUniform:
    return BoxUniform(dims, r)


def get_multivariate_normal(dims: int, var: float = 1.0, device=None) -> DiagonalNormal:
    return DiagonalNormal(dims, var)
