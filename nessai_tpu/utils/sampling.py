"""Latent-space sampling helpers. Reference: ``nessai/utils/sampling.py``."""

import numpy as np
from scipy import stats
from scipy.special import gammaincinv

__all__ = [
    "compute_radius",
    "draw_surface_nsphere",
    "draw_nsphere",
    "draw_uniform",
    "draw_gaussian",
    "draw_truncated_gaussian",
    "NDimensionalTruncatedGaussian",
]


def compute_radius(n: int, q: float = 0.95) -> float:
    """Radius containing fraction ``q`` of an n-dim standard Gaussian
    (chi-distribution PPF). Reference: ``nessai/utils/sampling.py:15``."""
    return float(stats.chi.ppf(q, n))


def draw_surface_nsphere(dims, r=1.0, N=1000, rng=None):
    """Uniform points on the surface of an n-sphere (Marsaglia).

    Reference: ``nessai/utils/sampling.py:33``.
    """
    if rng is None:
        rng = np.random.default_rng()
    x = rng.standard_normal((int(N), dims))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return r * x


def draw_nsphere(dims, r=1.0, N=1000, fuzz=1.0, rng=None):
    """Uniform points within an n-ball of radius ``r * fuzz``.

    Reference: ``nessai/utils/sampling.py:60``.
    """
    if rng is None:
        rng = np.random.default_rng()
    x = draw_surface_nsphere(dims, r=1.0, N=N, rng=rng)
    u = rng.uniform(0, 1, (int(N), 1)) ** (1.0 / dims)
    return r * fuzz * u * x


def draw_uniform(dims, r=1.0, N=1000, fuzz=1.0, rng=None):
    """Uniform points in the unit hypercube (r, fuzz ignored; kept for a
    consistent signature). Reference: ``nessai/utils/sampling.py:90``."""
    if rng is None:
        rng = np.random.default_rng()
    return rng.uniform(0, 1, (int(N), dims))


def draw_gaussian(dims, r=1.0, N=1000, fuzz=1.0, rng=None, temperature=1):
    """Standard Gaussian draws, optionally tempered (scaled by
    ``sqrt(temperature)``). Reference: ``nessai/utils/sampling.py:124``."""
    if rng is None:
        rng = np.random.default_rng()
    return np.sqrt(temperature) * rng.standard_normal((int(N), dims))


def draw_truncated_gaussian(dims, r, N=1000, fuzz=1.0, var=1.0, rng=None):
    """Gaussian draws truncated to radius ``r * fuzz``.

    Reference: ``nessai/utils/sampling.py:136``.
    """
    if rng is None:
        rng = np.random.default_rng()
    sigma = np.sqrt(var)
    r_max = r * fuzz
    out = np.empty((0, dims))
    n_target = int(N)
    while out.shape[0] < n_target:
        x = sigma * rng.standard_normal((n_target, dims))
        keep = np.linalg.norm(x, axis=1) < r_max
        out = np.concatenate([out, x[keep]], axis=0)
    return out[:n_target]


class NDimensionalTruncatedGaussian:
    """Exact sampler for an n-dim standard Gaussian truncated at radius
    ``r * fuzz``, via inverse-CDF sampling of the radial chi distribution
    (``gammaincinv``). Reference: ``nessai/utils/sampling.py:183``.
    """

    def __init__(self, dims: int, radius: float, fuzz: float = 1.0, rng=None):
        self.dims = int(dims)
        self.radius = float(radius)
        self.fuzz = float(fuzz)
        self.rng = rng if rng is not None else np.random.default_rng()
        r = self.radius * self.fuzz
        # CDF of chi(dims) at r: P(dims/2, r^2/2)
        from scipy.special import gammainc

        # public name matches the reference (``sampling.py:211``)
        self.u_max = gammainc(self.dims / 2.0, r**2 / 2.0)

    def sample(self, N: int) -> np.ndarray:
        u = self.rng.uniform(0, self.u_max, int(N))
        r = np.sqrt(2.0 * gammaincinv(self.dims / 2.0, u))
        x = draw_surface_nsphere(self.dims, r=1.0, N=N, rng=self.rng)
        return r[:, None] * x
