"""Ensemble MCMC steps in the flow's prime space.

Reference: ``nessai/experimental/proposal/mcmc/steps.py:36,89,145`` —
Gaussian step with dynesty-style scale adaptation, differential-evolution
step (emcee-style) and the Goodman-Weare stretch move. All steps are fully
vectorised over walkers; the log proposal-ratio term is returned for the
MH acceptance.
"""

import numpy as np

__all__ = ["GaussianStep", "DifferentialEvolutionStep", "StretchStep", "KNOWN_STEPS"]


class MCMCStep:
    """Base step: propose new walker positions given the ensemble."""

    requires_ensemble = False

    def __init__(self, dims: int, rng=None):
        self.dims = dims
        self.rng = rng if rng is not None else np.random.default_rng()

    def propose(self, z: np.ndarray):
        """Return (z_new, log_ratio) where log_ratio is the log proposal
        asymmetry correction."""
        raise NotImplementedError

    def update(self, acceptance: float) -> None:
        """Adapt internal scales from the acceptance rate."""


class GaussianStep(MCMCStep):
    """Isotropic Gaussian random walk with acceptance-targeted scale
    adaptation (dynesty-style). Reference: ``steps.py:36``."""

    target_acceptance = 0.234

    def __init__(self, dims: int, sigma: float = 1.0, rng=None):
        super().__init__(dims, rng=rng)
        self.sigma = sigma
        self._facc = 0.5

    def propose(self, z: np.ndarray):
        z_new = z + self.sigma * self.rng.standard_normal(z.shape)
        return z_new, np.zeros(len(z))

    def update(self, acceptance: float) -> None:
        # multiplicative scale update towards the target acceptance
        self.sigma *= np.exp(
            (acceptance - self.target_acceptance) / self.dims
        )


class DifferentialEvolutionStep(MCMCStep):
    """Differential-evolution move: z' = z + g (z_a - z_b) with
    occasional mode-hopping (g = 1). Reference: ``steps.py:89``."""

    requires_ensemble = True

    def __init__(self, dims: int, g0: float = None, mix_fraction: float = 0.5, rng=None):
        super().__init__(dims, rng=rng)
        self.g0 = g0 if g0 is not None else 2.38 / np.sqrt(2 * dims)
        self.mix_fraction = mix_fraction

    def propose(self, z: np.ndarray):
        n = len(z)
        a = self.rng.integers(0, n, n)
        b = self.rng.integers(0, n, n)
        # avoid i == a == b degeneracies cheaply
        b = np.where(a == b, (b + 1) % n, b)
        mix = self.rng.random(n) < self.mix_fraction
        g = np.where(mix, 1.0, self.g0 * (1 + 1e-4 * self.rng.standard_normal(n)))
        z_new = z + g[:, None] * (z[a] - z[b])
        return z_new, np.zeros(n)


class StretchStep(MCMCStep):
    """Goodman-Weare stretch move. Reference: ``steps.py:145``."""

    requires_ensemble = True

    def __init__(self, dims: int, a: float = 2.0, rng=None):
        super().__init__(dims, rng=rng)
        self.a = a

    def propose(self, z: np.ndarray):
        n = len(z)
        other = self.rng.integers(0, n, n)
        other = np.where(other == np.arange(n), (other + 1) % n, other)
        u = self.rng.random(n)
        # stretch factor with density g(s) ∝ 1/sqrt(s) on [1/a, a]
        s = ((self.a - 1.0) * u + 1.0) ** 2 / self.a
        z_new = z[other] + s[:, None] * (z - z[other])
        log_ratio = (self.dims - 1) * np.log(s)
        return z_new, log_ratio


KNOWN_STEPS = {
    "gaussian": GaussianStep,
    "diff": DifferentialEvolutionStep,
    "differential_evolution": DifferentialEvolutionStep,
    "stretch": StretchStep,
}
