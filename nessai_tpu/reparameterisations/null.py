"""Pass-through reparameterisation. Reference:
``nessai/reparameterisations/null.py:13``."""

from .base import Reparameterisation

__all__ = ["NullReparameterisation"]


class NullReparameterisation(Reparameterisation):
    """Identity: x' = x (prime parameters share the original names)."""

    def __init__(self, parameters=None, prior_bounds=None, rng=None):
        super().__init__(parameters=parameters, prior_bounds=prior_bounds, rng=rng)
        self.prime_parameters = list(self.parameters)

    def reparameterise(self, x, x_prime, log_j, **kwargs):
        for p, pp in zip(self.parameters, self.prime_parameters):
            x_prime[pp] = x[p]
        return x, x_prime, log_j

    def inverse_reparameterise(self, x, x_prime, log_j, **kwargs):
        for p, pp in zip(self.parameters, self.prime_parameters):
            x[p] = x_prime[pp]
        return x, x_prime, log_j

    def jax_inverse(self):
        params = tuple(self.parameters)
        primes = tuple(self.prime_parameters)

        def fn(cols, c):
            return {p: cols[pp] for p, pp in zip(params, primes)}, 0.0

        return fn, ("null", params, primes)
