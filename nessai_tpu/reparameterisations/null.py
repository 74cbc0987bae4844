"""Pass-through reparameterisation. Reference:
``nessai/reparameterisations/null.py:13`` (``IdentityReparameterisation``,
with ``NullReparameterisation`` kept as an alias at ``null.py:89``; this
module keeps both names for import parity).
"""

from .base import Reparameterisation

__all__ = ["IdentityReparameterisation", "NullReparameterisation"]


class IdentityReparameterisation(Reparameterisation):
    """Identity: x' = x (prime parameters share the original names).

    Accepts the full multi-space argument set of the base class
    (``input_parameters``/``output_parameters``/``persistent_parameters``/
    ``auxiliary_parameters``) like the reference; the output parameters
    always mirror the inputs.
    """

    def __init__(self, parameters=None, prior_bounds=None, rng=None, **kwargs):
        super().__init__(
            parameters=parameters,
            prior_bounds=prior_bounds,
            rng=rng,
            **kwargs,
        )
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


#: Alias matching the reference's historical name (``null.py:89`` keeps
#: the inverse alias there; both names resolve to the same class).
NullReparameterisation = IdentityReparameterisation
