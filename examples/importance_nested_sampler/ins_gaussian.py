#!/usr/bin/env python
"""Importance nested sampler on an n-dim Gaussian — mirrors the
reference's ``examples/importance_nested_sampler/`` set.

Requires the unit-hypercube maps on the model.
"""

import numpy as np
from scipy.stats import norm

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/ins_gaussian/"
logger = configure_logger(output=output)


class GaussianModel(Model):
    def __init__(self, dims=4):
        self.names = [f"x_{d}" for d in range(dims)]
        self.bounds = {n: [-10.0, 10.0] for n in self.names}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for n in self.names:
            log_p -= np.log(np.ptp(self.bounds[n]))
        return log_p

    def log_likelihood(self, x):
        x = self.unstructured_view(x)
        return norm.logpdf(x).sum(axis=-1)

    def jax_log_likelihood(self, x):
        import jax.numpy as jnp

        return -0.5 * jnp.sum(x**2, axis=-1) - x.shape[-1] * 0.5 * jnp.log(
            2 * jnp.pi
        )

    # INS requires the unit-hypercube maps (inverse-CDF of the prior)
    def to_unit_hypercube(self, x):
        x_out = x.copy()
        for n in self.names:
            lo, hi = self.bounds[n]
            x_out[n] = (x[n] - lo) / (hi - lo)
        return x_out

    def from_unit_hypercube(self, x):
        x_out = x.copy()
        for n in self.names:
            lo, hi = self.bounds[n]
            x_out[n] = x[n] * (hi - lo) + lo
        return x_out


if __name__ == "__main__":
    fs = FlowSampler(
        GaussianModel(4),
        output=output,
        importance_nested_sampler=True,
        resume=False,
        seed=1234,
        nlive=2000,
    )
    fs.run()
