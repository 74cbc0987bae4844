#!/usr/bin/env python
"""Basic importance-nested-sampler example — mirrors the reference's
``examples/importance_nested_sampler/basic_ins_example.py`` (2-D
Rosenbrock with ``draw_constant``).

The INS requires the unit-hypercube maps on the model; the jitted
likelihood keeps every level's draws on-device.
"""

import os

import numpy as np

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = os.path.join("outdir", "basic_ins_example")
logger = configure_logger(output=output)


class RosenbrockModel(Model):
    """A Rosenbrock likelihood on [-5, 5]^n."""

    def __init__(self, dims):
        self.names = [f"x_{d}" for d in range(dims)]
        self.bounds = {n: [-5.0, 5.0] for n in self.names}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype=float)
        for n in self.names:
            log_p -= np.log(self.bounds[n][1] - self.bounds[n][0])
        return log_p

    def log_likelihood(self, x):
        x = self.unstructured_view(x)
        return -np.sum(
            100.0 * (x[..., 1:] - x[..., :-1] ** 2.0) ** 2.0
            + (1.0 - x[..., :-1]) ** 2.0,
            axis=-1,
        )

    def jax_log_likelihood(self, x):
        import jax.numpy as jnp

        return -jnp.sum(
            100.0 * (x[..., 1:] - x[..., :-1] ** 2.0) ** 2.0
            + (1.0 - x[..., :-1]) ** 2.0,
            axis=-1,
        )

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
            x_out[n] = (hi - lo) * x[n] + lo
        return x_out


if __name__ == "__main__":
    fs = FlowSampler(
        RosenbrockModel(2),
        nlive=2000,
        output=output,
        resume=False,
        seed=1234,
        importance_nested_sampler=True,
        draw_constant=True,
    )
    fs.run()
