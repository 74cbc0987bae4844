#!/usr/bin/env python
"""Rosenbrock likelihood in n dimensions — mirrors
``examples/rosenbrock.py`` (flow configuration demo)."""

import numpy as np

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/rosenbrock/"
logger = configure_logger(output=output, include_logger_name=True)


class RosenbrockModel(Model):
    """Rosenbrock function on [-5, 5]^n."""

    def __init__(self, dims):
        self.names = [f"x_{d}" for d in range(dims)]
        self.bounds = {n: [-5.0, 5.0] for n in self.names}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for bounds in self.bounds.values():
            log_p -= np.log(bounds[1] - bounds[0])
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


if __name__ == "__main__":
    model = RosenbrockModel(5)
    flow_config = dict(n_blocks=4, n_neurons=10, n_layers=3)
    fs = FlowSampler(
        model,
        output=output,
        flow_config=flow_config,
        resume=False,
        seed=1451,
    )
    fs.run()
