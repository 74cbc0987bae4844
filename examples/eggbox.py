#!/usr/bin/env python
"""Egg-box likelihood (highly multimodal) — mirrors
``examples/eggbox.py``; stresses flow retraining cadence."""

import numpy as np

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/eggbox/"
logger = configure_logger(output=output)


class EggboxModel(Model):
    def __init__(self, dims=2):
        self.names = [f"x_{d}" for d in range(dims)]
        self.bounds = {n: [0.0, 10 * np.pi] for n in self.names}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for bounds in self.bounds.values():
            log_p -= np.log(bounds[1] - bounds[0])
        return log_p

    def log_likelihood(self, x):
        x = self.unstructured_view(x)
        return (2.0 + np.prod(np.cos(x / 2.0), axis=-1)) ** 5.0

    def jax_log_likelihood(self, x):
        import jax.numpy as jnp

        return (2.0 + jnp.prod(jnp.cos(x / 2.0), axis=-1)) ** 5.0


if __name__ == "__main__":
    fs = FlowSampler(
        EggboxModel(2),
        output=output,
        resume=False,
        seed=170817,
        nlive=2000,
        reset_flow=8,
    )
    fs.run()
