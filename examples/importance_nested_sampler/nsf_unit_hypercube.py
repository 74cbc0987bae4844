#!/usr/bin/env python
"""INS with a neural spline flow defined on the unit hypercube.

Mirrors the reference's
``examples/importance_nested_sampler/nsf_unit_hypercube.py``: the flow
is an NSF with ``tails=None`` (spline on [0,1], nflows semantics) and a
uniform latent distribution, so it operates directly on the unit
hypercube — the meta-proposal's logit reparameterisation is disabled
with ``reparameterisation=None``.
"""

import os

import numpy as np

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = os.path.join("outdir", "nsf_unit_hypercube")
if __name__ == "__main__":
    logger = configure_logger(output=output, log_level="INFO")


class RosenbrockModel(Model):
    """Rosenbrock likelihood with analytic hypercube maps."""

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
        return -(
            np.sum(
                100.0 * (x[..., 1:] - x[..., :-1] ** 2.0) ** 2.0
                + (1.0 - x[..., :-1]) ** 2.0,
                axis=-1,
            )
        )

    def jax_log_likelihood(self, x):
        import jax.numpy as jnp

        return -(
            jnp.sum(
                100.0 * (x[..., 1:] - x[..., :-1] ** 2.0) ** 2.0
                + (1.0 - x[..., :-1]) ** 2.0,
                axis=-1,
            )
        )

    def to_unit_hypercube(self, x):
        x_out = x.copy()
        for n in self.names:
            x_out[n] = (x[n] - self.bounds[n][0]) / (
                self.bounds[n][1] - self.bounds[n][0]
            )
        return x_out

    def from_unit_hypercube(self, x):
        x_out = x.copy()
        for n in self.names:
            x_out[n] = (self.bounds[n][1] - self.bounds[n][0]) * x[
                n
            ] + self.bounds[n][0]
        return x_out


# NSF defined on the unit hypercube: spline with no tails, uniform
# latent, no linear transforms between the couplings
flow_config = dict(
    n_blocks=4,
    n_neurons=32,
    ftype="nsf",
    distribution="uniform",
    linear_transform=None,
    batch_norm_between_layers=False,
    tail_bound=1.0,
    tails=None,
    num_bins=8,
)

if __name__ == "__main__":
    fs = FlowSampler(
        RosenbrockModel(4),
        nlive=10000,
        output=output,
        resume=False,
        seed=1234,
        importance_nested_sampler=True,
        draw_constant=True,
        reparameterisation=None,
        threshold_kwargs={"q": 0.66},
        reset_flow=4,
        flow_config=flow_config,
    )
    fs.run()
