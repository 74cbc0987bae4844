#!/usr/bin/env python
"""Unbounded (Gaussian) prior on one parameter — mirrors
``examples/unbounded_prior.py``: uses ``new_point`` overrides since the
prior cannot be sampled by box rejection."""

import numpy as np
from scipy.stats import norm

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.livepoint import numpy_array_to_live_points
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/unbounded_prior/"
logger = configure_logger(output=output)


class GaussianPriorModel(Model):
    """Uniform prior on x, Gaussian prior on y (unbounded)."""

    def __init__(self):
        self.names = ["x", "y"]
        # bounds for y are only used for plotting / rescaling
        self.bounds = {"x": [-10, 10], "y": [-100, 100]}
        # the fallback zscore reparameterisation handles unbounded priors

    def log_prior(self, x):
        log_p = -np.log(20) * np.ones(x.size)
        log_p += norm.logpdf(x["y"], scale=5)
        return log_p

    def new_point(self, N=1):
        rng = self._require_rng()
        arr = np.stack(
            [
                rng.uniform(-10, 10, N),
                norm.rvs(scale=5, size=N, random_state=rng),
            ],
            axis=1,
        )
        return numpy_array_to_live_points(arr, self.names)

    def new_point_log_prob(self, x):
        return self.log_prior(x)

    def log_likelihood(self, x):
        return norm.logpdf(x["x"]) + norm.logpdf(x["y"])


if __name__ == "__main__":
    fs = FlowSampler(
        GaussianPriorModel(),
        output=output,
        resume=False,
        seed=1234,
        reparameterisations={"x": "default", "y": "zscore"},
    )
    fs.run()
