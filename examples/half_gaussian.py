#!/usr/bin/env python
"""Half-Gaussian likelihood — mirrors ``examples/half_gaussian.py``:
demonstrates boundary inversion for a parameter bounded at zero."""

import numpy as np
from scipy.stats import halfnorm, norm

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/half_gaussian/"
logger = configure_logger(output=output)


class HalfGaussianModel(Model):
    def __init__(self):
        self.names = ["x", "y"]
        self.bounds = {"x": [0, 10], "y": [-10, 10]}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for n in self.names:
            log_p -= np.log(self.bounds[n][1] - self.bounds[n][0])
        return log_p

    def log_likelihood(self, x):
        return halfnorm.logpdf(x["x"]) + norm.logpdf(x["y"])


if __name__ == "__main__":
    fs = FlowSampler(
        HalfGaussianModel(),
        output=output,
        resume=False,
        seed=1234,
        # enable boundary inversion for the half-bounded parameter
        reparameterisations={"x": "inversion", "y": "default"},
    )
    fs.run()
