#!/usr/bin/env python
"""Augmented flow proposal — mirrors ``examples/augmented_example.py``."""

import numpy as np
from scipy.stats import norm

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/augmented/"
logger = configure_logger(output=output)


class GaussianMixtureModel(Model):
    """Bimodal likelihood; augmented dims help mode transitions."""

    def __init__(self):
        self.names = ["x", "y"]
        self.bounds = {"x": [-10, 10], "y": [-10, 10]}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for n in self.names:
            log_p -= np.log(np.ptp(self.bounds[n]))
        return log_p

    def log_likelihood(self, x):
        a = norm.logpdf(x["x"], loc=-5) + norm.logpdf(x["y"], loc=-5)
        b = norm.logpdf(x["x"], loc=5) + norm.logpdf(x["y"], loc=5)
        return np.logaddexp(a, b) - np.log(2)


if __name__ == "__main__":
    fs = FlowSampler(
        GaussianMixtureModel(),
        output=output,
        resume=False,
        seed=1234,
        flow_class="augmentedflowproposal",
        augment_dims=2,
    )
    fs.run()
