#!/usr/bin/env python
"""MCMC flow proposal — mirrors ``examples/mcmc_example.py``."""

import numpy as np
from scipy.stats import norm

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/mcmc/"
logger = configure_logger(output=output)


class GaussianModel(Model):
    def __init__(self):
        self.names = ["x", "y"]
        self.bounds = {"x": [-10, 10], "y": [-10, 10]}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for n in self.names:
            log_p -= np.log(np.ptp(self.bounds[n]))
        return log_p

    def log_likelihood(self, x):
        return norm.logpdf(x["x"]) + norm.logpdf(x["y"])


if __name__ == "__main__":
    fs = FlowSampler(
        GaussianModel(),
        output=output,
        resume=False,
        seed=1234,
        flow_class="mcmcflowproposal",
        n_steps=20,
        step_type="diff",
    )
    fs.run()
