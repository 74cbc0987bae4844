#!/usr/bin/env python
"""INS checkpoint/resume demo — run once, interrupt, run again."""

import numpy as np
from scipy.stats import norm

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/ins_resume/"
logger = configure_logger(output=output)


class GaussianModel(Model):
    def __init__(self):
        self.names = ["x", "y"]
        self.bounds = {n: [-10.0, 10.0] for n in self.names}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for n in self.names:
            log_p -= np.log(np.ptp(self.bounds[n]))
        return log_p

    def log_likelihood(self, x):
        return norm.logpdf(x["x"]) + norm.logpdf(x["y"])

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
    # resume=True (the default) picks up the checkpoint in `output`
    fs = FlowSampler(
        GaussianModel(),
        output=output,
        importance_nested_sampler=True,
        seed=1234,
        nlive=1000,
        checkpoint_on_iteration=True,
        checkpoint_interval=2,
    )
    fs.run()
