#!/usr/bin/env python
"""Configuring reparameterisations — mirrors
``examples/reparameterisations_example.py``: an angle parameter handled
with the angle-pair/Cartesian reparameterisation."""

import numpy as np
from scipy.stats import norm, vonmises

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/reparameterisations/"
logger = configure_logger(output=output)


class AngleModel(Model):
    def __init__(self):
        self.names = ["theta", "amp"]
        self.bounds = {"theta": [0, 2 * np.pi], "amp": [0, 5]}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for n in self.names:
            log_p -= np.log(np.ptp(self.bounds[n]))
        return log_p

    def log_likelihood(self, x):
        return vonmises.logpdf(x["theta"], kappa=2, loc=np.pi) + norm.logpdf(
            x["amp"], loc=2, scale=0.5
        )


if __name__ == "__main__":
    fs = FlowSampler(
        AngleModel(),
        output=output,
        resume=False,
        seed=1234,
        reparameterisations={
            "theta": {"reparameterisation": "angle-2pi"},
            "amp": "default",
        },
    )
    fs.run()
