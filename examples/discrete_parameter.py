#!/usr/bin/env python
"""Discrete parameter via dequantisation — mirrors
``examples/discrete_parameter.py``: model selection between sine and
cosine with a discrete weight parameter.

As in the reference, the model redefines ``new_point`` (and
``new_point_log_prob``) so the discrete parameter is drawn from its
actual support {0, 1}, restricts the prior to integer values, and
declares ``discrete_parameters``; the ``dequantise``
reparameterisation adds U[0, 1) noise for the flow and floors on the
way back.
"""

import numpy as np
from scipy.stats import norm

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.livepoint import empty_structured_array
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

output = "./outdir/discrete_parameter/"
if __name__ == "__main__":
    logger = configure_logger(output=output)

rng_data = np.random.default_rng(42)
x_data = np.linspace(0, 2 * np.pi, 50)
y_data = np.sin(x_data) + rng_data.normal(scale=0.2, size=50)


class DiscreteModel(Model):
    """Signal = w * sin(x) + (1 - w) * cos(x) with discrete w in {0, 1}."""

    def __init__(self):
        self.names = ["amp", "w"]
        self.bounds = {"amp": [0.1, 2.0], "w": [0, 1]}
        self.discrete_parameters = ["w"]

    def new_point(self, N=1):
        rng = self._require_rng()
        x = empty_structured_array(N, self.names)
        x["amp"] = rng.uniform(*self.bounds["amp"], size=N)
        x["w"] = rng.choice([0, 1], size=N)
        return x

    def new_point_log_prob(self, x):
        return -np.log(np.ptp(self.bounds["amp"]) * 2.0) * np.ones(len(x))

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        log_p -= np.log(np.ptp(self.bounds["amp"]))
        # only the integer values are allowed: log(0) = -inf otherwise
        with np.errstate(divide="ignore"):
            log_p += np.log(~(x["w"] % 1).astype(bool))
        log_p -= np.log(2)
        return log_p

    def log_likelihood(self, x):
        x = np.atleast_1d(x)
        out = np.zeros(len(x))
        for i, point in enumerate(x):
            w = np.round(point["w"])
            signal = point["amp"] * (
                w * np.sin(x_data) + (1 - w) * np.cos(x_data)
            )
            out[i] = norm.logpdf(y_data - signal, scale=0.2).sum()
        return out


if __name__ == "__main__":
    fs = FlowSampler(
        DiscreteModel(),
        output=output,
        resume=False,
        seed=1234,
        reparameterisations={"w": "dequantise", "amp": "default"},
    )
    fs.run()
