#!/usr/bin/env python
"""INS with a non-uniform prior in the unit-hypercube space.

Mirrors the reference's
``examples/importance_nested_sampler/hypercube_prior.py``: the
``from_unit_hypercube`` mapping is a plain affine rescaling (it does
NOT uniformise the truncated-Gaussian prior), so the model overrides
``log_prior_unit_hypercube`` to supply the matching density in the
hypercube. Runs both samplers and compares the evidences.
"""

import os

import numpy as np
from scipy.stats import norm, truncnorm

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.plot import corner_plot
from nessai_tpu.utils import configure_logger

output = os.path.join("outdir", "ins_non_uniform_prior")
if __name__ == "__main__":
    logger = configure_logger(output=output)


class ModelWithNonUniformPrior(Model):
    """A likelihood with a non-uniform prior in the unit hypercube."""

    def __init__(self, dims):
        self.names = [f"x_{d}" for d in range(dims)]
        self.bounds = {n: [-10.0, 10.0] for n in self.names}

        # Gaussian prior truncated on [-10, 10] with mean 0, scale 0.5
        scale = 0.5
        self.prior_dist = truncnorm(-10 / scale, 10 / scale, scale=scale)

        # The same distribution expressed in the unit hypercube
        loc = 0.5
        h_scale = scale / 20
        self.hypercube_prior_dist = truncnorm(
            (0 - loc) / h_scale,
            (1 - loc) / h_scale,
            loc=loc,
            scale=h_scale,
        )
        self.likelihood_dist = norm(loc=1.0, scale=0.5)

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype=float)
        log_p += self.prior_dist.logpdf(self.unstructured_view(x)).sum(
            axis=-1
        )
        return log_p

    def log_likelihood(self, x):
        return self.likelihood_dist.logpdf(self.unstructured_view(x)).sum(
            axis=-1
        )

    def from_unit_hypercube(self, x):
        """Affine map from the hypercube — does NOT uniformise the
        prior, hence the ``log_prior_unit_hypercube`` override."""
        x_out = x.copy()
        for n in self.names:
            x_out[n] = (self.bounds[n][1] - self.bounds[n][0]) * x[
                n
            ] + self.bounds[n][0]
        return x_out

    def to_unit_hypercube(self, x):
        x_out = x.copy()
        for n in self.names:
            x_out[n] = (x[n] - self.bounds[n][0]) / (
                self.bounds[n][1] - self.bounds[n][0]
            )
        return x_out

    def log_prior_unit_hypercube(self, x) -> np.ndarray:
        """The prior density in the hypercube matching
        ``from_unit_hypercube``."""
        return np.log(
            self.in_unit_hypercube(x), dtype=float
        ) + self.hypercube_prior_dist.logpdf(
            self.unstructured_view(x)
        ).sum(axis=-1)


if __name__ == "__main__":
    # standard sampler for reference
    model = ModelWithNonUniformPrior(2)
    fs = FlowSampler(
        model,
        nlive=1000,
        output=os.path.join(output, "standard"),
        resume=False,
        seed=1234,
        importance_nested_sampler=False,
    )
    fs.run()

    # importance nested sampler
    model = ModelWithNonUniformPrior(2)
    fs_ins = FlowSampler(
        model,
        nlive=1000,
        output=os.path.join(output, "ins"),
        resume=False,
        seed=1234,
        importance_nested_sampler=True,
    )
    fs_ins.run()

    print(
        f"Log-evidences: {fs.log_evidence:.3f} vs {fs_ins.log_evidence:.3f}"
    )

    fig = corner_plot(fs.posterior_samples, include=model.names)
    fig = corner_plot(
        fs_ins.posterior_samples,
        fig=fig,
        include=model.names,
        filename=os.path.join(output, "posterior_comparison.png"),
    )
