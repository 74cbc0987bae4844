#!/usr/bin/env python
"""Posterior-coverage (p-p) study for the standard sampler.

For each injection: draw a truth from the uniform prior, sample a 2-D
Gaussian likelihood centred on it, run the standard sampler, and record
the credible level of the truth in the recovered posterior for every
parameter. Calibrated posteriors give uniform credible levels (KS test).

Matches the contract of the reference's posterior machinery
(``nessai/posterior.py``); the reference's own CI never checks this —
its integration tests assert finiteness only (SURVEY.md §4).

Usage: python benchmarks/pp_test.py --count 24 --nlive 500
Appends one JSON line per injection to --out and prints a summary.
"""

import argparse
import json
import sys
import tempfile
import time

import numpy as np
from scipy import stats


def run_injection(seed: int, nlive: int, dims: int = 2):
    import jax.numpy as jnp

    from nessai_tpu.flowsampler import FlowSampler
    from nessai_tpu.livepoint import numpy_array_to_live_points
    from nessai_tpu.model import Model

    # decorrelate the injection stream from the sampler stream
    # (both would otherwise start from the same integer seed - the
    # seed-sharing trap documented in VALIDATION.md round 2)
    rng = np.random.default_rng(10_000_019 * seed + 7)
    truth = rng.uniform(-5, 5, dims)
    # observed data: truth + unit-normal observation noise — the
    # posterior centres on the data, so the truth's credible level is
    # uniform iff the recovered posterior is calibrated
    observed = truth + rng.standard_normal(dims)

    class InjectionModel(Model):
        names = [f"x_{i}" for i in range(dims)]
        bounds = {n: [-10.0, 10.0] for n in names}

        def __init__(self):
            self.data = observed.copy()
            # runtime argument to the jitted likelihood: every injection
            # shares ONE compiled program (docs/model.md)
            self.jax_likelihood_data = {"mu": observed.copy()}

        def new_point(self, N=1):
            return numpy_array_to_live_points(
                self.rng.uniform(-10, 10, (N, dims)), self.names
            )

        def new_point_log_prob(self, x):
            return self.log_prior(x)

        def log_prior(self, x):
            log_p = np.log(self.in_bounds(x), dtype=float)
            return log_p - dims * np.log(20.0)

        def log_likelihood(self, x):
            out = np.zeros(x.size)
            for i, n in enumerate(self.names):
                out += -0.5 * (x[n] - self.data[i]) ** 2
            return out - 0.5 * dims * np.log(2 * np.pi)

        def jax_log_likelihood(self, x, data):
            return -0.5 * jnp.sum(
                (x - data["mu"]) ** 2, axis=-1
            ) - 0.5 * dims * jnp.log(2 * jnp.pi)

    output = tempfile.mkdtemp(prefix=f"pp_{seed}_")
    t0 = time.perf_counter()
    fs = FlowSampler(
        InjectionModel(),
        output=output,
        nlive=nlive,
        seed=seed,
        resume=False,
        plot=False,
        checkpointing=False,
    )
    fs.run(plot=False, save=False)
    wall = time.perf_counter() - t0

    post = fs.posterior_samples
    levels = [
        float(np.mean(post[n] < truth[i]))
        for i, n in enumerate(InjectionModel.names)
    ]
    # exact posterior levels: the posterior is N(observed, 1) per
    # coordinate (box edges are irrelevant for |truth| <= 5), so
    # Phi(truth - observed) is the level a PERFECT sampler would give;
    # sampler-minus-exact isolates sampler error from noise-draw luck
    from scipy.stats import norm as _norm

    exact_levels = _norm.cdf(truth - observed).tolist()
    return {
        "seed": seed,
        "truth": truth.tolist(),
        "observed": observed.tolist(),
        "levels": levels,
        "exact_levels": exact_levels,
        "n_posterior": int(len(post)),
        "logZ": float(fs.logZ),
        "wall_s": round(wall, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--start", type=int, default=1000)
    p.add_argument("--count", type=int, default=24)
    p.add_argument("--nlive", type=int, default=500)
    p.add_argument("--dims", type=int, default=2)
    p.add_argument("--out", default="/tmp/pp_test.jsonl")
    args = p.parse_args()

    levels = []
    exact = []
    with open(args.out, "a") as f:
        for seed in range(args.start, args.start + args.count):
            row = run_injection(seed, args.nlive, dims=args.dims)
            levels.extend(row["levels"])
            exact.extend(row["exact_levels"])
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), file=sys.stderr)

    ks = stats.kstest(levels, "uniform")
    d = np.asarray(levels) - np.asarray(exact)
    summary = {
        "n_injections": args.count,
        "dims": args.dims,
        "n_levels": len(levels),
        "ks_p": round(float(ks.pvalue), 4),
        "ks_D": round(float(ks.statistic), 4),
        # raw KS includes noise-draw luck; sampler-vs-exact does not
        "exact_ks_p": round(
            float(stats.kstest(exact, "uniform").pvalue), 4
        ),
        "vs_exact_rms": round(float(np.sqrt(np.mean(d**2))), 4),
        "vs_exact_max": round(float(np.abs(d).max()), 4),
    }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
