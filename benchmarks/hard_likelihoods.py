#!/usr/bin/env python
"""Validation on the reference's hard example likelihoods.

The reference ships ``examples/eggbox.py`` (highly multimodal, the
classic nested-sampling stress test) and ``examples/rosenbrock.py``
(curved degenerate ridge) but records no numbers for them anywhere in
its CI (SURVEY.md §4). Here we validate both against brute-force
numeric quadrature (2-D, where a dense grid is exact to ~1e-6) and
check 5-D Rosenbrock for seed-to-seed consistency.

Usage: python benchmarks/hard_likelihoods.py [--quick]
Prints one JSON line per case.
"""

import argparse
import json
import time

import numpy as np


def quad_logz_2d(log_like, lo, hi, n=4096):
    """Brute-force log-evidence of exp(log_like) under the uniform
    prior on [lo, hi]^2 via midpoint quadrature on an n x n grid."""
    from scipy.special import logsumexp

    edges = np.linspace(lo, hi, n + 1)
    mid = 0.5 * (edges[:-1] + edges[1:])
    xx, yy = np.meshgrid(mid, mid, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel()], axis=-1)
    ll = log_like(pts)
    # cell volume / total volume = 1/n^2 (uniform prior weight)
    return float(logsumexp(ll) - 2 * np.log(n))


def transfer_logz_rosenbrock(dims: int, lo=-5.0, hi=5.0, n=8192):
    """EXACT log-evidence of the n-D Rosenbrock likelihood under the
    uniform prior on [lo, hi]^dims.

    The likelihood is a chain of pairwise factors
    ``exp(-100 (x_{i+1} - x_i^2)^2 - (1 - x_i)^2)``, so the integral
    reduces to ``dims - 1`` iterated 1-D transfer integrals (a
    matrix-vector chain on a midpoint grid). Converged to ~1e-8 at
    n=2048 already (checked 2048/4096/8192).
    """
    from scipy.special import logsumexp

    edges = np.linspace(lo, hi, n + 1)
    x = 0.5 * (edges[:-1] + edges[1:])
    dx = (hi - lo) / n
    log_t = (
        -100.0 * (x[None, :] - x[:, None] ** 2) ** 2
        - (1.0 - x[:, None]) ** 2
    )
    logw = np.zeros(n)
    for _ in range(dims - 1):
        logw = logsumexp(logw[:, None] + log_t, axis=0) + np.log(dx)
    return float(
        logsumexp(logw) + np.log(dx) - dims * np.log(hi - lo)
    )


def run_case(model, seed, nlive, truth=None, **kwargs):
    import tempfile

    from nessai_tpu.flowsampler import FlowSampler

    out = tempfile.mkdtemp(prefix="hardlik_")
    t0 = time.perf_counter()
    fs = FlowSampler(
        model,
        output=out,
        resume=False,
        seed=seed,
        nlive=nlive,
        plot=False,
        checkpointing=False,
        **kwargs,
    )
    fs.run(plot=False, save=False)
    wall = time.perf_counter() - t0
    rec = {
        "logZ": round(float(fs.logZ), 4),
        "logZ_err": round(float(fs.logZ_error), 4),
        "wall_s": round(wall, 2),
        "iterations": int(fs.ns.iteration),
        "seed": seed,
    }
    if truth is not None:
        rec["truth"] = round(truth, 4)
        rec["pull"] = round((fs.logZ - truth) / fs.logZ_error, 2)
    return rec, fs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    import sys

    sys.path.insert(0, "examples")
    from eggbox import EggboxModel
    from rosenbrock import RosenbrockModel

    # --- eggbox 2-D vs quadrature --------------------------------------
    eb = EggboxModel(2)
    truth = quad_logz_2d(
        lambda p: (2.0 + np.prod(np.cos(p / 2.0), axis=-1)) ** 5.0,
        0.0,
        10 * np.pi,
    )
    rec, fs = run_case(
        eb,
        seed=170817,
        nlive=1000 if args.quick else 2000,
        truth=truth,
        reset_flow=8,
    )
    # mode recovery: likelihood maxima need prod(cos(x_i/2)) = +1, i.e.
    # x_i = 2 k_i pi with k_0, k_1 BOTH even (cos=+1) or BOTH odd
    # (cos=-1); on [0, 10 pi]^2 that is 18 modes (9 even-even incl.
    # box corners/edges + 9 odd-odd interior)
    post = fs.posterior_samples
    x0 = np.asarray(post["x_0"])
    x1 = np.asarray(post["x_1"])
    k = np.round(x0 / (2 * np.pi)).astype(int)
    m = np.round(x1 / (2 * np.pi)).astype(int)
    modes = {
        (a, b)
        for a, b in zip(k, m)
        if 0 <= a <= 5 and 0 <= b <= 5 and (a - b) % 2 == 0
    }
    rec["case"] = "eggbox_2d"
    rec["modes_recovered"] = len(modes)
    rec["modes_expected"] = 18
    rec["n_posterior"] = len(post)
    print(json.dumps(rec), flush=True)

    # --- rosenbrock 2-D vs quadrature ----------------------------------
    rb2 = RosenbrockModel(2)

    def rb_ll(p):
        return -(
            100.0 * (p[..., 1] - p[..., 0] ** 2) ** 2
            + (1.0 - p[..., 0]) ** 2
        )

    truth = quad_logz_2d(rb_ll, -5.0, 5.0, n=8192)
    rec, _ = run_case(rb2, seed=1451, nlive=1000, truth=truth)
    rec["case"] = "rosenbrock_2d"
    print(json.dumps(rec), flush=True)

    # --- rosenbrock 5-D vs exact transfer integral ---------------------
    if not args.quick:
        truth5 = transfer_logz_rosenbrock(5)
        flow_config = dict(n_blocks=4, n_neurons=10, n_layers=3)
        vals = []
        for seed in (1451, 2902):
            rec, _ = run_case(
                RosenbrockModel(5),
                seed=seed,
                nlive=2000,
                truth=truth5,
                flow_config=flow_config,
            )
            rec["case"] = "rosenbrock_5d"
            vals.append(rec)
            print(json.dumps(rec), flush=True)
        dz = abs(vals[0]["logZ"] - vals[1]["logZ"])
        err = float(np.hypot(vals[0]["logZ_err"], vals[1]["logZ_err"]))
        print(
            json.dumps(
                {
                    "case": "rosenbrock_5d_consistency",
                    "delta_logZ": round(dz, 4),
                    "combined_err": round(err, 4),
                    "n_sigma": round(dz / err, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
