#!/usr/bin/env python
"""INS logZ calibration study (VERDICT round-2 weak #4).

Runs the importance nested sampler on the 2-D Gaussian for N fresh
seeds and, paired per seed, an EXACT importance-sampling estimate of
the same evidence from prior draws with the same sample budget. The
paired difference isolates meta-proposal-induced bias from per-seed MC
noise (the decomposition used for the standard sampler in round 2,
VALIDATION.md:17-38). Matches the unbiasedness contract of the
reference INS evidence (``nessai/evidence.py:269-441``).

Usage: python benchmarks/ins_calibration.py --start 100 --count 48
Appends one JSON line per seed to --out and prints a summary.
"""

import argparse
import json
import sys
import tempfile
import time

import numpy as np


def run_seed(seed: int, nlive: int, dims: int = 2):
    from nessai_tpu.flowsampler import FlowSampler
    from nessai_tpu.utils.testing import IntegrationTestModel

    model = IntegrationTestModel(dims)
    output = tempfile.mkdtemp(prefix=f"ins_calib_{seed}_")
    t0 = time.perf_counter()
    fs = FlowSampler(
        model,
        output=output,
        importance_nested_sampler=True,
        nlive=nlive,
        seed=seed,
        resume=False,
        plot=False,
        checkpointing=False,
    )
    fs.run(plot=False, save=False)
    wall = time.perf_counter() - t0
    analytic = model.analytic_log_evidence
    logZ = float(fs.logZ)
    err = float(fs.log_evidence_error)
    n_samples = int(len(fs.ns.samples_unit))

    # Paired exact importance sampling: same seed, same sample budget,
    row = {
        "seed": seed,
        "dims": dims,
        "logZ": logZ,
        "err": err,
        "pull": (logZ - analytic) / err,
        "n_samples": n_samples,
        "wall_s": round(wall, 2),
    }

    # Paired exact importance sampling: same seed, same sample budget,
    # draws exactly from the prior. Z = E_prior[L], so the estimator is
    # simply mean(L) over prior draws — no extra volume factor. Only
    # meaningful at low dims: the prior-to-posterior volume ratio is
    # ~(20/sqrt(2 pi))^d, so at 16-D a prior-draw estimator has
    # astronomically heavy-tailed variance and the control is skipped.
    if dims <= 4:
        rng = np.random.default_rng(seed)
        x = rng.uniform(-10.0, 10.0, size=(n_samples, dims))
        logl = -0.5 * np.sum(x**2, axis=1) - 0.5 * dims * np.log(
            2 * np.pi
        )
        l = np.exp(logl - logl.max())
        z_hat = float(np.mean(l))
        se = float(np.std(l, ddof=1) / np.sqrt(n_samples))
        logZ_exact = float(np.log(z_hat) + logl.max())
        err_exact = float(se / z_hat)
        row["logZ_exact"] = logZ_exact
        row["err_exact"] = err_exact
        row["pull_exact"] = (logZ_exact - analytic) / err_exact

    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--start", type=int, default=100)
    p.add_argument("--count", type=int, default=48)
    p.add_argument("--nlive", type=int, default=1000)
    p.add_argument("--dims", type=int, default=2)
    p.add_argument("--out", default="/tmp/ins_calibration.jsonl")
    args = p.parse_args()

    rows = []
    for seed in range(args.start, args.start + args.count):
        try:
            row = run_seed(seed, args.nlive, dims=args.dims)
        except Exception as e:  # pragma: no cover
            row = {"seed": seed, "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row))
        sys.stdout.flush()

    good = [r for r in rows if "pull" in r]
    pulls = np.array([r["pull"] for r in good])
    n = len(pulls)
    summary = {
        "n": n,
        "dims": args.dims,
        "mean_pull": round(float(pulls.mean()), 4),
        "sem_pull": round(float(pulls.std(ddof=1) / np.sqrt(n)), 4),
        "std_pull": round(float(pulls.std(ddof=1)), 4),
    }
    if all("pull_exact" in r for r in good) and good:
        pe = np.array([r["pull_exact"] for r in good])
        diff = pulls - pe
        summary.update(
            mean_pull_exact=round(float(pe.mean()), 4),
            sem_pull_exact=round(float(pe.std(ddof=1) / np.sqrt(n)), 4),
            mean_paired_diff=round(float(diff.mean()), 4),
            sem_paired_diff=round(
                float(diff.std(ddof=1) / np.sqrt(n)), 4
            ),
            t_paired=round(
                float(diff.mean() / (diff.std(ddof=1) / np.sqrt(n))), 3
            ),
        )
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
