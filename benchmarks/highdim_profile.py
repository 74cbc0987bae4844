#!/usr/bin/env python
"""16-D Gaussian wall-time profile (VERDICT round-2 weak #5).

Runs the 16-D Gaussian (nlive=1000) on the default device and prints a
phase breakdown: training / populate (with the likelihood inside the
fused program) / host bookkeeping (wall minus device phases), plus
populate-round statistics, so the next perf lever is chosen from data
rather than guesses.

Usage: python benchmarks/highdim_profile.py [--dims 16] [--nlive 1000]
       [--warm] (run twice, report the warm pass)
"""

import argparse
import json
import sys
import tempfile
import time


def run_once(dims, nlive, seed, tag):
    from nessai_tpu.flowsampler import FlowSampler
    from nessai_tpu.utils.testing import IntegrationTestModel

    model = IntegrationTestModel(dims)
    output = tempfile.mkdtemp(prefix=f"nessai_hd_{tag}_")
    t0 = time.perf_counter()
    fs = FlowSampler(
        model,
        output=output,
        nlive=nlive,
        seed=seed,
        resume=False,
        plot=False,
        checkpointing=False,
        flow_config=dict(n_blocks=4, n_neurons="auto", n_layers=2),
        training_config=dict(max_epochs=100, patience=20, batch_size=1000),
        poolsize=nlive,
    )
    fs.run(plot=False, save=False)
    wall = time.perf_counter() - t0
    return fs, wall, model.analytic_log_evidence


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", type=int, default=16)
    p.add_argument("--nlive", type=int, default=1000)
    p.add_argument("--seed", type=int, default=20260817)
    p.add_argument("--warm", action="store_true")
    args = p.parse_args()

    if args.warm:
        run_once(args.dims, args.nlive, args.seed, "warmup")
    fs, wall, analytic = run_once(args.dims, args.nlive, args.seed, "timed")

    ns = fs.ns
    fp = ns._flow_proposal
    logZ = float(fs.logZ)
    err = float(fs.log_evidence_error)
    train_s = ns.training_time.total_seconds()
    pop_s = fp.population_time.total_seconds()
    lik_s = ns.likelihood_evaluation_time.total_seconds()
    out = {
        "metric": f"{args.dims}d_gaussian_profile",
        "wall_s": round(wall, 2),
        "logZ": round(logZ, 4),
        "logZ_err": round(err, 4),
        "pull": round((logZ - analytic) / max(err, 1e-6), 2),
        "iterations": int(ns.iteration),
        "likelihood_evaluations": int(ns.total_likelihood_evaluations),
        # phases
        "training_time_s": round(train_s, 2),
        "population_time_s": round(pop_s, 2),
        "likelihood_time_s_inside_populate": round(lik_s, 2),
        "bookkeeping_s_approx": round(wall - train_s - pop_s, 2),
        # populate stats
        "populate_rounds": int(fp.populated_count),
        "trainings": int(fp.training_count),
        "final_population_acceptance": float(
            getattr(fp, "population_acceptance", float("nan"))
        ),
        "poolsize_scale": float(fp._poolsize_scale),
        "fused": bool(fp._can_fuse_populate),
    }
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
