#!/usr/bin/env python
"""XLA vs Pallas microbenchmark for the hot flow kernels on the real chip.

Times the full flow forward/inverse+log_prob programs (the populate and
training hot paths) for RealNVP (affine coupling) and NSF (RQS coupling)
at production shapes, with ``config.compute.use_pallas`` off vs on.
Settles VERDICT round-2 weak #2 ("prove or retire Pallas"): the winner
by measurement becomes the default. Results are recorded in
VALIDATION.md.

Usage: python benchmarks/pallas_microbench.py [--quick]
Prints one JSON line per (flow, dims, batch, direction, backend).
"""

import argparse
import json
import sys
import time

import numpy as np


def _build(flow_type: str, dims: int, n_blocks=4, n_neurons=None, n_layers=2):
    from nessai_tpu.flows.utils import configure_model

    flow, params, _ = configure_model(
        dict(
            ftype=flow_type,
            n_inputs=dims,
            n_blocks=n_blocks,
            n_neurons=n_neurons if n_neurons else 2 * dims,
            n_layers=n_layers,
        )
    )
    return flow, params


def _time_fn(fn, *args, n_iter=30, n_warmup=3):
    import jax

    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument(
        "--large",
        action="store_true",
        help="GW-scale batch x depth sweep: the regime where the fused "
        "kernels could beat XLA (the reference-default shapes are "
        "dispatch-bound, so the kernels measure as a wash there — "
        "VALIDATION.md). This is the justify-or-retire measurement.",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nessai_tpu import config

    if args.large:
        dims_list = [16]
        batch_list = [65536, 262144, 1048576]
        net = dict(n_blocks=8, n_neurons=128, n_layers=3)
    else:
        dims_list = [2, 8, 32] if args.quick else [2, 4, 8, 16, 32]
        batch_list = [4096] if args.quick else [1024, 4096, 16384]
        net = {}

    results = []
    for flow_type in ("realnvp", "nsf"):
        for dims in dims_list:
            for batch in batch_list:
                rng = np.random.default_rng(0)
                x = jnp.asarray(
                    rng.normal(size=(batch, dims)), jnp.float32
                )
                row = {
                    "flow": flow_type,
                    "dims": dims,
                    "batch": batch,
                }
                if net:
                    row.update(net)
                for use_pallas in (False, True):
                    config.compute.use_pallas = use_pallas
                    flow, params = _build(flow_type, dims, **net)
                    tag = "pallas" if use_pallas else "xla"

                    def fwd(p_, x_):
                        z, lj = flow.forward(p_, x_)
                        return z, flow.base_log_prob(p_, z) + lj

                    def inv(p_, z_):
                        x_o, lj = flow.inverse(p_, z_)
                        return x_o, flow.base_log_prob(p_, z_) - lj

                    jf = jax.jit(fwd)
                    ji = jax.jit(inv)
                    try:
                        row[f"fwd_{tag}_ms"] = 1e3 * _time_fn(jf, params, x)
                        row[f"inv_{tag}_ms"] = 1e3 * _time_fn(ji, params, x)
                    except Exception as e:  # pragma: no cover
                        row[f"error_{tag}"] = f"{type(e).__name__}: {e}"
                config.compute.use_pallas = False
                if "fwd_xla_ms" in row and "fwd_pallas_ms" in row:
                    row["fwd_speedup"] = round(
                        row["fwd_xla_ms"] / row["fwd_pallas_ms"], 3
                    )
                    row["inv_speedup"] = round(
                        row["inv_xla_ms"] / row["inv_pallas_ms"], 3
                    )
                for k in list(row):
                    if k.endswith("_ms"):
                        row[k] = round(row[k], 4)
                print(json.dumps(row))
                sys.stdout.flush()
                results.append(row)

    # summary: geometric-mean speedup per flow type
    for flow_type in ("realnvp", "nsf"):
        sp = [
            r["inv_speedup"]
            for r in results
            if r["flow"] == flow_type and "inv_speedup" in r
        ]
        if sp:
            print(
                json.dumps(
                    {
                        "summary": flow_type,
                        "geomean_inv_speedup": round(
                            float(np.exp(np.mean(np.log(sp)))), 3
                        ),
                        "n": len(sp),
                    }
                )
            )


if __name__ == "__main__":
    main()
