"""Multi-seed evidence combination.

The wired remedy for the regime where single-run logZ error bars are
known lower bounds (high dimensions, failed insertion-index KS, curved
degeneracies): the 8-seed 16-D study (VALIDATION.md) measured
across-seed logZ scatter exceeding both the first-order and the
simulated-volumes error, because flow-proposal correlations add
variance that no single-run prior-volume statistic can see. Running a
handful of seeds and quoting the combined estimate with the *measured*
scatter is the honest error bar. (Reference analogue: none — the
reference's error model is the first-order ``sqrt(H/nlive)``,
``nessai/evidence.py:147-149``.)
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["combine_log_evidence", "multi_seed_evidence"]


def combine_log_evidence(log_evidences, log_evidence_errors=None):
    """Combine independent per-seed logZ estimates.

    Returns a dict with the mean logZ, the standard error of the mean
    from the *measured* across-seed scatter, the propagated per-run
    (volume-statistic) error for comparison, and the quoted error —
    the larger of the two, so flow-proposal systematics visible as
    seed scatter widen the bar instead of vanishing into an average.

    Parameters
    ----------
    log_evidences : array-like
        Per-run logZ estimates (independent seeds).
    log_evidence_errors : array-like, optional
        Per-run reported errors; only used for the diagnostic
        comparison field.
    """
    lz = np.asarray(log_evidences, dtype=float)
    if lz.size < 2:
        raise ValueError(
            "Need at least two runs to measure seed scatter "
            f"(got {lz.size})."
        )
    n = lz.size
    scatter_sem = float(np.std(lz, ddof=1) / np.sqrt(n))
    out = {
        "log_evidence": float(np.mean(lz)),
        "log_evidence_error": scatter_sem,
        "seed_scatter_std": float(np.std(lz, ddof=1)),
        "n_runs": int(n),
    }
    if log_evidence_errors is not None:
        err = np.asarray(log_evidence_errors, dtype=float)
        propagated = float(np.sqrt(np.sum(err**2)) / n)
        out["propagated_error"] = propagated
        out["log_evidence_error"] = max(scatter_sem, propagated)
        if scatter_sem > 1.5 * propagated:
            logger.warning(
                "Across-seed logZ scatter (SEM %.4f) exceeds the "
                "propagated per-run error (%.4f): the single-run error "
                "bars underestimate on this problem (flow-proposal "
                "systematics); the combined estimate quotes the "
                "measured scatter.",
                scatter_sem,
                propagated,
            )
    return out


def multi_seed_evidence(
    model,
    n_runs: int = 4,
    seed: int = 1234,
    output=None,
    **kwargs,
):
    """Run the sampler ``n_runs`` times with distinct seeds and combine.

    ``model`` may be a Model instance (re-used across runs — its rng is
    re-seeded per run) or a zero-argument callable returning a fresh
    instance. Remaining kwargs go to :class:`~nessai_tpu.flowsampler.
    FlowSampler` (``plot``/``resume``/``checkpointing`` default off for
    throwaway runs). Returns the :func:`combine_log_evidence` dict plus
    the per-run results under ``"runs"``.

    Compiled device programs are shared across the runs via the
    process-global program cache, so runs after the first are
    compile-free.
    """
    import os
    import tempfile

    from ..flowsampler import FlowSampler

    kwargs.setdefault("plot", False)
    kwargs.setdefault("resume", False)
    kwargs.setdefault("checkpointing", False)
    if output is None:
        output = tempfile.mkdtemp(prefix="nessai_tpu_multiseed_")
    ss = np.random.SeedSequence(seed)
    run_seeds = [int(s.generate_state(1)[0] % 2**31) for s in ss.spawn(n_runs)]
    runs = []
    for i, run_seed in enumerate(run_seeds):
        m = model() if callable(model) else model
        if not callable(model):
            m.set_rng(np.random.default_rng(run_seed))
        fs = FlowSampler(
            m,
            output=os.path.join(output, f"run_{i}"),
            seed=run_seed,
            **kwargs,
        )
        fs.run(plot=False, save=False)
        runs.append(
            {
                "seed": run_seed,
                "log_evidence": float(fs.logZ),
                "log_evidence_error": float(fs.log_evidence_error),
            }
        )
        logger.info(
            "multi-seed run %d/%d: logZ = %.4f +/- %.4f (seed %d)",
            i + 1,
            n_runs,
            runs[-1]["log_evidence"],
            runs[-1]["log_evidence_error"],
            run_seed,
        )
    combined = combine_log_evidence(
        [r["log_evidence"] for r in runs],
        [r["log_evidence_error"] for r in runs],
    )
    combined["runs"] = runs
    return combined
