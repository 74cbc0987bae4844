"""Exact-equivalence tests for the batched NS-loop bookkeeping.

``NestedSampler._consume_from_pool_batched`` replays the sequential
consume/insert/evidence loop (``nessai/samplers/nestedsampler.py:680``)
over a populated pool in one pass. These tests assert the replay is
*bit-exact* against the sequential path on a fully seeded run: same
nested samples, insertion indices, evidence state, history and final
live points.
"""

import numpy as np
import pytest

from nessai_tpu.samplers.nestedsampler import NestedSampler
from nessai_tpu.utils.testing import IntegrationTestModel


def _run(tmp_path, batched, max_iteration=500, nlive=100, plot=False):
    model = IntegrationTestModel(2)
    model.set_rng(np.random.default_rng(20260816))
    ns = NestedSampler(
        model,
        nlive=nlive,
        output=str(tmp_path / f"batched_{batched}"),
        seed=3141,
        plot=plot,
        checkpointing=False,
        maximum_uninformed=50,
        max_iteration=max_iteration,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=10, patience=5, batch_size=100),
        poolsize=100,
        batched_bookkeeping=batched,
    )
    ns.nested_sampling_loop()
    return ns


@pytest.mark.integration_test
def test_batched_loop_bit_exact(tmp_path):
    a = _run(tmp_path, batched=False)
    b = _run(tmp_path, batched=True)

    assert b.iteration == a.iteration
    assert b.accepted == a.accepted
    assert b.rejected == a.rejected
    assert b.insertion_indices == a.insertion_indices
    # evidence state, bit for bit
    assert b.state.logZ == a.state.logZ
    assert b.state.logw == a.state.logw
    assert b.state.logLs == a.state.logLs
    assert b.state.log_vols == a.state.log_vols
    assert np.array_equal(b.state.info, a.state.info)
    assert b.condition == a.condition
    assert b.logLmin == a.logLmin
    assert b.logLmax == a.logLmax
    # nested samples and live points
    ns_a = np.asarray(a.nested_samples, dtype=a.live_points.dtype)
    ns_b = np.asarray(b.nested_samples, dtype=b.live_points.dtype)
    assert np.array_equal(ns_a["logL"], ns_b["logL"])
    assert np.array_equal(ns_a["it"], ns_b["it"])
    for name in a.live_points.dtype.names:
        assert np.array_equal(a.live_points[name], b.live_points[name]), name
    # diagnostics/history at the same boundaries
    assert b.rolling_p == a.rolling_p
    assert b.history["logZ"] == a.history["logZ"]
    assert b.history["dlogZ"] == a.history["dlogZ"]
    assert b.history["logLmin"] == a.history["logLmin"]
    assert b.history["logLmax"] == a.history["logLmax"]
    assert b.history["mean_acceptance"] == a.history["mean_acceptance"]
    assert b.history["iterations"] == a.history["iterations"]
    assert b.history["likelihood_evaluations"] == (
        a.history["likelihood_evaluations"]
    )
    assert b.mean_block_acceptance == a.mean_block_acceptance
    assert b.block_acceptance == a.block_acceptance
    assert b.block_iteration == a.block_iteration


@pytest.mark.integration_test
def test_batched_loop_bit_exact_with_gradients(tmp_path):
    """plot=True tracks evidence gradients; the replay must reproduce
    them too (uses actual float differences, not the analytic logt)."""
    a = _run(tmp_path, batched=False, max_iteration=250, plot=True)
    b = _run(tmp_path, batched=True, max_iteration=250, plot=True)
    assert b.state.gradients == a.state.gradients
    assert b.state.logZ == a.state.logZ
    assert b.insertion_indices == a.insertion_indices


@pytest.mark.integration_test
def test_batched_loop_runs_to_tolerance(tmp_path):
    """Unccapped run stops on dlogZ with the fast path enabled."""
    model = IntegrationTestModel(2)
    model.set_rng(np.random.default_rng(5))
    ns = NestedSampler(
        model,
        nlive=100,
        output=str(tmp_path),
        seed=5,
        plot=False,
        checkpointing=False,
        maximum_uninformed=50,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=10, patience=5, batch_size=100),
        poolsize=100,
    )
    logZ, samples = ns.nested_sampling_loop()
    assert ns.condition <= ns.tolerance
    assert np.isfinite(logZ)
    assert abs(logZ - model.analytic_log_evidence) < 1.0
