"""Exact-equivalence tests for device-side NS stepping.

``NestedSampler._consume_from_pool_device`` replays populated pools
with one ``lax.scan`` dispatch (skip/accept + sorted insertion on
device) plus a vectorised float64 evidence commit on the host. These
tests assert the result is *bit-exact* against the host batched pass —
which is itself bit-exact against the sequential ``consume_sample``
path (tests/test_batched_loop.py) — and exercise the scan kernel
directly against a pure-python oracle.
"""

import numpy as np
import pytest

from nessai_tpu.samplers.nestedsampler import NestedSampler
from nessai_tpu.utils.testing import IntegrationTestModel


def _oracle(live, pool, max_accepts=None):
    """Pure-python replica of the consume/insert stepping over a pool."""
    live = list(live)
    ids = list(range(len(live)))
    n = len(live)
    mask, consumed, ins, n_acc = [], [], [], 0
    for j, p in enumerate(pool):
        ok = p > live[0] and (max_accepts is None or n_acc < max_accepts)
        if ok:
            idx = int(np.searchsorted(live, p))
            consumed.append(ids[0])
            del live[0], ids[0]
            live.insert(idx - 1, p)
            ids.insert(idx - 1, n + j)
            ins.append(idx - 1)
            n_acc += 1
        else:
            consumed.append(-1)
            ins.append(None)
        mask.append(ok)
    return mask, consumed, ins, ids, n_acc


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_matches_oracle(seed):
    from nessai_tpu.samplers.ns_device import run_ns_scan

    rng = np.random.default_rng(seed)
    n, k = 32, 100
    live = np.sort(rng.normal(size=n)).astype(np.float32)
    pool = rng.normal(
        loc=float(live[5]), scale=2.0, size=k
    ).astype(np.float32)
    mask, consumed, ins, ids_f, n_acc = run_ns_scan(live, pool, 2**30)
    emask, econs, eins, eids, enacc = _oracle(
        live.astype(np.float64), pool.astype(np.float64)
    )
    assert n_acc == enacc
    assert mask.tolist() == emask
    assert consumed.tolist() == econs
    assert ids_f.tolist() == eids
    got = [i for i, m in zip(ins.tolist(), mask.tolist()) if m]
    want = [i for i in eins if i is not None]
    assert got == want


def test_scan_max_accepts():
    from nessai_tpu.samplers.ns_device import run_ns_scan

    rng = np.random.default_rng(7)
    n, k = 16, 64
    live = np.sort(rng.normal(size=n)).astype(np.float32)
    pool = rng.normal(loc=2.0, size=k).astype(np.float32)
    for cap in (1, 3, 10):
        mask, consumed, ins, ids_f, n_acc = run_ns_scan(live, pool, cap)
        emask, econs, eins, eids, enacc = _oracle(
            live.astype(np.float64), pool.astype(np.float64), cap
        )
        assert n_acc == enacc == cap
        assert mask.tolist() == emask
        assert ids_f.tolist() == eids


def test_scan_all_skips():
    from nessai_tpu.samplers.ns_device import run_ns_scan

    live = np.linspace(10.0, 11.0, 8).astype(np.float32)
    pool = np.full(20, 5.0, np.float32)
    mask, consumed, ins, ids_f, n_acc = run_ns_scan(live, pool, 100)
    assert n_acc == 0
    assert not mask.any()
    assert ids_f.tolist() == list(range(8))


def _run(tmp_path, tag, max_iteration=500, nlive=100, **kwargs):
    model = IntegrationTestModel(2)
    model.set_rng(np.random.default_rng(20260819))
    ns = NestedSampler(
        model,
        nlive=nlive,
        output=str(tmp_path / tag),
        seed=2718,
        plot=False,
        checkpointing=False,
        maximum_uninformed=50,
        max_iteration=max_iteration,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=10, patience=5, batch_size=100),
        poolsize=100,
        **kwargs,
    )
    ns.nested_sampling_loop()
    return ns


def _assert_same_run(a, b):
    assert b.iteration == a.iteration
    assert b.accepted == a.accepted
    assert b.rejected == a.rejected
    assert b.insertion_indices == a.insertion_indices
    assert b.state.logZ == a.state.logZ
    assert b.state.logw == a.state.logw
    assert b.state.logLs == a.state.logLs
    assert b.state.log_vols == a.state.log_vols
    assert np.array_equal(b.state.info, a.state.info)
    assert b.state.nonmonotonic_count == a.state.nonmonotonic_count
    assert b.condition == a.condition
    assert b.logLmin == a.logLmin
    assert b.logLmax == a.logLmax
    ns_a = np.asarray(a.nested_samples, dtype=a.live_points.dtype)
    ns_b = np.asarray(b.nested_samples, dtype=b.live_points.dtype)
    for name in ns_a.dtype.names:
        assert np.array_equal(ns_a[name], ns_b[name]), name
    for name in a.live_points.dtype.names:
        assert np.array_equal(a.live_points[name], b.live_points[name]), (
            name
        )
    assert b.rolling_p == a.rolling_p
    for key in (
        "logZ",
        "dlogZ",
        "logLmin",
        "logLmax",
        "mean_acceptance",
        "iterations",
        "likelihood_evaluations",
    ):
        assert b.history[key] == a.history[key], key
    assert b.mean_block_acceptance == a.mean_block_acceptance
    assert b.block_acceptance == a.block_acceptance
    assert b.block_iteration == a.block_iteration


@pytest.mark.integration_test
def test_device_loop_bit_exact(tmp_path):
    a = _run(tmp_path, "host", device_bookkeeping=False)
    b = _run(tmp_path, "device", device_bookkeeping=True)
    assert getattr(b, "_n_device_steps", 0) > 0, (
        "device stepping path never fired"
    )
    assert getattr(a, "_n_device_steps", 0) == 0
    _assert_same_run(a, b)


@pytest.mark.integration_test
def test_device_loop_bit_exact_to_tolerance(tmp_path):
    """Uncapped run: the stopping decision lands mid-pool, exercising
    the exact-cap re-dispatch and the pool rollback."""
    a = _run(tmp_path, "host_tol", max_iteration=None,
             device_bookkeeping=False)
    b = _run(tmp_path, "device_tol", max_iteration=None,
             device_bookkeeping=True)
    assert b.condition <= b.tolerance
    assert getattr(b, "_n_device_steps", 0) > 0
    _assert_same_run(a, b)
    assert abs(b.state.logZ - a.model.analytic_log_evidence) < 1.0


@pytest.mark.integration_test
def test_device_loop_bit_exact_vs_sequential(tmp_path):
    """Direct check against the fully sequential path (no batching)."""
    a = _run(tmp_path, "seq", batched_bookkeeping=False,
             device_bookkeeping=False, max_iteration=400)
    b = _run(tmp_path, "dev2", device_bookkeeping=True,
             max_iteration=400)
    assert getattr(b, "_n_device_steps", 0) > 0
    _assert_same_run(a, b)


@pytest.mark.integration_test
def test_device_loop_max_iteration_mid_pool(tmp_path):
    """An iteration cap landing mid-pool is honoured exactly."""
    a = _run(tmp_path, "host_cap", max_iteration=333,
             device_bookkeeping=False)
    b = _run(tmp_path, "device_cap", max_iteration=333,
             device_bookkeeping=True)
    assert b.iteration == a.iteration == 333
    _assert_same_run(a, b)


def test_eligibility_rejects_non_f32_values(tmp_path):
    """Host-f64 likelihood values (not f32-representable) must fall
    back to the host pass: device f32 comparisons could misorder."""
    model = IntegrationTestModel(2)
    model.set_rng(np.random.default_rng(3))
    ns = NestedSampler(
        model,
        nlive=50,
        output=str(tmp_path),
        seed=1,
        plot=False,
        checkpointing=False,
        maximum_uninformed=10,
        max_iteration=20,
        poolsize=50,
    )
    ns.initialise(live_points=True)
    ns.uninformed_sampling = False
    ns.completed_training = True

    class FakeProposal:
        pass

    prop = FakeProposal()
    rng = np.random.default_rng(0)
    samples = ns.live_points.copy()[:50]
    samples["logL"] = rng.normal(size=50) + np.pi * 1e-9
    prop.samples = samples
    prop.indices = list(range(50))
    prop.populated = True
    ns.proposal = prop
    assert ns._device_step_eligible() is None
