"""Edge cases of the chained populate+NS-scan dispatch.

The NS stepping scan rides the fused device-loop populate program
(``FlowProposal._device_loop_populate`` with an ``_ns_scan_request``);
the sampler commits its trajectory in
``NestedSampler._consume_from_pool_device``. Full bit-exactness against
the host paths is pinned in tests/test_device_ns_loop.py; these tests
pin the validity/fallback edges: capacity-permutation pop order,
partial-fill invalidation, and stale-request rejection.
"""

import numpy as np
import pytest

from nessai_tpu.proposal import FlowProposal
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def trained_fp(tmp_path):
    model = IntegrationTestModel(2)
    model.set_rng(np.random.default_rng(11))
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=dict(n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=128, patience=3),
        populate_mode="device_loop",
        rng=np.random.default_rng(5),
        plot=False,
    )
    fp.initialise()
    x = model.new_point(256)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    return model, fp, x


def _scan_request(fp, n_live=32, max_acc=2**31 - 1):
    live32 = np.sort(
        np.random.default_rng(3).normal(size=n_live)
    ).astype(np.float32)
    fp._ns_scan_request = (live32, max_acc)
    return live32


def test_chained_scan_produced_on_full_fill(trained_fp):
    model, fp, x = trained_fp
    live32 = _scan_request(fp)
    try:
        fp.populate(x[0], n_samples=100)
    finally:
        fp._ns_scan_request = None
    pending = fp._pending_ns_scan
    assert pending is not None
    assert pending["mask"].shape == (100,)
    assert np.array_equal(pending["live32"], live32)
    assert pending["max_acc"] == 2**31 - 1
    # pop order must be exactly the permutation the scan consumed
    assert sorted(fp.indices) == list(range(100))
    # and the scan results must match the standalone program on the
    # pool logLs in pop order
    from nessai_tpu.samplers.ns_device import run_ns_scan

    pool32 = fp.samples["logL"][fp.indices[::-1]].astype(np.float32)
    mask, consumed, ins, ids_f, n_acc = run_ns_scan(
        live32, pool32, 2**31 - 1
    )
    assert np.array_equal(mask, pending["mask"])
    assert np.array_equal(consumed, pending["consumed"])
    assert np.array_equal(ids_f, pending["final_ids"])
    assert n_acc == pending["n_acc"]


def test_partial_fill_discards_scan_and_filters_perm(trained_fp):
    """When the pool cannot fill, the chained scan saw a partial buffer:
    results must be discarded and the pop order must be the capacity
    permutation restricted to the filled prefix."""
    model, fp, x = trained_fp
    fp.max_samples = 512
    fp._max_samples_explicit = True
    # a high latent temperature sends most draws out of bounds ->
    # acceptance collapses and the explicit cap stops the fill short
    fp.latent_temperature = 25.0
    _scan_request(fp)
    try:
        fp.populate(x[0], n_samples=100)
    finally:
        fp._ns_scan_request = None
    assert len(fp.samples) < 100
    assert fp._pending_ns_scan is None
    idx = np.asarray(fp.indices)
    assert idx.size == len(fp.samples)
    assert np.array_equal(np.sort(idx), np.arange(len(fp.samples)))


def test_no_request_no_pending(trained_fp):
    model, fp, x = trained_fp
    fp.populate(x[0], n_samples=100)
    assert fp._pending_ns_scan is None
    assert sorted(fp.indices) == list(range(100))


def test_scratch_not_pickled(trained_fp):
    import pickle

    model, fp, x = trained_fp
    _scan_request(fp)
    try:
        fp.populate(x[0], n_samples=100)
    finally:
        fp._ns_scan_request = None
    assert fp._pending_ns_scan is not None
    state = fp.__getstate__()
    assert "_pending_ns_scan" not in state
    assert "_ns_scan_request" not in state
    assert "_early_perm" not in state
    # round-trips
    pickle.dumps(state)


def test_consume_rejects_stale_live_set(tmp_path):
    """A pending scan computed against a different live set must be
    discarded (the host batched pass then consumes the pool)."""
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    model = IntegrationTestModel(2)
    model.set_rng(np.random.default_rng(4))
    ns = NestedSampler(
        model,
        nlive=50,
        output=str(tmp_path),
        seed=1,
        plot=False,
        checkpointing=False,
        maximum_uninformed=10,
        max_iteration=200,
        poolsize=50,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=5, patience=3, batch_size=64),
    )
    ns.initialise(live_points=True)
    ns.uninformed_sampling = False
    ns.proposal = ns._flow_proposal
    ns.train_proposal(force=True)
    assert not ns.proposal.populated
    ns._maybe_populate_for_device()
    assert ns.proposal.populated
    pending = ns.proposal._pending_ns_scan
    assert pending is not None
    # perturb the recorded live set -> commit must refuse
    pending["live32"] = pending["live32"] + np.float32(1.0)
    assert ns._consume_from_pool_device() is False
    assert ns.proposal._pending_ns_scan is None
    # the pool is still intact for the host pass
    assert ns.proposal.populated
    assert ns._consume_from_pool_batched() is True
