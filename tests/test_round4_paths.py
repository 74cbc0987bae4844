"""Coverage for the round-4 performance paths.

Pins the behaviours the perf round landed with thin tests: the
deferred training-history flush across checkpoint/resume, the fused
train+embed latent cache's equivalence to a separate forward pass, and
the uninformed proposal's geometric pool growth.
"""

import pickle

import numpy as np
import pytest

from nessai_tpu.flowmodel.base import FlowModel
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def fm(tmp_path):
    m = FlowModel(
        output=str(tmp_path),
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=3, patience=2, batch_size=32),
        rng=np.random.default_rng(3),
    )
    m.initialise()
    return m


def _data(n=64, seed=0):
    return (
        np.random.default_rng(seed).normal(size=(n, 2)).astype(np.float32)
    )


def test_pending_history_survives_pickle_roundtrip_in_order(fm):
    """A checkpoint written while async trains are pending must contain
    the COMPLETE history in training order (crash recovery reads the
    checkpoint, not the process)."""
    fm.train(_data(seed=1), plot=False, sync=False)
    fm.train(_data(seed=2), plot=False, sync=False)
    assert len(fm._pending_history) == 2
    blob = pickle.dumps(fm)  # __getstate__ flushes the backlog
    # the in-memory instance flushed too, in submission order
    assert fm._pending_history == []
    assert len(fm.history["loss"]) >= 2
    fm2 = pickle.loads(blob)
    assert fm2.history["loss"] == fm.history["loss"]
    assert np.isfinite(fm2.history["loss"]).all()


def test_resumed_model_trains_and_flushes_cleanly(fm):
    fm.train(_data(seed=1), plot=False, sync=False)
    fm2 = pickle.loads(pickle.dumps(fm))
    fm2.initialise()
    n_before = len(fm2.history["loss"])
    assert n_before >= 1  # the pickled backlog was flushed
    fm2.train(_data(seed=4), plot=False, sync=True)
    assert fm2.__dict__.get("_pending_history", []) == []
    assert len(fm2.history["loss"]) > n_before


def test_fused_train_embed_matches_forward_pass(fm):
    """The latent cache returned by the fused train+embed program must
    equal a separate forward pass with the post-training parameters."""
    x = _data(n=48, seed=5)
    fm.train(x, sync=True, embed=x)
    z_dev, log_q_dev, n_emb = fm.last_embedding
    assert n_emb == 48
    z, log_q = fm.forward_and_log_prob(x)
    np.testing.assert_allclose(
        np.asarray(z_dev)[:n_emb], z, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(log_q_dev)[:n_emb], log_q, rtol=1e-5, atol=1e-5
    )


def test_geometric_pool_growth_caps(tmp_path):
    """RejectionProposal grows its adaptive pool geometrically (x1.6
    per repopulation) and at least with 1/acceptance, capped at
    max_poolsize_scale."""
    from nessai_tpu.proposal.rejection import RejectionProposal

    model = IntegrationTestModel(2)
    model.set_rng(np.random.default_rng(0))
    prop = RejectionProposal(model, poolsize=64)
    cap = prop.max_poolsize_scale
    assert prop._pool_scale == 1.0

    sizes = []
    orig = prop._device_populate

    def spy(N):
        sizes.append(N)
        return orig(N)

    prop._device_populate = spy
    prop.populate()
    assert prop._pool_scale == pytest.approx(1.6)
    # low NS acceptance forces at least 1/acceptance growth
    prop.ns_acceptance = 0.01
    prop.populate()
    assert sizes[1] >= 64 * min(1.0 / 0.01, cap)
    # repeated growth saturates at the cap
    for _ in range(20):
        prop.populate()
    assert prop._pool_scale == cap
    assert max(sizes) <= int(64 * cap) * 2  # bucketing headroom


def test_drained_carry_survives_checkpoint(tmp_path):
    """_count_carry written by a device-mode tail drain must survive a
    checkpoint/resume cycle (it is owed to the next accepted
    iteration's draw count)."""
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
        max_iteration=20,
        poolsize=50,
    )
    ns.initialise(live_points=True)
    ns._count_carry = 123
    blob = pickle.dumps(ns)
    ns2 = pickle.loads(blob)
    assert ns2._count_carry == 123
