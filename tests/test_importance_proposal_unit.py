"""Unit tests for the INS meta-proposal and multi-flow model."""

import numpy as np
import pytest

from nessai_tpu import config
from nessai_tpu.flowmodel.importance import ImportanceFlowModel
from nessai_tpu.livepoint import add_extra_parameters_to_live_points
from nessai_tpu.proposal.importance import ImportanceFlowProposal


@pytest.fixture(autouse=True)
def ins_fields():
    add_extra_parameters_to_live_points(["logW", "logQ", "logU"])
    yield
    config.livepoints.reset()


@pytest.fixture()
def proposal(model, rng, tmp_path):
    p = ImportanceFlowProposal(
        model,
        output=str(tmp_path),
        flow_config=dict(n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64, patience=3),
        rng=rng,
    )
    p.initialise()
    return p


def _hypercube_samples(model, rng, n=256):
    return model.to_unit_hypercube(model.new_point(n))


def test_to_from_prime_roundtrip(proposal, model, rng):
    x = _hypercube_samples(model, rng)
    from nessai_tpu.livepoint import live_points_to_array

    arr = live_points_to_array(x, model.names)
    prime, log_j = proposal.to_prime(arr)
    back, log_j_inv = proposal.from_prime(prime)
    np.testing.assert_allclose(back, arr, atol=1e-8)
    np.testing.assert_allclose(log_j, -log_j_inv, atol=1e-8)


def test_prior_only_log_Q(proposal, model, rng):
    """With no flows, log_Q = 0 (uniform hypercube)."""
    x = _hypercube_samples(model, rng, 32)
    log_Q, log_q = proposal.compute_meta_proposal_samples(x)
    assert log_q.shape == (32, 1)
    np.testing.assert_allclose(log_Q, 0.0, atol=1e-10)


def test_train_and_draw(proposal, model, rng):
    x = _hypercube_samples(model, rng)
    x["logW"] = 0.0
    proposal.train(x)
    assert proposal.level_count == 0
    assert proposal.flow.n_models == 1
    proposal.update_proposal_weights({-1: 0.5, 0: 0.5})
    samples, log_q = proposal.draw(64)
    assert len(samples) == 64
    assert log_q.shape == (64, 2)
    assert np.isfinite(samples["logQ"]).all()
    assert np.isfinite(samples["logW"]).all()
    # samples strictly inside the hypercube
    for n in model.names:
        assert samples[n].min() > 0 and samples[n].max() < 1


def test_meta_proposal_is_mixture(proposal, model, rng):
    """log_Q must equal logsumexp of weighted per-proposal densities."""
    from scipy.special import logsumexp

    x = _hypercube_samples(model, rng)
    x["logW"] = 0.0
    proposal.train(x)
    proposal.update_proposal_weights({-1: 0.3, 0: 0.7})
    test = _hypercube_samples(model, rng, 16)
    log_Q, log_q = proposal.compute_meta_proposal_samples(test)
    expected = logsumexp(log_q, b=np.array([0.3, 0.7])[None, :], axis=1)
    np.testing.assert_allclose(log_Q, expected, atol=1e-10)


def test_update_log_q_appends_column(proposal, model, rng):
    x = _hypercube_samples(model, rng)
    x["logW"] = 0.0
    log_q = np.zeros((len(x), 1))
    proposal.train(x)
    log_q = proposal.update_log_q(x, log_q)
    assert log_q.shape == (len(x), 2)
    proposal.train(x)
    log_q = proposal.update_log_q(x, log_q)
    assert log_q.shape == (len(x), 3)


def test_log_prob_all_matches_ith(proposal, model, rng):
    x = _hypercube_samples(model, rng)
    x["logW"] = 0.0
    proposal.train(x)
    proposal.train(x)
    arr, _ = proposal.rescale(x[:32])
    all_lp = proposal.flow.log_prob_all(arr)
    assert all_lp.shape == (32, 2)
    for i in range(2):
        np.testing.assert_allclose(
            all_lp[:, i], proposal.flow.log_prob_ith(arr, i), atol=1e-4
        )


def test_draw_from_flows(proposal, model, rng):
    x = _hypercube_samples(model, rng)
    x["logW"] = 0.0
    proposal.train(x)
    proposal.update_proposal_weights({-1: 0.5, 0: 0.5})
    samples, log_q = proposal.draw_from_flows(128)
    assert len(samples) > 100
    assert np.isfinite(samples["logW"]).all()


def test_importance_flow_model_save_load(rng, tmp_path):
    fm = ImportanceFlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=3, batch_size=64),
        output=str(tmp_path),
        rng=rng,
    )
    x = rng.normal(size=(200, 2)).astype(np.float32)
    fm.add_new_flow(reset=True)
    fm.train(x)
    fm.add_new_flow(reset=False)
    fm.train(x)
    lp = fm.log_prob_all(x[:16])

    fm2 = ImportanceFlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=8, n_layers=1),
        rng=np.random.default_rng(3),
    )
    fm2.load_all_weights(str(tmp_path))
    assert fm2.n_models == 2
    np.testing.assert_allclose(lp, fm2.log_prob_all(x[:16]), atol=1e-5)
