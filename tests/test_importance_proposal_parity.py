"""Parity suite for ``ImportanceFlowProposal``, mirroring the reference
``tests/test_proposal/test_importance/{test_prob,test_rescaling,
test_properties,test_config}.py`` (42 tests) against real objects.

Reference: ``nessai/proposal/importance.py``.
"""

import os

import numpy as np
import pytest
from scipy.special import logsumexp

from nessai_tpu import config
from nessai_tpu.livepoint import (
    add_extra_parameters_to_live_points,
    live_points_to_array,
    numpy_array_to_live_points,
)
from nessai_tpu.proposal.importance import ImportanceFlowProposal
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture(autouse=True)
def ins_fields():
    add_extra_parameters_to_live_points(["logW", "logQ", "logU"])
    yield
    config.livepoints.reset()


@pytest.fixture()
def rng():
    return np.random.default_rng(8)


@pytest.fixture()
def model(rng):
    m = IntegrationTestModel(2)
    m.set_rng(rng)
    return m


@pytest.fixture()
def ifp(model, rng, tmp_path):
    return ImportanceFlowProposal(
        model,
        output=str(tmp_path),
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=3, batch_size=64, patience=3),
        rng=rng,
    )


@pytest.fixture()
def trained(ifp, model, rng):
    ifp.initialise()
    x = model.to_unit_hypercube(model.new_point(128))
    x["logW"] = 0.0
    ifp.train(x)
    ifp.update_proposal_weights({-1: 0.5, 0: 0.5})
    return ifp


# ---------------------------------------------------------------------------
# properties (reference test_properties.py)
# ---------------------------------------------------------------------------
def test_weights_and_array(ifp):
    weights = {-1: 0.2, 0: 0.3, 1: 0.5}
    ifp._weights = weights
    assert ifp.weights == weights
    np.testing.assert_array_equal(
        ifp.weights_array, np.array([0.2, 0.3, 0.5])
    )
    assert ifp.n_proposals == 3


@pytest.mark.parametrize(
    "reset_flow, level_count, expected",
    [
        (1, 3, True),
        (4, 8, True),
        (True, 5, True),
        (False, 4, False),
        (5, 8, False),
    ],
)
def test_reset_flow_property(ifp, reset_flow, level_count, expected):
    ifp.reset_flow = int(reset_flow)
    ifp.level_count = level_count
    assert ifp._reset_flow is expected


# ---------------------------------------------------------------------------
# config (reference test_config.py)
# ---------------------------------------------------------------------------
def test_init_weights_and_rng(model, tmp_path):
    p = ImportanceFlowProposal(model, output=str(tmp_path))
    assert p._weights[-1] == 1
    assert p.rng is not None
    rng = np.random.default_rng(1)
    p2 = ImportanceFlowProposal(model, output=str(tmp_path), rng=rng)
    assert p2.rng is rng


def test_check_fields_pass():
    ImportanceFlowProposal._check_fields()


@pytest.mark.parametrize(
    "present, missing",
    [
        ([], "logQ"),
        (["logQ"], "logW"),
        (["logQ", "logW"], "logU"),
    ],
)
def test_check_fields_missing(present, missing):
    config.livepoints.reset()
    if present:
        add_extra_parameters_to_live_points(present)
    with pytest.raises(
        RuntimeError,
        match=rf"{missing} field missing in non-sampling parameters.",
    ):
        ImportanceFlowProposal._check_fields()


def test_initialise_idempotent(ifp):
    ifp.initialise()
    assert ifp.initialised
    n_models = ifp.flow.n_models
    ifp.initialise()
    assert ifp.flow.n_models == n_models


# ---------------------------------------------------------------------------
# rescaling (reference test_rescaling.py)
# ---------------------------------------------------------------------------
def test_verify_rescaling_pass(ifp):
    ifp.verify_rescaling()


def test_verify_rescaling_fail(ifp, monkeypatch):
    orig = ifp.inverse_rescale

    def bad_inverse(x_prime):
        samples, log_j = orig(x_prime)
        samples[ifp.model.names[0]] += 1e-6
        return samples, log_j

    monkeypatch.setattr(ifp, "inverse_rescale", bad_inverse)
    with pytest.raises(RuntimeError, match=r"Rescaling is not invertible."):
        ifp.verify_rescaling()


def test_verify_rescaling_fail_jacobian(ifp, monkeypatch):
    orig = ifp.inverse_rescale

    def bad_inverse(x_prime):
        samples, log_j = orig(x_prime)
        return samples, log_j + 1e-6
    monkeypatch.setattr(ifp, "inverse_rescale", bad_inverse)
    with pytest.raises(RuntimeError, match=r"Forward and inverse"):
        ifp.verify_rescaling()


def test_to_prime_logit_jacobian(ifp, rng):
    """to_prime sums the per-dimension logit Jacobian (reference
    test_to_prime_logit)."""
    from nessai_tpu.utils.rescaling import logit

    x = rng.uniform(0.1, 0.9, size=(10, 2))
    prime, log_j = ifp.to_prime(x)
    expected_prime, expected_log_j = logit(x, eps=config.general.eps)
    np.testing.assert_allclose(prime, expected_prime)
    np.testing.assert_allclose(log_j, expected_log_j.sum(axis=1))


def test_to_prime_none(ifp, rng):
    ifp.reparameterisation = None
    x = rng.uniform(size=(10, 2))
    prime, log_j = ifp.to_prime(x)
    np.testing.assert_array_equal(prime, x)
    assert np.all(log_j == 0.0)


def test_from_prime_sigmoid_jacobian(ifp, rng):
    from nessai_tpu.utils.rescaling import sigmoid

    x_prime = rng.standard_normal((10, 2))
    x, log_j = ifp.from_prime(x_prime)
    expected_x, expected_log_j = sigmoid(x_prime)
    np.testing.assert_allclose(x, expected_x)
    np.testing.assert_allclose(log_j, expected_log_j.sum(axis=1))


def test_from_prime_none(ifp, rng):
    ifp.reparameterisation = None
    x_prime = rng.uniform(size=(10, 2))
    x, log_j = ifp.from_prime(x_prime)
    np.testing.assert_array_equal(x, x_prime)
    assert np.all(log_j == 0.0)


@pytest.mark.parametrize("clip", [True, False])
def test_inverse_rescale_clip(ifp, rng, clip):
    """clip=True clamps samples into [0, 1] (reference
    test_inverse_rescale)."""
    ifp.clip = clip
    # large logits map close to {0, 1}; exact behaviour only differs
    # when from_prime output exceeds the cube, so force the identity map
    ifp.reparameterisation = None
    x_prime = rng.standard_normal((20, 2))
    out, _ = ifp.inverse_rescale(x_prime)
    arr = live_points_to_array(out, ifp.model.names)
    if clip:
        assert arr.min() >= 0.0
        assert arr.max() <= 1.0
    else:
        np.testing.assert_array_equal(arr, x_prime)


def test_invalid_reparameterisation_ctor(model, tmp_path):
    with pytest.raises(ValueError, match=r"Unknown reparameterisation"):
        ImportanceFlowProposal(
            model, output=str(tmp_path), reparameterisation="invalid"
        )


def test_invalid_reparameterisation_to_prime(ifp, rng):
    ifp.reparameterisation = "invalid"
    with pytest.raises(
        ValueError, match=r"Unknown reparameterisation: 'invalid'"
    ):
        ifp.to_prime(rng.uniform(size=(5, 2)))
    with pytest.raises(
        ValueError, match=r"Unknown reparameterisation: 'invalid'"
    ):
        ifp.from_prime(rng.standard_normal((5, 2)))


# ---------------------------------------------------------------------------
# log-prob machinery (reference test_prob.py)
# ---------------------------------------------------------------------------
def test_update_proposal_weights(ifp):
    ifp._weights = {-1: 0.5, 1: 0.5}
    weights = {-1: 1 / 3, 0: 1 / 3, 1: 1 / 3}
    ifp.update_proposal_weights(weights)
    assert ifp.weights == weights


def test_update_proposal_weights_invalid(ifp):
    ifp._weights = {-1: 0.5, 1: 0.5}
    with pytest.raises(RuntimeError, match="Weights must sum to 1!"):
        ifp.update_proposal_weights({-1: 0.33, 0: 0.33, 1: 0.33})


def test_initial_log_prob(ifp, rng):
    x = rng.standard_normal((10, 2))
    np.testing.assert_array_equal(ifp._log_prob_initial(x), np.zeros(10))


def test_get_proposal_log_prob_initial(ifp):
    assert ifp.get_proposal_log_prob(-1) == ifp._log_prob_initial


def test_get_proposal_log_prob_invalid(trained):
    with pytest.raises(ValueError):
        trained.get_proposal_log_prob(trained.flow.n_models)


def test_compute_log_Q(trained, rng):
    x_prime, log_j = trained.rescale(
        trained.model.to_unit_hypercube(trained.model.new_point(32))
    )
    log_Q, log_q = trained.compute_log_Q(x_prime, log_j=log_j)
    assert len(log_Q) == 32
    assert log_q.shape == (32, trained.n_proposals)
    assert np.all(log_q[:, 0] == 0)
    expected = logsumexp(log_q, b=trained.weights_array, axis=1)
    np.testing.assert_array_equal(log_Q, expected)


def test_compute_log_Q_weights_not_set(trained, rng):
    trained._weights[1] = np.nan
    x_prime = rng.standard_normal((8, 2))
    log_j = np.zeros(8)
    with pytest.raises(RuntimeError, match="Some weights are not set!"):
        trained.compute_log_Q(x_prime, log_j=log_j)


def test_compute_log_Q_missing_log_j(trained, rng):
    with pytest.raises(RuntimeError, match="Must specify log_j!"):
        trained.compute_log_Q(rng.standard_normal((8, 2)))


@pytest.mark.parametrize("p_it, q_it", [(None, None), (-1, 0), (0, -1)])
def test_kl_between_proposals(trained, model, p_it, q_it):
    # need at least two proposals for the default (None, None) case
    x = model.to_unit_hypercube(model.new_point(64))
    x["logW"] = 0.0
    trained.train(x)
    trained.update_proposal_weights({-1: 0.4, 0: 0.3, 1: 0.3})
    out = trained.compute_kl_between_proposals(x, p_it, q_it)
    assert isinstance(out, float)
    assert np.isfinite(out)


def test_kl_between_proposals_same_it(trained, model):
    x = model.to_unit_hypercube(model.new_point(8))
    with pytest.raises(ValueError, match="p and q must be different"):
        trained.compute_kl_between_proposals(x, 0, 0)


def test_kl_between_proposals_invalid_it(trained, model):
    x = model.to_unit_hypercube(model.new_point(8))
    with pytest.raises(ValueError, match="Invalid p_it or q_it"):
        trained.compute_kl_between_proposals(x, -2, 0)


def test_update_log_q(trained, model):
    x = model.to_unit_hypercube(model.new_point(16))
    log_q = np.log(
        np.random.default_rng(0).random((16, trained.n_proposals - 1))
    )
    out = trained.update_log_q(x, log_q)
    assert out.shape == (16, trained.n_proposals)
    np.testing.assert_array_equal(out[:, :-1], log_q)


def test_update_log_q_already_updated(trained, model):
    x = model.to_unit_hypercube(model.new_point(16))
    log_q = np.zeros((16, trained.n_proposals))
    with pytest.raises(
        ValueError, match="log_q array already contains current proposal"
    ):
        trained.update_log_q(x, log_q)


def test_compute_meta_proposal_from_log_q(ifp, rng):
    n, n_prop = 100, 10
    log_q = np.log(rng.random((n, n_prop)))
    counts = rng.multinomial(n_prop, np.ones(n_prop) / n_prop, size=n)
    weights = (counts / counts.sum()).sum(axis=0)
    weights = weights / weights.sum()
    ifp._weights = {i - 1: w for i, w in enumerate(weights)}
    expected = logsumexp(log_q, b=ifp.weights_array, axis=1)
    out = ifp.compute_meta_proposal_from_log_q(log_q)
    assert len(out) == n
    np.testing.assert_array_equal(out, expected)


def test_compute_meta_proposal_samples(trained, model):
    x = model.to_unit_hypercube(model.new_point(16))
    log_Q, log_q = trained.compute_meta_proposal_samples(x)
    np.testing.assert_array_equal(
        log_Q, trained.compute_meta_proposal_from_log_q(log_q)
    )


@pytest.mark.parametrize(
    "weights", [{-1: 0.5, 0: 0.5}, {-1: 0.5, 0: 0.5, 1: np.nan}]
)
def test_compute_meta_proposal_samples_weights_error(trained, model, weights):
    trained.level_count = 1
    trained._weights = weights
    x = model.to_unit_hypercube(model.new_point(8))
    with pytest.raises(
        RuntimeError, match=r"Weight\(s\) missing or not set."
    ):
        trained.compute_meta_proposal_samples(x)


def test_draw_from_prior(trained, model):
    samples, log_q = trained.draw_from_prior(32)
    assert len(samples) == 32
    assert log_q.shape == (32, trained.n_proposals)
    np.testing.assert_allclose(
        samples["logW"], samples["logU"] - samples["logQ"]
    )


# ---------------------------------------------------------------------------
# training (reference test_training.py)
# ---------------------------------------------------------------------------
def test_train_creates_level_and_nan_weight(ifp, model):
    ifp.initialise()
    x = model.to_unit_hypercube(model.new_point(64))
    x["logW"] = 0.0
    ifp.train(x)
    assert ifp.level_count == 0
    assert ifp.flow.n_models == 1
    assert np.isnan(ifp._weights[0])
    assert len(ifp._weights) == 2


def test_train_plotting_outputs(ifp, model, tmp_path):
    ifp.initialise()
    x = model.to_unit_hypercube(model.new_point(64))
    x["logW"] = np.log(np.random.default_rng(0).random(64))
    ifp.weighted_kl = True
    ifp.train(x, plot=True)
    level = os.path.join(ifp.output, "level_0", "")
    for name in (
        "training_data.png",
        "prime_training_data.png",
        "training_weights.png",
        "generated_samples.png",
    ):
        assert os.path.exists(os.path.join(level, name)), name


@pytest.mark.parametrize("use_weights", [True, False])
def test_train_weights_normalised(ifp, model, monkeypatch, use_weights):
    """Weights passed to the flow are normalised; weighted_kl derives
    them from logW (reference test_train_weights)."""
    ifp.initialise()
    x = model.to_unit_hypercube(model.new_point(32))
    rng = np.random.default_rng(3)
    x["logW"] = np.log(rng.random(32))
    captured = {}

    orig_train = ifp.flow.train

    def capture(samples, weights=None, **kwargs):
        captured["weights"] = weights
        return orig_train(samples, weights=weights, **kwargs)

    monkeypatch.setattr(ifp.flow, "train", capture)
    if use_weights:
        weights = rng.random(32)
        expected = weights / weights.sum()
        ifp.weighted_kl = False
        ifp.train(x, weights=weights)
    else:
        ifp.weighted_kl = True
        expected = np.exp(x["logW"] - logsumexp(x["logW"]))
        ifp.train(x)
    np.testing.assert_allclose(captured["weights"].sum(), 1.0)
    np.testing.assert_allclose(captured["weights"], expected)


def test_train_weights_nan(ifp, model):
    ifp.initialise()
    x = model.to_unit_hypercube(model.new_point(16))
    weights = np.ones(16)
    weights[0] = np.nan
    with pytest.raises(ValueError, match=r"Weights contain NaN\(s\)"):
        ifp.train(x, weights=weights)


def test_training_and_prob_integration(model, tmp_path):
    """4 levels of train/draw, then a meta-proposal evaluation
    (reference test_training_and_prob)."""
    ifp = ImportanceFlowProposal(
        model,
        output=str(tmp_path / "t"),
        weighted_kl=False,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=2, batch_size=16),
    )
    ifp.initialise()
    for i in range(4):
        ifp.train(model.to_unit_hypercube(model.new_point(10)))
        weights = {j - 1: 1 / (i + 2) for j in range(i + 2)}
        ifp.update_proposal_weights(weights)
        x, _ = ifp.draw(10)
    log_Q, log_q = ifp.compute_meta_proposal_samples(x)
    assert len(log_Q) == 10
    assert log_q.shape == (10, 5)
