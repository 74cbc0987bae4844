"""Tests for proposals: analytic, rejection, and the flow proposal
train/populate cycle."""

import numpy as np
import pytest

from nessai_tpu.proposal import (
    AnalyticProposal,
    FlowProposal,
    RejectionProposal,
)
from nessai_tpu.proposal.utils import check_proposal_kwargs, get_flow_proposal_class


def test_analytic_proposal(model, rng):
    p = AnalyticProposal(model, poolsize=50, rng=rng)
    p.initialise()
    s = p.draw(None)
    assert np.isfinite(s["logL"])
    assert len(p.indices) == 49


def test_rejection_proposal(model, rng):
    p = RejectionProposal(model, poolsize=100, rng=rng)
    p.initialise()
    s = p.draw(None)
    assert np.isfinite(s["logL"])
    assert 0 < p.population_acceptance <= 1


@pytest.fixture()
def flow_proposal(model, rng, tmp_path, flow_config, training_config):
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=200,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
    )
    fp.initialise()
    return fp


def test_flow_proposal_initialise(flow_proposal, model):
    assert flow_proposal.initialised
    assert flow_proposal.parameters == model.names
    assert flow_proposal.prime_dims == 2


def test_flow_proposal_forward_backward(flow_proposal, model):
    x = model.new_point(64)
    flow_proposal._reparameterisation.update(x)
    z, log_q = flow_proposal.forward_pass(x)
    assert z.shape == (64, 2)
    assert np.isfinite(log_q).all()
    x2, log_q2 = flow_proposal.backward_pass(z)
    # points should round-trip (all in bounds since drawn from prior)
    assert len(x2) == 64
    for n in model.names:
        np.testing.assert_allclose(x2[n], x[n], atol=1e-4)
    np.testing.assert_allclose(log_q2, log_q, atol=1e-3)


def test_flow_proposal_train_populate_draw(flow_proposal, model):
    x = model.new_point(200)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    flow_proposal.train(x, plot=False)
    assert flow_proposal.training_count == 1
    worst = x[np.argmin(x["logL"])]
    s = flow_proposal.draw(worst)
    assert flow_proposal.populated
    assert np.isfinite(s["logL"])
    assert np.isfinite(flow_proposal.samples["logP"]).all()
    assert model.in_bounds(flow_proposal.samples).all()
    assert 0 < flow_proposal.population_acceptance <= 1


def test_flow_proposal_accumulate_weights(model, rng, tmp_path, flow_config, training_config):
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
        accumulate_weights=True,
    )
    fp.initialise()
    x = model.new_point(200)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    fp.populate(x[0], n_samples=100)
    assert fp.populated
    assert len(fp.samples) <= 100
    assert len(fp.samples) > 0


def test_flow_proposal_likelihood_truncation(model, rng, tmp_path, flow_config, training_config):
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=50,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
        truncation={
            "latent_radius": {"mode": "constant_volume", "q": 0.95},
            "likelihood_threshold": {},
        },
    )
    fp.initialise()
    x = model.new_point(200)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    worst = x[np.argsort(x["logL"])][len(x) // 2]
    fp.populate(worst, n_samples=50)
    assert np.all(fp.samples["logL"] > worst["logL"])


def test_flow_proposal_pickle_resume(flow_proposal, model, rng):
    import pickle

    x = model.new_point(200)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    flow_proposal.train(x, plot=False)
    state = pickle.dumps(flow_proposal)
    fp2 = pickle.loads(state)
    assert fp2.model is None
    fp2.rng = rng
    fp2.resume(model)
    assert fp2.initialised
    # flow weights were reloaded: forward pass works
    fp2._reparameterisation.update(x)
    z, log_q = fp2.forward_pass(x)
    assert np.isfinite(log_q).all()


def test_get_flow_proposal_class():
    assert get_flow_proposal_class(None) is FlowProposal
    assert get_flow_proposal_class("flowproposal") is FlowProposal
    assert get_flow_proposal_class(FlowProposal) is FlowProposal
    with pytest.raises(ValueError):
        get_flow_proposal_class("not-a-proposal")


def test_check_proposal_kwargs():
    kwargs = check_proposal_kwargs(FlowProposal, {"poolsize": 10})
    assert "poolsize" in kwargs
    # kwargs valid for another proposal class are dropped with a warning
    kwargs = check_proposal_kwargs(
        FlowProposal, {"poolsize": 10, "augment_dims": 2}
    )
    assert "augment_dims" not in kwargs
    # truly unknown kwargs raise (reference proposal/utils.py:66-69)
    with pytest.raises(
        RuntimeError, match=r"Unknown kwargs for FlowProposal"
    ):
        check_proposal_kwargs(FlowProposal, {"not_a_kwarg": 5})
    with pytest.raises(RuntimeError, match="unknown keys"):
        check_proposal_kwargs(FlowProposal, {"not_a_kwarg": 5}, strict=True)


def test_fused_populate_path(model, rng, tmp_path, flow_config, training_config):
    """With a jax likelihood + zscore reparams, populate runs the fused
    single-call device path; verify consistency with the unfused maths."""
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
    )
    fp.initialise()
    assert fp._device_inverse is not None
    assert fp._can_fuse_populate
    x = model.new_point(200)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    assert fp._device_inverse is not None  # still available after training
    before = model.likelihood_evaluations
    fp.populate(x[np.argmin(x["logL"])], n_samples=100)
    assert model.likelihood_evaluations > before  # counters maintained
    s = fp.samples
    assert model.in_bounds(s).all()
    # logL stored in the pool matches a direct evaluation
    direct = model.log_likelihood(s)
    np.testing.assert_allclose(s["logL"], direct, rtol=1e-5, atol=1e-5)
    # log_q consistency: forward pass of accepted samples ~ fused log_q
    z, log_q_fwd = fp.forward_pass(fp.x)
    x_arr, log_q_fused, log_l, in_b = fp._fused_backward(z)
    np.testing.assert_allclose(log_q_fused, log_q_fwd, atol=5e-3)


def test_fused_populate_disabled_without_jax_likelihood(rng, tmp_path, flow_config, training_config):
    from nessai_tpu.utils.testing import IntegrationTestModel

    class NoJax(IntegrationTestModel):
        jax_log_likelihood = None

    m = NoJax(2)
    m.set_rng(rng)
    fp = FlowProposal(
        m,
        output=str(tmp_path),
        poolsize=50,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
    )
    fp.initialise()
    assert not fp._can_fuse_populate
    x = m.new_point(150)
    x["logL"] = m.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    fp.populate(x[0], n_samples=50)
    assert fp.populated


def test_fused_populate_with_callback_likelihood(
    rng, tmp_path, flow_config, training_config
):
    """A non-JAX (host numpy) likelihood with likelihood_callback=True
    joins the fused populate via jax.pure_callback; stored logL matches a
    direct evaluation (SURVEY.md §7 escape hatch)."""
    from nessai_tpu.utils.testing import IntegrationTestModel

    class CallbackModel(IntegrationTestModel):
        jax_log_likelihood = None
        likelihood_callback = True

    m = CallbackModel(2)
    m.set_rng(rng)
    fp = FlowProposal(
        m,
        output=str(tmp_path),
        poolsize=50,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
    )
    fp.initialise()
    assert not m.has_jax_likelihood
    assert m.get_device_log_likelihood() is not None
    assert fp._can_fuse_populate
    x = m.new_point(100)
    x["logL"] = m.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    fp.populate(x[np.argmin(x["logL"])], n_samples=50)
    s = fp.samples
    direct = m.log_likelihood(s)
    np.testing.assert_allclose(s["logL"], direct, rtol=1e-5, atol=1e-5)


def test_callback_disabled_without_flag(rng):
    from nessai_tpu.utils.testing import IntegrationTestModel

    class NoJax(IntegrationTestModel):
        jax_log_likelihood = None

    m = NoJax(2)
    assert m.get_device_log_likelihood() is None
