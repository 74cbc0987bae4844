"""End-to-end tests for the importance nested sampler."""

import numpy as np
import pytest

from nessai_tpu import config
from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def integration_model():
    return IntegrationTestModel(2)


@pytest.mark.slow_integration_test
def test_ins_2d_gaussian(tmp_path, integration_model):
    fs = FlowSampler(
        integration_model,
        output=str(tmp_path),
        importance_nested_sampler=True,
        nlive=1000,
        min_samples=200,
        seed=1234,
        resume=False,
        plot=False,
        flow_config=dict(n_blocks=2, n_neurons=16, n_layers=1),
        training_config=dict(max_epochs=50, patience=10, batch_size=500),
        draw_iid_live=False,
    )
    fs.run(plot=False, save=True)
    logZ = fs.logZ
    err = fs.log_evidence_error
    analytic = integration_model.analytic_log_evidence
    assert np.isfinite(logZ)
    assert abs(logZ - analytic) < 5 * max(err, 0.02), (
        f"logZ {logZ} +- {err} vs analytic {analytic}"
    )
    post = fs.posterior_samples
    assert len(post) > 100
    # posterior mean near 0 for both parameters
    for n in integration_model.names:
        assert abs(np.mean(post[n])) < 0.3


@pytest.mark.integration_test
def test_ins_capped(tmp_path, integration_model, flow_config, training_config):
    fs = FlowSampler(
        integration_model,
        output=str(tmp_path),
        importance_nested_sampler=True,
        nlive=200,
        min_samples=100,
        seed=42,
        resume=False,
        plot=False,
        max_iteration=3,
        flow_config=flow_config,
        training_config=training_config,
        draw_iid_live=False,
    )
    fs.run(plot=False, save=False)
    assert fs.ns.iteration == 3
    assert fs.ns.proposal.flow.n_models == 3
    assert np.isfinite(fs.logZ)
    # meta-proposal weights normalised
    w = fs.ns.proposal.weights_array
    assert np.isclose(w.sum(), 1.0)
    # log_q matrix has one column per proposal
    assert fs.ns.training_samples.log_q.shape[1] == 4


@pytest.mark.integration_test
def test_ins_iid_live(tmp_path, integration_model, flow_config, training_config):
    fs = FlowSampler(
        integration_model,
        output=str(tmp_path),
        importance_nested_sampler=True,
        nlive=200,
        min_samples=100,
        seed=43,
        resume=False,
        plot=False,
        max_iteration=2,
        flow_config=flow_config,
        training_config=training_config,
        draw_iid_live=True,
    )
    fs.run(plot=False, save=False)
    assert fs.ns.iid_samples is not None
    assert len(fs.ns.iid_samples.samples) > 0
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_ins_final_redraw(tmp_path, integration_model, flow_config, training_config):
    fs = FlowSampler(
        integration_model,
        output=str(tmp_path),
        importance_nested_sampler=True,
        nlive=200,
        min_samples=100,
        seed=44,
        resume=False,
        plot=False,
        max_iteration=2,
        flow_config=flow_config,
        training_config=training_config,
        draw_iid_live=False,
    )
    fs.run(
        plot=False,
        save=False,
        redraw_samples=True,
        n_posterior_samples=200,
    )
    assert fs.ns.final_samples is not None
    assert np.isfinite(fs.ns.final_log_evidence)
