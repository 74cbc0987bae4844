"""End-to-end integration tests for the standard sampler.

Unlike the reference CI (finiteness-only assertions), these check logZ
against the analytic value — the bundled Gaussian model has closed-form
evidence (see SURVEY.md §4).
"""

import numpy as np
import pytest

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def integration_model():
    return IntegrationTestModel(2)


@pytest.mark.slow_integration_test
def test_standard_sampling_2d_gaussian(tmp_path, integration_model):
    """Full run on the 2-D Gaussian: logZ within 3 sigma of analytic."""
    fs = FlowSampler(
        integration_model,
        output=str(tmp_path),
        nlive=500,
        seed=1234,
        resume=False,
        plot=False,
        flow_config=dict(n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=50, patience=10, batch_size=256),
        poolsize=500,
    )
    fs.run(plot=False, save=True)
    logZ = fs.logZ
    err = fs.log_evidence_error
    analytic = integration_model.analytic_log_evidence
    assert np.isfinite(logZ)
    assert abs(logZ - analytic) < 3 * max(err, 0.05), (
        f"logZ {logZ} +- {err} vs analytic {analytic}"
    )
    # statistical health: final KS p-value
    assert fs.ns.final_p_value is None or fs.ns.final_p_value > 1e-4
    # posterior samples exist and are in bounds
    assert len(fs.posterior_samples) > 100
    assert integration_model.in_bounds(fs.posterior_samples).all()


@pytest.mark.integration_test
def test_standard_sampling_capped(tmp_path, integration_model, flow_config, training_config):
    """Short capped run: structural assertions (flow trained, resume file
    written)."""
    fs = FlowSampler(
        integration_model,
        output=str(tmp_path),
        nlive=100,
        seed=42,
        resume=False,
        plot=False,
        max_iteration=150,
        maximum_uninformed=50,
        flow_config=flow_config,
        training_config=training_config,
        poolsize=100,
    )
    fs.run(plot=False, save=False)
    assert fs.ns.iteration == 150
    assert fs.ns._flow_proposal.training_count >= 1
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_resume_run(tmp_path, integration_model, flow_config, training_config):
    """Checkpoint an interrupted (unfinalised) run, then resume and
    continue."""
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    integration_model.set_rng(np.random.default_rng(7))
    ns = NestedSampler(
        integration_model,
        nlive=100,
        output=str(tmp_path),
        seed=7,
        plot=False,
        maximum_uninformed=20,
        flow_config=flow_config,
        training_config=training_config,
        poolsize=100,
    )
    ns.initialise()
    ns._yield_iter = ns.yield_sample(ns.live_points[0])
    for _ in range(60):
        ns.check_state()
        ns.consume_sample()
        ns.iteration += 1
        ns.block_iteration += 1
    ns.checkpoint(force=True)
    train_count_before = ns._flow_proposal.training_count

    model2 = IntegrationTestModel(2)
    fs2 = FlowSampler(
        model2,
        output=str(tmp_path),
        resume=True,
        plot=False,
        flow_config=flow_config,
        training_config=training_config,
    )
    assert fs2.ns.iteration == 60
    assert fs2.ns._flow_proposal.training_count == train_count_before
    fs2.ns.max_iteration = 100
    fs2.run(plot=False, save=False)
    assert fs2.ns.iteration == 100
    assert np.isfinite(fs2.logZ)
