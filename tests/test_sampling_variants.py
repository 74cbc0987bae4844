"""Capped integration runs over flow architectures and sampler variants."""

import numpy as np
import pytest

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.mark.integration_test
@pytest.mark.parametrize("ftype", ["realnvp", "nsf", "maf"])
def test_standard_sampling_flow_types(tmp_path, ftype, training_config):
    model = IntegrationTestModel(2)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=100,
        seed=5,
        resume=False,
        plot=False,
        max_iteration=120,
        maximum_uninformed=40,
        flow_config=dict(
            n_blocks=2, n_neurons=4, n_layers=1, ftype=ftype
        ),
        training_config=training_config,
        poolsize=100,
    )
    fs.run(plot=False, save=False)
    assert fs.ns._flow_proposal.training_count >= 1
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_standard_sampling_augmented(tmp_path, training_config):
    model = IntegrationTestModel(2)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=100,
        seed=6,
        resume=False,
        plot=False,
        max_iteration=120,
        maximum_uninformed=40,
        flow_class="augmentedflowproposal",
        augment_dims=1,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64, patience=3),
        poolsize=100,
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)
    assert fs.ns._flow_proposal.prime_dims == 3


@pytest.mark.integration_test
def test_standard_sampling_unit_hypercube(tmp_path, flow_config, training_config):
    model = IntegrationTestModel(2)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=100,
        seed=7,
        resume=False,
        plot=False,
        max_iteration=120,
        maximum_uninformed=40,
        map_to_unit_hypercube=True,
        flow_config=flow_config,
        training_config=training_config,
        poolsize=100,
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_ins_resume(tmp_path, flow_config, training_config):
    """INS checkpoint → resume with log_q recomputation."""
    model = IntegrationTestModel(2)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        importance_nested_sampler=True,
        nlive=200,
        min_samples=100,
        seed=8,
        resume=False,
        plot=False,
        max_iteration=2,
        flow_config=flow_config,
        training_config=training_config,
        draw_iid_live=False,
        save_log_q=False,
    )
    fs.run(plot=False, save=False)
    log_q_before = fs.ns.training_samples.log_q.copy()
    logZ_before = fs.logZ
    fs.ns.checkpoint(force=True)

    fs2 = FlowSampler(
        IntegrationTestModel(2),
        output=str(tmp_path),
        importance_nested_sampler=True,
        resume=True,
        plot=False,
        flow_config=flow_config,
        training_config=training_config,
    )
    assert fs2.ns.iteration == 2
    # log_q recomputed from the reloaded flows matches the original
    np.testing.assert_allclose(
        fs2.ns.training_samples.log_q, log_q_before, atol=1e-4
    )
    assert np.isclose(fs2.logZ, logZ_before, atol=1e-8)
