"""Multi-seed evidence combination (the wired remedy for lower-bound
single-run error bars — VALIDATION.md 16-D / Rosenbrock studies)."""

import logging

import numpy as np
import pytest

from nessai_tpu.utils.multirun import (
    combine_log_evidence,
    multi_seed_evidence,
)


def test_combine_uses_measured_scatter_when_larger(caplog):
    lz = [-6.0, -5.5, -6.5, -5.8]
    err = [0.01, 0.01, 0.01, 0.01]
    with caplog.at_level(logging.WARNING):
        out = combine_log_evidence(lz, err)
    assert out["log_evidence"] == pytest.approx(np.mean(lz))
    sem = np.std(lz, ddof=1) / 2.0
    assert out["log_evidence_error"] == pytest.approx(sem)
    assert out["propagated_error"] == pytest.approx(
        np.sqrt(4 * 0.01**2) / 4
    )
    assert out["n_runs"] == 4
    assert any("underestimate" in r.message for r in caplog.records)


def test_combine_uses_propagated_when_scatter_small():
    lz = [-6.0, -6.001, -5.999, -6.0]
    err = [0.5, 0.5, 0.5, 0.5]
    out = combine_log_evidence(lz, err)
    assert out["log_evidence_error"] == pytest.approx(0.25)


def test_combine_requires_two_runs():
    with pytest.raises(ValueError, match="at least two"):
        combine_log_evidence([-6.0])


@pytest.mark.integration_test
def test_multi_seed_evidence_end_to_end(tmp_path):
    from nessai_tpu.utils.testing import IntegrationTestModel

    out = multi_seed_evidence(
        lambda: IntegrationTestModel(2),
        n_runs=2,
        seed=99,
        output=str(tmp_path),
        nlive=100,
        maximum_uninformed=50,
        max_iteration=400,
        poolsize=100,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=5, patience=3, batch_size=100),
    )
    assert out["n_runs"] == 2
    assert len(out["runs"]) == 2
    # distinct seeds -> distinct trajectories
    assert out["runs"][0]["seed"] != out["runs"][1]["seed"]
    assert (
        out["runs"][0]["log_evidence"] != out["runs"][1]["log_evidence"]
    )
    assert np.isfinite(out["log_evidence"])
    assert out["log_evidence_error"] > 0


def test_high_dim_recommendation_logged(tmp_path, caplog):
    from nessai_tpu.flowsampler import FlowSampler
    from nessai_tpu.utils.testing import IntegrationTestModel

    with caplog.at_level(logging.WARNING):
        FlowSampler(
            IntegrationTestModel(16),
            output=str(tmp_path),
            resume=False,
            plot=False,
            checkpointing=False,
            nlive=100,
        )
    assert any(
        "importance_nested_sampler=True" in r.message
        for r in caplog.records
    )
