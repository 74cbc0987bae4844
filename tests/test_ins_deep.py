"""Deep coverage for the importance nested sampler branches.

Reference: ``nessai/samplers/importancesampler.py`` and its test suite.
"""

import numpy as np
import pytest

from nessai_tpu.samplers.importancesampler import ImportanceNestedSampler
from nessai_tpu.utils.testing import IntegrationTestModel


def _make(tmp_path, rng, **kw):
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    kw.setdefault("nlive", 100)
    kw.setdefault("min_samples", 20)
    kw.setdefault("plot", False)
    kw.setdefault(
        "flow_config", dict(n_blocks=2, n_neurons=4, n_layers=1)
    )
    kw.setdefault(
        "training_config", dict(max_epochs=3, batch_size=32, patience=2)
    )
    return ImportanceNestedSampler(
        model, output=str(tmp_path), rng=rng, **kw
    )


def test_min_samples_validation(tmp_path, rng):
    with pytest.raises(ValueError, match="min_samples"):
        _make(tmp_path, rng, nlive=10, min_samples=50)


def test_min_remove_validation(tmp_path, rng):
    with pytest.raises(ValueError, match="min_remove"):
        _make(tmp_path, rng, nlive=10, min_samples=5, min_remove=50)


def test_threshold_quantile(tmp_path, rng):
    ins = _make(tmp_path, rng)
    ins.populate_live_points()
    t = ins.determine_threshold_quantile(ins.live_points, q=0.5)
    assert 0 < t < len(ins.live_points)


def test_threshold_entropy(tmp_path, rng):
    ins = _make(tmp_path, rng)
    ins.populate_live_points()
    t = ins.determine_threshold_entropy(ins.live_points, q=0.5)
    assert 0 <= t < len(ins.live_points)


def test_threshold_unknown_method(tmp_path, rng):
    ins = _make(tmp_path, rng)
    ins.populate_live_points()
    with pytest.raises(ValueError):
        ins.determine_log_likelihood_threshold(
            ins.live_points, method="bogus"
        )


def test_populate_live_points_fields(tmp_path, rng):
    ins = _make(tmp_path, rng)
    ins.populate_live_points()
    lp = ins.live_points
    assert len(lp) == 100
    assert np.isfinite(lp["logL"]).all()
    assert np.isfinite(lp["logQ"]).all()
    assert np.isfinite(lp["logW"]).all()
    # sorted by logL (OrderedSamples contract)
    assert (np.diff(lp["logL"]) >= 0).all()


def test_infinite_likelihood_rejected(tmp_path, rng):
    class InfModel(IntegrationTestModel):
        jax_log_likelihood = None

        def log_likelihood(self, x):
            return np.full(x.size, np.inf)

    m = InfModel(2)
    m.set_rng(rng)
    ins = ImportanceNestedSampler(
        m,
        output=str(tmp_path),
        rng=rng,
        nlive=50,
        min_samples=10,
        plot=False,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
    )
    with pytest.raises(RuntimeError, match="inf"):
        ins.populate_live_points()


def test_compute_leakage(tmp_path, rng):
    ins = _make(tmp_path, rng)
    ins.populate_live_points()
    samples = ins.live_points.copy()
    # no threshold yet -> no leakage
    leakage = ins.compute_leakage(samples)
    assert 0.0 <= leakage <= 1.0


def test_short_run_history_and_finalise(tmp_path, rng):
    ins = _make(tmp_path, rng, max_iteration=2)
    ins.nested_sampling_loop()
    assert ins.iteration <= 2
    assert np.isfinite(ins.log_evidence)
    assert np.isfinite(ins.log_evidence_error)
    assert ins.finalised
    # final samples exist and carry weights
    assert ins.samples is not None
    assert len(ins.samples) > 0
    # posterior ESS is positive
    assert ins.state.effective_n_posterior_samples > 0


def test_draw_final_samples_validation(tmp_path, rng):
    ins = _make(tmp_path, rng, max_iteration=1)
    ins.nested_sampling_loop()
    with pytest.raises(RuntimeError, match="at most one"):
        ins.draw_final_samples(n_post=10, n_draw=10)


def test_stopping_criterion_names(tmp_path, rng):
    # composed criteria resolve
    ins = _make(
        tmp_path,
        rng,
        stopping_criterion=["ratio", "ess"],
        check_criteria="all",
        tolerance=[0.0, 500],
    )
    assert ins.stopping_criteria is not None


def test_resume_roundtrip(tmp_path, rng):
    import pickle

    ins = _make(tmp_path, rng, max_iteration=1, checkpointing=False)
    ins.nested_sampling_loop()
    state = pickle.dumps(ins)
    model = IntegrationTestModel(2)
    ins2 = ImportanceNestedSampler.resume_from_pickled_sampler(
        pickle.loads(state), model
    )
    assert ins2.iteration == ins.iteration
    assert np.isclose(ins2.log_evidence, ins.log_evidence, atol=1e-8)


@pytest.mark.integration_test
def test_draw_final_samples_optimise_weights(tmp_path, model):
    """draw_final_samples with SLSQP weight optimisation
    (reference ``importancesampler.py:1633`` + ``utils/optimise.py``)."""
    from nessai_tpu.samplers.importancesampler import (
        ImportanceNestedSampler,
    )

    ins = ImportanceNestedSampler(
        model,
        nlive=100,
        min_samples=10,
        output=str(tmp_path),
        seed=21,
        plot=False,
        checkpointing=False,
        min_iteration=2,
        max_iteration=3,
        flow_config=dict(n_blocks=2, n_neurons=4),
        training_config=dict(max_epochs=3, patience=2, batch_size=50),
    )
    ins.nested_sampling_loop()
    logZ_before = ins.log_evidence
    ins.draw_final_samples(n_post=50, optimise_weights=True)
    assert ins.final_samples is not None
    assert len(ins.final_samples) >= 50
    assert np.isfinite(ins.final_log_evidence)
    # the final estimate should be in the same ballpark
    assert abs(ins.final_log_evidence - logZ_before) < 2.0


def test_draw_final_samples_max_samples_ratio(tmp_path, rng, caplog):
    """max_samples_ratio caps the redraw (reference
    importancesampler.py:1639,1787)."""
    import logging

    ins = _make(tmp_path, rng, max_iteration=1, checkpointing=False)
    ins.nested_sampling_loop()
    with caplog.at_level(logging.WARNING):
        samples = ins.draw_final_samples(
            n_post=10**6, max_samples_ratio=0.01, max_its=50
        )
    # stops after the first batch exceeds the cap instead of running all
    # 50 iterations
    assert len(samples) < 2 * 20_000
    assert any("maximum number of redraw" in r.message for r in caplog.records)


def test_draw_final_samples_optimisation_method_invalid(tmp_path, rng):
    ins = _make(tmp_path, rng, max_iteration=1, checkpointing=False)
    ins.nested_sampling_loop()
    with pytest.raises(ValueError):
        ins.draw_final_samples(
            n_post=10, optimise_weights=True, optimisation_method="bad"
        )


def test_add_level_post_sampling(tmp_path, rng):
    """Reference: ``importancesampler.py:1381-1390`` — adding a level
    after sampling trains a new flow, draws n new nested samples and
    updates the evidence."""
    ins = _make(tmp_path, rng, max_iteration=1, checkpointing=False)
    ins.nested_sampling_loop()
    n_before = len(ins.samples_unit)
    n_flows_before = ins.proposal.n_proposals
    logz_before = ins.log_evidence
    training = ins.training_samples.samples[-50:].copy()
    ins.add_level_post_sampling(training, 40)
    assert ins.proposal.n_proposals == n_flows_before + 1
    assert len(ins.samples_unit) == n_before + 40
    assert ins.training_samples.log_q.shape == (
        n_before + 40,
        n_flows_before + 1,
    )
    # every sample (incl. the new ones) is in the nested set
    assert ins.training_samples.live_points is None
    assert np.isfinite(ins.log_evidence)
    assert ins.log_evidence != logz_before
