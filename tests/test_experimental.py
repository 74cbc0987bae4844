"""Tests for experimental components: MCMC proposal, clustering."""

import numpy as np
import pytest

from nessai_tpu.experimental.flowmodel.clustering import (
    ClusteringFlowModel,
    kmeans,
    silhouette_score,
)
from nessai_tpu.experimental.proposal import (
    ClusteringFlowProposal,
    MCMCFlowProposal,
)
from nessai_tpu.experimental.proposal.mcmc.steps import (
    DifferentialEvolutionStep,
    GaussianStep,
    StretchStep,
)


def _two_blobs(rng, n=200):
    x = rng.normal(size=(n, 2)).astype(np.float32)
    x[: n // 2] += 4.0
    x[n // 2 :] -= 4.0
    return x


def test_kmeans_two_blobs(rng):
    x = _two_blobs(rng)
    centres, labels = kmeans(x, 2, rng=rng)
    assert centres.shape == (2, 2)
    # the two blobs should be separated
    score = silhouette_score(x, labels)
    assert score > 0.5


@pytest.mark.parametrize(
    "step_cls", [GaussianStep, DifferentialEvolutionStep, StretchStep]
)
def test_mcmc_steps_shapes(rng, step_cls):
    step = step_cls(3, rng=rng)
    z = rng.normal(size=(50, 3))
    z_new, log_ratio = step.propose(z)
    assert z_new.shape == z.shape
    assert log_ratio.shape == (50,)
    step.update(0.3)


def test_gaussian_step_adapts(rng):
    step = GaussianStep(2, rng=rng)
    s0 = step.sigma
    step.update(0.9)  # too high acceptance -> increase scale
    assert step.sigma > s0


def test_mcmc_flow_proposal(model, rng, tmp_path, flow_config, training_config):
    fp = MCMCFlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        n_steps=5,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
    )
    fp.initialise()
    x = model.new_point(200)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    worst = x[np.argsort(x["logL"])][50]
    fp.populate(worst, n_samples=100)
    assert fp.populated
    assert len(fp.samples) == 100
    assert model.in_bounds(fp.samples).all()
    assert 0 <= fp.population_acceptance <= 1
    s = fp.draw(worst)
    assert np.isfinite(s["logL"])


def test_clustering_flow_model(rng, tmp_path):
    fm = ClusteringFlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64),
        output=str(tmp_path),
        rng=rng,
        max_clusters=4,
    )
    x = _two_blobs(rng, 256)
    fm.train(x)
    assert fm.n_clusters >= 2
    lp = fm.log_prob_marginalised(x[:32])
    assert lp.shape == (32,)
    assert np.isfinite(lp).all()
    labels = fm.sample_labels(16)
    assert labels.max() < fm.n_clusters


def test_clustering_flow_proposal(model, rng, tmp_path, flow_config, training_config):
    fp = ClusteringFlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        max_clusters=3,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
    )
    fp.initialise()
    x = model.new_point(200)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    fp.populate(x[np.argmin(x["logL"])], n_samples=50)
    assert fp.populated
    assert len(fp.samples) > 0
    assert model.in_bounds(fp.samples).all()


# ----------------------------------------------------------------------
# MCMC autocorrelation utilities (reference mcmc/utils.py)
# ----------------------------------------------------------------------
def test_next_pow_two():
    from nessai_tpu.experimental.proposal.mcmc.utils import next_pow_two

    assert [next_pow_two(n) for n in (1, 2, 3, 5, 8, 1000)] == [
        1, 2, 4, 8, 8, 1024,
    ]


def test_function_1d_white_noise(rng):
    from nessai_tpu.experimental.proposal.mcmc.utils import function_1d

    x = rng.standard_normal(4096)
    acf = function_1d(x)
    assert acf[0] == 1.0
    assert np.abs(acf[10:100]).max() < 0.1
    with pytest.raises(ValueError):
        function_1d(np.zeros((4, 4)))


def test_integrated_time_ar1(rng):
    """AR(1) with coefficient rho has tau = (1 + rho) / (1 - rho)."""
    from nessai_tpu.experimental.proposal.mcmc.utils import integrated_time

    rho = 0.9
    n_t, n_w = 20000, 8
    x = np.zeros((n_t, n_w, 2))
    eps = rng.standard_normal((n_t, n_w, 2))
    for t in range(1, n_t):
        x[t] = rho * x[t - 1] + eps[t]
    tau = integrated_time(x)
    expected = (1 + rho) / (1 - rho)  # = 19
    assert tau.shape == (2,)
    np.testing.assert_allclose(tau, expected, rtol=0.25)
    with pytest.raises(ValueError):
        integrated_time(np.zeros((10, 2)))


def test_get_glasflow_class():
    from nessai_tpu.experimental.flows import get_glasflow_class
    from nessai_tpu.flows.utils import get_native_flow_class

    assert (
        get_glasflow_class("glasflow-realnvp")
        is get_native_flow_class("glasflow-realnvp")
    )
    with pytest.raises(ValueError, match="missing from name"):
        get_glasflow_class("realnvp")
    with pytest.raises(ValueError, match="not a known glasflow flow"):
        get_glasflow_class("glasflow-doesnotexist")


def test_step_class_alias():
    from nessai_tpu.experimental.proposal.mcmc.steps import MCMCStep, Step

    assert Step is MCMCStep
