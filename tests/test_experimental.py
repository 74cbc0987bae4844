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
