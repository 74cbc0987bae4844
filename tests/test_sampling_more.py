"""Additional integration coverage: efficiency regression guard, INS
threshold/step variants, experimental proposals in the full loop."""

import numpy as np
import pytest

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.mark.slow_integration_test
def test_sampling_efficiency_guard(tmp_path):
    """Likelihood evaluations per iteration must stay bounded — catches
    silent efficiency regressions in the proposal."""
    model = IntegrationTestModel(2)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=500,
        seed=1234,
        resume=False,
        plot=False,
        checkpointing=False,
        flow_config=dict(n_blocks=4, n_neurons="auto", n_layers=2),
        training_config=dict(max_epochs=100, patience=20, batch_size=500),
        poolsize=500,
    )
    fs.run(plot=False, save=False)
    evals_per_it = fs.ns.total_likelihood_evaluations / fs.ns.iteration
    assert evals_per_it < 15, f"evals/iteration too high: {evals_per_it}"
    # and the run must still be accurate
    assert abs(fs.logZ - model.analytic_log_evidence) < 3 * max(
        fs.log_evidence_error, 0.05
    )


@pytest.mark.integration_test
def test_ins_quantile_threshold_and_n_update(tmp_path, flow_config, training_config):
    model = IntegrationTestModel(2)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        importance_nested_sampler=True,
        nlive=200,
        min_samples=100,
        seed=31,
        resume=False,
        plot=False,
        max_iteration=2,
        threshold_method="quantile",
        threshold_kwargs={"q": 0.7},
        flow_config=flow_config,
        training_config=training_config,
        draw_iid_live=False,
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)

    fs2 = FlowSampler(
        IntegrationTestModel(2),
        output=str(tmp_path) + "_b",
        importance_nested_sampler=True,
        nlive=200,
        min_samples=100,
        seed=32,
        resume=False,
        plot=False,
        max_iteration=2,
        n_update=50,
        flow_config=flow_config,
        training_config=training_config,
        draw_iid_live=False,
    )
    fs2.run(plot=False, save=False)
    assert np.isfinite(fs2.logZ)


@pytest.mark.integration_test
@pytest.mark.parametrize("step_type", ["gaussian", "stretch"])
def test_mcmc_step_types(model, rng, tmp_path, flow_config, training_config, step_type):
    from nessai_tpu.experimental.proposal import MCMCFlowProposal

    fp = MCMCFlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        n_steps=5,
        step_type=step_type,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
        precompile=False,
    )
    fp.initialise()
    x = model.new_point(150)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    fp.populate(x[np.argsort(x["logL"])][30], n_samples=100)
    assert fp.populated
    assert 0 <= fp.population_acceptance <= 1


@pytest.mark.integration_test
def test_clustering_proposal_full_run(tmp_path, training_config):
    model = IntegrationTestModel(2)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=100,
        seed=33,
        resume=False,
        plot=False,
        max_iteration=100,
        maximum_uninformed=40,
        flow_class="clusteringflowproposal",
        max_clusters=3,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=training_config,
        poolsize=100,
        precompile=False,
    )
    fs.run(plot=False, save=False)
    assert fs.ns._flow_proposal.training_count >= 1
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_regex_reparameterisation_spec(tmp_path, flow_config, training_config):
    model = IntegrationTestModel(4)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=100,
        seed=34,
        resume=False,
        plot=False,
        max_iteration=30,
        maximum_uninformed=10000,
        reparameterisations={"zscore": {"parameters": [r"x_\d+"]}},
        fallback_reparameterisation=None,
        flow_config=flow_config,
        training_config=training_config,
        poolsize=100,
    )
    fs.run(plot=False, save=False)
    reparam = list(fs.ns._flow_proposal._reparameterisation.values())[0]
    assert sorted(reparam.parameters) == sorted(model.names)


def test_sampling_with_infinite_prior_bounds(
    tmp_path, flow_config, training_config
):
    """Reference test_standard_sampling.py:511 — a parameter with
    infinite prior bounds samples fine with reparameterisation None."""
    from scipy.stats import norm

    from nessai_tpu.livepoint import numpy_array_to_live_points
    from nessai_tpu.model import Model

    class InfModel(Model):
        names = ["x", "y"]
        bounds = {"x": [0, 1], "y": [-np.inf, np.inf]}
        reparameterisations = {"x": "default", "y": None}

        def new_point(self, N=1):
            arr = np.concatenate(
                [
                    self.rng.random((N, 1)),
                    self.rng.standard_normal((N, 1)),
                ],
                axis=1,
            )
            return numpy_array_to_live_points(arr, self.names)

        def new_point_log_prob(self, x):
            return self.log_prior(x)

        def log_prior(self, x):
            log_p = np.log(self.in_bounds(x), dtype=float)
            log_p += norm.logpdf(x["y"])
            return log_p

        def log_likelihood(self, x):
            log_l = np.zeros(x.size)
            for n in self.names:
                log_l += norm.logpdf(x[n])
            return log_l

    fs = FlowSampler(
        InfModel(),
        output=str(tmp_path),
        nlive=100,
        seed=5,
        resume=False,
        plot=False,
        flow_config=flow_config,
        training_config=training_config,
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)
    assert fs.logZ_error > 0


def test_sampling_truncate_log_q(tmp_path, flow_config, training_config):
    """Reference test_standard_sampling.py truncate_log_q run."""
    fs = FlowSampler(
        IntegrationTestModel(2),
        output=str(tmp_path),
        nlive=100,
        seed=11,
        resume=False,
        plot=False,
        max_iteration=40,
        maximum_uninformed=10000,
        truncate_log_q=True,
        flow_config=flow_config,
        training_config=training_config,
        poolsize=100,
    )
    fs.run(plot=False, save=False)
    assert "min_log_q" in fs.ns._flow_proposal.truncation_methods
    assert np.isfinite(fs.logZ)


def test_invalid_keyword_argument(tmp_path):
    """Reference test_standard_sampling.py:733 — unknown proposal kwargs
    raise a RuntimeError naming the offending keys."""
    with pytest.raises(
        RuntimeError,
        match=r"Unknown kwargs for FlowProposal: {'not_a_valid_kwarg'}.",
    ):
        FlowSampler(
            IntegrationTestModel(2),
            output=str(tmp_path),
            resume=False,
            nlive=100,
            not_a_valid_kwarg=True,
        )
