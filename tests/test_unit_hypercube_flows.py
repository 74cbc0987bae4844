"""Unit-hypercube flow support: tails=None RQS splines, uniform latent,
INS kwargs forwarding and the overridable hypercube prior.

Mirrors the reference features exercised by
``examples/importance_nested_sampler/nsf_unit_hypercube.py`` and
``hypercube_prior.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def cpu():
    return jax.devices("cpu")[0]


class TestTailsNoneSpline:
    def test_roundtrip_and_logdet(self, cpu):
        from nessai_tpu.flows.rqs import rational_quadratic_spline

        with jax.default_device(cpu):
            K = 8
            x = jax.random.uniform(
                jax.random.PRNGKey(0), (64,), minval=0.001, maxval=0.999
            )
            w = jax.random.normal(jax.random.PRNGKey(1), (64, K)) * 0.5
            h = jax.random.normal(jax.random.PRNGKey(2), (64, K)) * 0.5
            d = jax.random.normal(jax.random.PRNGKey(3), (64, K + 1)) * 0.5
            y, ld = rational_quadratic_spline(x, w, h, d, tails=None)
            assert bool(jnp.all((y >= 0) & (y <= 1)))
            xi, ldi = rational_quadratic_spline(
                y, w, h, d, inverse=True, tails=None
            )
            np.testing.assert_allclose(
                np.asarray(xi), np.asarray(x), atol=5e-6
            )
            np.testing.assert_allclose(
                np.asarray(ld + ldi), 0.0, atol=5e-5
            )
            # analytic log-det vs autodiff
            g = jax.vmap(
                jax.grad(
                    lambda xx, ww, hh, dd: rational_quadratic_spline(
                        xx, ww, hh, dd, tails=None
                    )[0]
                )
            )(x, w, h, d)
            np.testing.assert_allclose(
                np.asarray(jnp.log(g)), np.asarray(ld), atol=5e-5
            )

    def test_identity_at_zero_init_and_passthrough(self, cpu):
        from nessai_tpu.flows.rqs import rational_quadratic_spline

        with jax.default_device(cpu):
            K = 8
            x = jnp.array([0.1, 0.5, 0.9, -0.5, 1.5])
            y, ld = rational_quadratic_spline(
                x,
                jnp.zeros((5, K)),
                jnp.zeros((5, K)),
                jnp.zeros((5, K + 1)),
                tails=None,
            )
            # inside [0,1]: identity at zero init; outside: passthrough
            np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
            np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-5)

    def test_invalid_tails_raises(self):
        from nessai_tpu.flows.bijectors import RQSCoupling

        with pytest.raises(ValueError, match="Unknown tails"):
            RQSCoupling(np.array([1, 0]), n_neurons=4, tails="circular")


class TestUnitHypercubeNSF:
    def test_configure_model_forwards_tails(self, cpu):
        from nessai_tpu.flows.utils import configure_model

        cfg = dict(
            n_inputs=4,
            n_blocks=2,
            n_neurons=4,
            ftype="nsf",
            distribution="uniform",
            linear_transform=None,
            batch_norm_between_layers=False,
            tail_bound=1.0,
            tails=None,
            num_bins=8,
        )
        with jax.default_device(cpu):
            flow, params, _ = configure_model(cfg)
            for b in flow.bijector.bijectors:
                assert b.tails is None
            x = jnp.asarray(
                np.random.default_rng(0).uniform(size=(64, 4)), jnp.float32
            )
            lp = flow.log_prob(params, x)
            assert bool(jnp.all(jnp.isfinite(lp)))
            # outputs stay inside the box so the uniform base is finite
            z = flow.forward(params, x)[0]
            assert bool(jnp.all((z >= 0) & (z <= 1)))

    def test_training_stays_finite(self, cpu):
        import optax

        from nessai_tpu.flows.utils import configure_model

        cfg = dict(
            n_inputs=2,
            n_blocks=2,
            n_neurons=4,
            ftype="nsf",
            distribution="uniform",
            linear_transform=None,
            tails=None,
            num_bins=4,
        )
        with jax.default_device(cpu):
            flow, params, _ = configure_model(cfg)
            x = jnp.asarray(
                np.random.default_rng(1).beta(2, 5, size=(128, 2)),
                jnp.float32,
            )

            def loss(p):
                return -jnp.mean(flow.log_prob(p, x))

            opt = optax.adamw(5e-3)
            st = opt.init(params)
            for _ in range(25):
                l, g = jax.value_and_grad(loss)(params)
                up, st = opt.update(g, st, params)
                params = optax.apply_updates(params, up)
            assert np.isfinite(float(l))


class TestINSKwargsForwarding:
    def test_reparameterisation_reaches_proposal(self, tmp_path, model):
        from nessai_tpu.samplers.importancesampler import (
            ImportanceNestedSampler,
        )

        ins = ImportanceNestedSampler(
            model,
            nlive=100,
            min_samples=10,
            output=str(tmp_path),
            seed=1,
            plot=False,
            checkpointing=False,
            reparameterisation=None,
        )
        assert ins.proposal.reparameterisation is None

    def test_unknown_kwarg_raises(self, tmp_path, model):
        from nessai_tpu.samplers.importancesampler import (
            ImportanceNestedSampler,
        )

        with pytest.raises(TypeError):
            ImportanceNestedSampler(
                model,
                nlive=100,
                min_samples=10,
                output=str(tmp_path),
                plot=False,
                checkpointing=False,
                not_a_real_kwarg=1,
            )

    def test_reset_flow_interval(self, tmp_path, model):
        from nessai_tpu.proposal.importance import ImportanceFlowProposal

        p = ImportanceFlowProposal(
            model,
            output=str(tmp_path),
            flow_config=dict(n_blocks=2, n_neurons=4),
            reset_flow=2,
            rng=np.random.default_rng(0),
        )
        expected = {0: True, 1: False, 2: True, 3: False, 4: True}
        for level, exp in expected.items():
            p.level_count = level
            assert p._should_reset_flow is exp, level
        p.reset_flow = 0
        assert p._should_reset_flow is False
        p.reset_flow = 1
        assert p._should_reset_flow is True


class TestHypercubePriorOverride:
    def test_default_is_zero_inside(self, model):
        x = model.sample_unit_hypercube(8)
        out = model.batch_evaluate_log_prior_unit_hypercube(x)
        np.testing.assert_array_equal(out, 0.0)
        x["x_0"][0] = 1.5
        out = model.batch_evaluate_log_prior_unit_hypercube(x)
        assert out[0] == -np.inf
        assert np.all(out[1:] == 0.0)

    def test_override_is_consumed(self, rng):
        from scipy.stats import truncnorm

        from nessai_tpu.model import Model

        class NonUniformHypercube(Model):
            def __init__(self):
                self.names = ["a", "b"]
                self.bounds = {n: [-10.0, 10.0] for n in self.names}
                loc, h_scale = 0.5, 0.025
                self.dist = truncnorm(
                    (0 - loc) / h_scale,
                    (1 - loc) / h_scale,
                    loc=loc,
                    scale=h_scale,
                )

            def log_prior(self, x):
                return np.log(self.in_bounds(x), dtype=float)

            def log_likelihood(self, x):
                return np.zeros(len(np.atleast_1d(x)))

            def from_unit_hypercube(self, x):
                x_out = x.copy()
                for n in self.names:
                    x_out[n] = 20.0 * x[n] - 10.0
                return x_out

            def to_unit_hypercube(self, x):
                x_out = x.copy()
                for n in self.names:
                    x_out[n] = (x[n] + 10.0) / 20.0
                return x_out

            def log_prior_unit_hypercube(self, x):
                return np.log(
                    self.in_unit_hypercube(x), dtype=float
                ) + self.dist.logpdf(self.unstructured_view(x)).sum(axis=-1)

        m = NonUniformHypercube()
        m.set_rng(rng)
        x = m.sample_unit_hypercube(4)
        out = m.batch_evaluate_log_prior_unit_hypercube(x)
        expected = m.log_prior_unit_hypercube(x)
        np.testing.assert_array_equal(out, expected)
        assert not np.allclose(out, 0.0)


class TestCornerPlotSignature:
    def test_include_exclude(self, tmp_path, model, rng):
        import matplotlib

        matplotlib.use("Agg")
        from nessai_tpu.plot import corner_plot

        x = model.new_point(N=64)
        x["logL"] = rng.normal(size=64)
        fig = corner_plot(x, include=["x_0", "x_1"])
        assert fig is not None
        fig = corner_plot(x, exclude=["x_1"])
        assert fig is not None
        # constant field is dropped rather than crashing
        x["x_0"] = 1.0
        fig = corner_plot(x, include=["x_0", "x_1"])
        assert fig is not None


class TestINSPlots:
    def test_likelihood_levels_and_cdf_plots(self, tmp_path, model):
        """Periodic plots (state/trace/likelihood-levels) are produced
        during the loop and the level-CDF plot is written when enabled.
        Reference: ``importancesampler.py:1548,2163,944``."""
        import matplotlib

        matplotlib.use("Agg")
        import os

        from nessai_tpu.samplers.importancesampler import (
            ImportanceNestedSampler,
        )

        ins = ImportanceNestedSampler(
            model,
            nlive=100,
            min_samples=10,
            output=str(tmp_path),
            seed=2,
            plot=True,
            plotting_frequency=1,
            plot_level_cdf=True,
            checkpointing=False,
            min_iteration=2,
            max_iteration=3,
            flow_config=dict(n_blocks=2, n_neurons=4),
            training_config=dict(max_epochs=5, patience=3, batch_size=50),
        )
        ins.nested_sampling_loop()
        assert os.path.exists(tmp_path / "likelihood_levels.png")
        assert os.path.exists(tmp_path / "state.png")
        assert os.path.exists(tmp_path / "trace.png")
        cdfs = list((tmp_path / "levels").glob("level_cdf_*.png"))
        assert cdfs, "no level CDF plots written"
        # direct figure return without filename
        fig = ins.plot_likelihood_levels()
        assert fig is not None


class TestFlowSamplerRunParity:
    def test_result_extension_json(self, tmp_path, model):
        import json
        import os

        from nessai_tpu.flowsampler import FlowSampler

        fs = FlowSampler(
            model,
            output=str(tmp_path),
            resume=False,
            seed=3,
            nlive=100,
            plot=False,
            checkpointing=False,
            max_iteration=60,
            maximum_uninformed=30,
            result_extension="json",
            flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
            training_config=dict(max_epochs=3, patience=2, batch_size=50),
            poolsize=100,
        )
        fs.run(plot=False, save=True)
        path = os.path.join(str(tmp_path), "result.json")
        assert os.path.exists(path)
        with open(path) as f:
            d = json.load(f)
        assert "log_evidence" in d or "logZ" in d

    def test_ins_run_kwargs(self, tmp_path, model):
        """plot_posterior / compute_initial_posterior are accepted and
        the initial posterior is only computed when requested
        (reference ``flowsampler.py:453-560``)."""
        from nessai_tpu.flowsampler import FlowSampler

        fs = FlowSampler(
            model,
            output=str(tmp_path),
            resume=False,
            seed=4,
            nlive=100,
            min_samples=10,
            plot=False,
            checkpointing=False,
            importance_nested_sampler=True,
            min_iteration=1,
            max_iteration=2,
            flow_config=dict(n_blocks=2, n_neurons=4),
            training_config=dict(max_epochs=3, patience=2, batch_size=50),
        )
        fs.run(
            plot=False,
            save=False,
            redraw_samples=True,
            n_posterior_samples=50,
            compute_initial_posterior=True,
        )
        assert hasattr(fs, "initial_posterior_samples")
        assert len(fs.posterior_samples)
