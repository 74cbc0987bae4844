"""API-surface parity additions (from the reference-vs-repo audit).

Covers: final-evidence propagation after the INS redraw,
check_new_point_methods, discrete_parameters, registry introspection
helpers, flows/utils reference-name aliases, sanitise_array,
get_logx_live_points and combined.reset_inversion.
"""

import numpy as np
import pytest

from nessai_tpu import config
from nessai_tpu.model import Model, ModelError


class TestModelSurface:
    def test_discrete_parameters(self, model):
        assert model.discrete_parameters is None
        assert model.has_discrete_parameters is False
        model.discrete_parameters = ["x_0"]
        assert model.has_discrete_parameters is True
        assert model.discrete_parameters == ["x_0"]

    def test_check_new_point_methods_ok(self, model):
        model.check_new_point_methods()

    def test_check_new_point_methods_raises(self):
        class Bad(Model):
            names = ["a", "b"]
            bounds = {"a": [0, 1], "b": [0, 1]}

            def log_prior(self, x):
                return np.zeros(len(np.atleast_1d(x)))

            def log_likelihood(self, x):
                return np.zeros(len(np.atleast_1d(x)))

            def new_point(self, N=1):
                return super().new_point(N=N)

        with pytest.raises(ModelError, match="new_point_log_prob"):
            Bad.check_new_point_methods()

    def test_both_redefined_ok(self):
        class Good(Model):
            names = ["a", "b"]
            bounds = {"a": [0, 1], "b": [0, 1]}

            def log_prior(self, x):
                return np.zeros(len(np.atleast_1d(x)))

            def log_likelihood(self, x):
                return np.zeros(len(np.atleast_1d(x)))

            def new_point(self, N=1):
                return super(Good, self).new_point(N=N)

            def new_point_log_prob(self, x):
                return super(Good, self).new_point_log_prob(x)

        Good.check_new_point_methods()


class TestRegistries:
    def test_stopping_criteria_list_available(self):
        from nessai_tpu.stopping_criteria import StoppingCriterionRegistry

        names = StoppingCriterionRegistry.list_available()
        assert "dlogz" in names
        assert "ratio" in names

    def test_available_base_flow_proposal_classes(self):
        from nessai_tpu.proposal.utils import (
            available_base_flow_proposal_classes,
        )

        classes = available_base_flow_proposal_classes()
        assert "flowproposal" in classes
        assert "augmentedflowproposal" in classes
        assert "mcmcflowproposal" in classes
        assert "clusteringflowproposal" in classes

    def test_available_external_flow_proposal_classes(self):
        from nessai_tpu.proposal.utils import (
            available_external_flow_proposal_classes,
        )

        out = available_external_flow_proposal_classes()
        assert isinstance(out, dict)


class TestFlowUtilsAliases:
    def test_get_flow_class(self):
        from nessai_tpu.flows.utils import (
            get_flow_class,
            get_native_flow_class,
        )

        assert get_flow_class("realnvp") is get_native_flow_class("realnvp")

    def test_get_activation_function(self):
        import jax

        from nessai_tpu.flows.utils import get_activation_function

        assert get_activation_function("relu") is jax.nn.relu
        assert get_activation_function("silu") is jax.nn.silu
        with pytest.raises(ValueError):
            get_activation_function("gelu6")

    def test_create_linear_transform(self):
        from nessai_tpu.flows.bijectors import (
            LULinear,
            Permutation,
            SVDLinear,
        )
        from nessai_tpu.flows.utils import create_linear_transform

        assert create_linear_transform(None, 4) == []
        out = create_linear_transform("lu", 4)
        assert isinstance(out[0], Permutation)
        assert isinstance(out[1], LULinear)
        out = create_linear_transform("svd", 4)
        assert isinstance(out[1], SVDLinear)
        with pytest.raises(ValueError):
            create_linear_transform("qr", 4)

    def test_create_pre_transform(self):
        from nessai_tpu.flows.bijectors import ActNorm, Logit
        from nessai_tpu.flows.utils import create_pre_transform

        assert isinstance(create_pre_transform("logit", 4), Logit)
        assert isinstance(create_pre_transform("batch_norm", 4), ActNorm)
        with pytest.raises(ValueError):
            create_pre_transform("affine", 4)

    def test_get_base_distribution(self):
        from nessai_tpu.flows.distributions import (
            MultivariateUniform,
            StandardNormal,
        )
        from nessai_tpu.flows.utils import get_base_distribution

        assert isinstance(get_base_distribution(4, None), StandardNormal)
        assert isinstance(
            get_base_distribution(4, "uniform"), MultivariateUniform
        )
        inst = StandardNormal(4)
        assert get_base_distribution(4, inst) is inst


class TestPlotEvidenceHelpers:
    def test_sanitise_array(self):
        from nessai_tpu.plot import sanitise_array

        a = np.array([-np.inf, -1e20, 0.0, 5.0])
        out = sanitise_array(a)
        assert out.min() == config.plotting.clip_min
        out = sanitise_array(a, a_min=-1.0, a_max=1.0)
        np.testing.assert_array_equal(out, [-1.0, -1.0, 0.0, 1.0])

    def test_get_logx_live_points(self):
        from nessai_tpu.evidence import _NSIntegralState

        state = _NSIntegralState(100)
        for logl in np.linspace(-10, -1, 50):
            state.increment(logl)
        log_x = state.get_logx_live_points(100)
        assert log_x.shape == (100,)
        # strictly decreasing volumes starting below the current logw
        assert np.all(np.diff(log_x) < 0)
        assert log_x[0] < state.logw

    def test_ins_state_logz_alias(self):
        from nessai_tpu.evidence import _INSIntegralState

        state = _INSIntegralState()
        assert state.logZ == state.log_evidence


class TestCombinedResetInversion:
    def test_reset_inversion_passthrough(self):
        from nessai_tpu.reparameterisations import get_reparameterisation
        from nessai_tpu.reparameterisations.combined import (
            CombinedReparameterisation,
        )

        cls, kwargs = get_reparameterisation("inversion")
        kwargs.pop("boundary_inversion", None)
        r = cls(
            parameters=["a"],
            prior_bounds={"a": [0.0, 1.0]},
            boundary_inversion=True,
            **kwargs,
        )
        c = CombinedReparameterisation([r])
        # no error and state cleared
        c.reset_inversion()


class TestFinalEvidencePropagation:
    def test_flowsampler_logz_prefers_final(self, tmp_path, model):
        """After an INS final redraw, FlowSampler.logZ must report the
        redrawn (final) evidence (reference ``flowsampler.py:522``)."""
        from nessai_tpu.flowsampler import FlowSampler

        fs = FlowSampler(
            model,
            output=str(tmp_path),
            resume=False,
            seed=11,
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
            plot=False, save=False, redraw_samples=True,
            n_posterior_samples=50,
        )
        assert fs.ns.final_log_evidence is not None
        assert fs.logZ == fs.ns.final_log_evidence
        assert fs.log_evidence_error == fs.ns.final_log_evidence_error
        assert hasattr(fs, "initial_logZ")
        assert fs.initial_logZ == fs.ns.log_evidence

    def test_check_resume(self, tmp_path, model):
        from nessai_tpu.flowsampler import FlowSampler

        fs = FlowSampler(
            model,
            output=str(tmp_path),
            resume=False,
            seed=1,
            nlive=100,
            plot=False,
            checkpointing=False,
            flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        )
        assert not fs.check_resume("nope.pkl", None)
        assert fs.check_resume("nope.pkl", resume_data={"x": 1})
        (tmp_path / "there.pkl").write_bytes(b"")
        assert fs.check_resume("there.pkl", None)


class TestUtilsParity:
    def test_save_live_points(self, tmp_path, rng):
        import json

        from nessai_tpu.livepoint import numpy_array_to_live_points
        from nessai_tpu.utils.io import save_live_points

        x = numpy_array_to_live_points(rng.normal(size=(4, 2)), ["a", "b"])
        path = tmp_path / "lp.json"
        save_live_points(x, str(path))
        with open(path) as f:
            d = json.load(f)
        np.testing.assert_allclose(d["a"], x["a"])

    def test_logistic_function(self):
        from nessai_tpu.utils.rescaling import logistic_function

        assert logistic_function(0.0) == 0.5
        assert logistic_function(0.0, x0=1.0, k=2.0) == pytest.approx(
            1 / (1 + np.exp(2.0))
        )

    def test_log_exp_with_jacobian_roundtrip(self, rng):
        from nessai_tpu.utils.rescaling import (
            exp_with_log_jacobian,
            log_with_log_jacobian,
        )

        x = rng.uniform(0.1, 5.0, 16)
        y, lj = log_with_log_jacobian(x)
        x2, lj2 = exp_with_log_jacobian(y)
        np.testing.assert_allclose(x2, x)
        np.testing.assert_allclose(lj + lj2, 0.0, atol=1e-12)
        # jacobian matches the derivative
        np.testing.assert_allclose(lj, -np.log(x))

    def test_replace_in_list(self):
        from nessai_tpu.utils.structures import replace_in_list

        lst = ["a", "b", "c"]
        replace_in_list(lst, "b", "x")
        assert lst == ["a", "x", "c"]
        replace_in_list(lst, ["a", "c"], ["p", "q"])
        assert lst == ["p", "x", "q"]
        with pytest.raises(RuntimeError, match="different lengths"):
            replace_in_list(lst, ["p"], ["y", "z"])
        with pytest.raises(ValueError, match="not in list"):
            replace_in_list(lst, "missing", "y")


class TestProfiling:
    def test_profile_region_disabled_noop(self):
        from nessai_tpu.utils.profiling import profile_region

        with profile_region("/tmp/should-not-exist", enabled=False):
            pass

    def test_profile_region_captures(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from nessai_tpu.utils.profiling import annotate, profile_region

        with jax.default_device(jax.devices("cpu")[0]):
            with profile_region(str(tmp_path)):
                with annotate("test-span"):
                    jnp.sum(jnp.arange(8.0)).block_until_ready()
        # a trace directory should have been written
        assert any(tmp_path.iterdir())


class TestProgramFingerprintInstanceData:
    def test_different_data_different_fingerprint(self):
        from nessai_tpu.model import Model

        class DataModel(Model):
            names = ["x", "y"]
            bounds = {"x": [-10.0, 10.0], "y": [-10.0, 10.0]}

            def __init__(self, obs):
                self.obs = np.asarray(obs, float)

            def log_prior(self, x):
                return np.log(self.in_bounds(x), dtype=float)

            def log_likelihood(self, x):
                u = self.unstructured_view(np.atleast_1d(x)).reshape(-1, 2)
                return -0.5 * np.sum((u - self.obs) ** 2, axis=-1)

            def jax_log_likelihood(self, x):
                import jax.numpy as jnp

                return -0.5 * jnp.sum(
                    (x - jnp.asarray(self.obs)) ** 2, axis=-1
                )

        a = DataModel([0.0, 0.0])
        b = DataModel([2.0, -2.0])
        assert a.program_fingerprint != b.program_fingerprint
        assert (
            DataModel([0.0, 0.0]).program_fingerprint
            == a.program_fingerprint
        )

    def test_counters_do_not_change_fingerprint(self, model):
        fp = model.program_fingerprint
        model.likelihood_evaluations += 100
        assert model.program_fingerprint == fp

    def test_cached_programs_respect_instance_data(self, rng):
        """Two same-class models with different observed data must not
        share a compiled likelihood (the original silent-staleness
        failure mode)."""
        import jax

        from nessai_tpu.model import Model

        class DataModel(Model):
            names = ["x", "y"]
            bounds = {"x": [-10.0, 10.0], "y": [-10.0, 10.0]}

            def __init__(self, obs):
                self.obs = np.asarray(obs, float)

            def log_prior(self, x):
                return np.log(self.in_bounds(x), dtype=float)

            def log_likelihood(self, x):
                u = self.unstructured_view(np.atleast_1d(x)).reshape(-1, 2)
                return -0.5 * np.sum((u - self.obs) ** 2, axis=-1)

            def jax_log_likelihood(self, x):
                import jax.numpy as jnp

                return -0.5 * jnp.sum(
                    (x - jnp.asarray(self.obs)) ** 2, axis=-1
                )

        from nessai_tpu.livepoint import numpy_array_to_live_points

        pts = numpy_array_to_live_points(
            rng.normal(size=(8, 2)), ["x", "y"]
        )
        with jax.default_device(jax.devices("cpu")[0]):
            a = DataModel([0.0, 0.0])
            b = DataModel([3.0, 3.0])
            la = a.batch_evaluate_log_likelihood(pts)
            lb = b.batch_evaluate_log_likelihood(pts)
        np.testing.assert_allclose(la, a.log_likelihood(pts), atol=1e-5)
        np.testing.assert_allclose(lb, b.log_likelihood(pts), atol=1e-5)
        assert not np.allclose(la, lb)


class TestSmallParityAdditions:
    def test_combined_order_properties(self):
        from nessai_tpu.reparameterisations import get_reparameterisation
        from nessai_tpu.reparameterisations.combined import (
            CombinedReparameterisation,
        )

        cls, kw = get_reparameterisation("default")
        r0 = cls(parameters=["a"], prior_bounds={"a": [0, 1]}, **kw)
        cls, kw = get_reparameterisation("default")
        r1 = cls(parameters=["b"], prior_bounds={"b": [0, 1]}, **kw)
        c = CombinedReparameterisation([r0, r1])
        assert c.to_prime_order == list(reversed(c.from_prime_order))
        c2 = CombinedReparameterisation([r0, r1], reverse_order=True)
        assert c2.to_prime_order == list(reversed(c.to_prime_order))

    def test_ins_checkpoint_refuses_mid_iteration(
        self, tmp_path, model, caplog
    ):
        import os

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
            checkpointing=True,
        )
        with caplog.at_level("WARNING"):
            ins.checkpoint(periodic=False, force=True)
        assert "cannot checkpoint mid iteration" in caplog.text
        assert not os.path.exists(ins.resume_file)
        ins.checkpoint(periodic=True, force=True)
        assert os.path.exists(ins.resume_file)


class TestRound3KwargParity:
    """Plugin-facing kwargs closed in round 3 (VERDICT item 7)."""

    def test_nested_sampler_flow_proposal_class_alias(self, model, tmp_path):
        from nessai_tpu.proposal import FlowProposal
        from nessai_tpu.samplers.nestedsampler import NestedSampler

        ns = NestedSampler(
            model,
            nlive=50,
            output=str(tmp_path),
            seed=1,
            plot=False,
            flow_proposal_class=FlowProposal,
        )
        assert isinstance(ns._flow_proposal, FlowProposal)

    def test_nested_sampler_both_flow_class_names_error(self, model, tmp_path):
        from nessai_tpu.proposal import FlowProposal
        from nessai_tpu.samplers.nestedsampler import NestedSampler

        with pytest.raises(RuntimeError, match="only one of"):
            NestedSampler(
                model,
                nlive=50,
                output=str(tmp_path),
                seed=1,
                plot=False,
                flow_class=FlowProposal,
                flow_proposal_class=FlowProposal,
            )

    def test_trace_parameters(self, model, tmp_path):
        from nessai_tpu.samplers.nestedsampler import NestedSampler

        ns = NestedSampler(
            model, nlive=50, output=str(tmp_path), seed=1, plot=False
        )
        assert ns.trace_parameters == list(model.names)
        ns2 = NestedSampler(
            model,
            nlive=50,
            output=str(tmp_path),
            seed=1,
            plot=False,
            trace_parameters=["x_0"],
        )
        assert ns2.trace_parameters == ["x_0"]

    def test_ins_extra_plot_kwargs(self, model, tmp_path):
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
            plot_extra_state=True,
            trace_plot_kwargs={"labels": ["a", "b"]},
            save_existing_checkpoint=True,
        )
        assert ins._plot_extra_state is True
        assert ins.trace_plot_kwargs == {"labels": ["a", "b"]}
        assert ins.save_existing_checkpoint is True
        # default matches the reference (False)
        ins2 = ImportanceNestedSampler(
            model,
            nlive=100,
            min_samples=10,
            output=str(tmp_path),
            seed=1,
            plot=False,
        )
        assert ins2.save_existing_checkpoint is False

    def test_flowsampler_eps(self, model, tmp_path):
        from nessai_tpu import config
        from nessai_tpu.flowsampler import FlowSampler

        old = config.general.eps
        try:
            fs = FlowSampler(
                model,
                output=str(tmp_path),
                resume=False,
                seed=1,
                nlive=50,
                plot=False,
                eps=1e-6,
            )
            assert fs.eps == 1e-6
            assert config.general.eps == 1e-6
        finally:
            config.general.eps = old

    def test_flowsampler_weights_kwargs_accepted(self, model, tmp_path):
        import inspect

        from nessai_tpu.flowsampler import FlowSampler

        sig = inspect.signature(FlowSampler.__init__)
        for k in ("weights_file", "weights_path", "eps"):
            assert k in sig.parameters

    def test_vectorised_prior_unit_hypercube(self, model):
        assert model.vectorised_prior_unit_hypercube is True
        model.vectorised_prior_unit_hypercube = False
        assert model.vectorised_prior_unit_hypercube is False

    def test_allow_vectorised_prior_disables_detection(self, rng):
        from nessai_tpu.utils.testing import IntegrationTestModel

        m = IntegrationTestModel(2)
        m.set_rng(rng)
        m.allow_vectorised_prior = False
        assert m.vectorised_prior is False
        assert m.vectorised_prior_unit_hypercube is False

    def test_compute_evidence_ratio_deprecated_alias(self, rng):
        import numpy.lib.recfunctions as rfn

        from nessai_tpu.evidence import _INSIntegralState
        from nessai_tpu.livepoint import numpy_array_to_live_points

        def samples(n):
            x = numpy_array_to_live_points(
                rng.standard_normal((n, 2)), ["x", "y"]
            )
            x = rfn.append_fields(
                x,
                ["logW", "logQ"],
                [rng.standard_normal(n), rng.standard_normal(n)],
                usemask=False,
            )
            x["logL"] = rng.standard_normal(n)
            return x

        s = _INSIntegralState()
        s.update_evidence(samples(4), live_points=samples(2))
        with pytest.warns(DeprecationWarning, match="deprecated"):
            out = s.compute_evidence_ratio()
        assert out == s.compute_log_evidence_ratio()

    def test_ins_plot_extra_state_method(self, model, tmp_path):
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
        )
        # no history yet -> returns None without error
        assert ins.plot_extra_state() is None


# ---------------------------------------------------------------------------
# round-3 signature-audit batch (AST diff vs reference)
# ---------------------------------------------------------------------------
class TestSignatureAuditBatch:
    @pytest.fixture()
    def simple_model(self, rng):
        from nessai_tpu.utils.testing import IntegrationTestModel

        m = IntegrationTestModel(2)
        m.set_rng(rng)
        return m

    def test_flowsampler_torch_dtype(self, simple_model, tmp_path):
        from nessai_tpu import config
        from nessai_tpu.flowsampler import FlowSampler

        before = config.compute.default_dtype
        try:
            fs = FlowSampler(
                simple_model,
                output=str(tmp_path),
                resume=False,
                nlive=100,
                torch_dtype="float32",
            )
            assert fs.torch_dtype == "float32"
            with pytest.raises(ValueError, match="Unknown torch_dtype"):
                FlowSampler(
                    simple_model,
                    output=str(tmp_path),
                    resume=False,
                    nlive=100,
                    torch_dtype="float16",
                )
        finally:
            config.compute.default_dtype = before

    def test_sampler_pool_kwargs(self, simple_model, tmp_path):
        from nessai_tpu.samplers.nestedsampler import NestedSampler

        ns = NestedSampler(
            simple_model,
            output=str(tmp_path),
            nlive=100,
            plot=False,
            checkpointing=False,
            n_pool=2,
            close_pool=True,
        )
        assert ns.n_pool == 2
        assert ns._close_pool is True
        ns.model.close_pool()

    def test_configure_flow_reset_errors(self, simple_model, tmp_path):
        from nessai_tpu.samplers.nestedsampler import NestedSampler

        ns = NestedSampler(
            simple_model,
            output=str(tmp_path),
            nlive=100,
            plot=False,
            checkpointing=False,
        )
        with pytest.raises(TypeError, match="reset_weights"):
            ns.configure_flow_reset("bad", False, False)
        with pytest.raises(TypeError, match="reset_permutations"):
            ns.configure_flow_reset(False, "bad", False)
        with pytest.raises(TypeError, match="reset_flow"):
            ns.configure_flow_reset(False, False, "bad")
        ns.configure_flow_reset(False, False, 4)
        assert ns.reset_weights == 4.0
        assert ns.reset_permutations == 4.0

    def test_mcmc_proposal_reference_kwargs(self, simple_model, tmp_path):
        from nessai_tpu.experimental.proposal import MCMCFlowProposal

        p = MCMCFlowProposal(
            simple_model,
            output=str(tmp_path),
            poolsize=50,
            n_accept=5,
            plot_chain=False,
            plot_history=False,
            enforce_likelihood_threshold=False,
            ensemble_fraction=0.5,
        )
        assert p.n_accept == 5
        assert p.enforce_likelihood_threshold is False
        assert p.mcmc_history == {"acceptance": [], "n_steps": []}
        with pytest.raises(ValueError, match="ensemble_fraction"):
            MCMCFlowProposal(
                simple_model, poolsize=50, ensemble_fraction=0.0
            )

    def test_mcmc_steps_reference_api(self, rng):
        from nessai_tpu.experimental.proposal.mcmc.steps import (
            DifferentialEvolutionStep,
            GaussianStep,
            Step,
            StretchStep,
        )

        z = rng.standard_normal((16, 2))
        g = GaussianStep(
            2, scale=0.5, update_scale=True, target_acceptance=0.5, rng=rng
        )
        assert g.scale == 0.5
        z_new, ratio = g(z)  # __call__ == step == propose
        assert z_new.shape == z.shape
        g.update_stats(8, 8)
        assert g.n_accept == 8

        ens = rng.standard_normal((8, 2))
        d = DifferentialEvolutionStep(2, ensemble=ens, sigma=1e-4, rng=rng)
        z_new, _ = d.step(z)
        assert z_new.shape == z.shape

        s = StretchStep(2, ensemble=ens, scale=2.0, rng=rng)
        z_new, ratio = s.step(z)
        assert z_new.shape == z.shape
        assert ratio.shape == (16,)
        assert issubclass(GaussianStep, Step)

    def test_combined_initial_parameters(self):
        from nessai_tpu.reparameterisations import (
            CombinedReparameterisation,
            RescaleToBounds,
        )

        r = RescaleToBounds(parameters=["x"], prior_bounds={"x": [0, 1]})
        c = CombinedReparameterisation(initial_parameters=["ext"])
        c.add_reparameterisations(r)
        assert c.initial_parameters == ["ext"]

    def test_reparameterisation_multispace_kwargs(self):
        from nessai_tpu.reparameterisations import (
            RescaleToBounds,
            ScaleAndShift,
        )
        from nessai_tpu.reparameterisations.angle import Angle, AnglePair

        s = ScaleAndShift(
            input_parameters=["a"],
            output_parameters=["a_s"],
            prior_bounds={"a": [0, 1]},
            scale=2.0,
        )
        assert s.parameters == ["a"]
        r = RescaleToBounds(
            input_parameters=["b"], prior_bounds={"b": [0, 1]}
        )
        assert r.parameters == ["b"]
        a = Angle(
            input_parameters=["phi"],
            prior_bounds={"phi": [0, 2 * np.pi]},
        )
        assert a.parameters == ["phi"]
        ap = AnglePair(
            input_parameters=["ra", "dec"],
            prior_bounds={
                "ra": [0, 2 * np.pi],
                "dec": [-np.pi / 2, np.pi / 2],
            },
        )
        assert sorted(ap.parameters) == ["dec", "ra"]

    def test_multivariate_normal_shape(self):
        from nessai_tpu.flows.distributions import MultivariateNormal

        m = MultivariateNormal(shape=(3,), var=2.0)
        assert m.dim == 3
        assert m._var == 2.0
        with pytest.raises(ValueError, match="not both"):
            MultivariateNormal(3, shape=(3,))

    def test_sort_reparameterisations_signature(self):
        from nessai_tpu.utils.sorting import sort_reparameterisations

        class R:
            parameters = ["a"]
            prime_parameters = ["a_p"]
            requires = ["ext"]

        out = sort_reparameterisations(
            [R()],
            existing_prime_parameters=["ext"],
            known_parameters=[],
            initial_sort=True,
        )
        assert len(out) == 1

    def test_clustering_max_n_clusters(self, simple_model, tmp_path):
        from nessai_tpu.experimental.proposal.clustering import (
            ClusteringFlowProposal,
        )

        p = ClusteringFlowProposal(
            simple_model, output=str(tmp_path), poolsize=50, max_n_clusters=4
        )
        assert p.max_clusters == 4
        assert p.max_n_clusters == 4

    def test_backward_pass_return_unit_hypercube(
        self, simple_model, tmp_path, rng, flow_config, training_config
    ):
        from nessai_tpu.proposal import FlowProposal

        fp = FlowProposal(
            simple_model,
            output=str(tmp_path),
            poolsize=100,
            flow_config=flow_config,
            training_config=training_config,
            map_to_unit_hypercube=True,
            rng=rng,
        )
        fp.initialise()
        x = simple_model.to_unit_hypercube(simple_model.new_point(128))
        fp.train(x)
        z = rng.standard_normal((64, 2))
        x_cube, _ = fp.backward_pass(z)
        x_model, _ = fp.backward_pass(z, return_unit_hypercube=False)
        for n in simple_model.names:
            assert x_cube[n].min() >= 0.0 and x_cube[n].max() <= 1.0
        expected = simple_model.from_unit_hypercube(x_cube)
        for n in simple_model.names:
            np.testing.assert_allclose(
                np.sort(x_model[n]), np.sort(expected[n])
            )

    @pytest.mark.parametrize(
        "plot, pool, training",
        [
            (True, True, True),
            (False, False, False),
            ("all", "all", "all"),
            ("train", False, "all"),
            ("pool", "all", False),
            ("min", True, True),
            ("minimal", True, True),
            ("bogus", False, False),
        ],
    )
    def test_configure_plotting_values(
        self, simple_model, plot, pool, training
    ):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(simple_model, poolsize=10, plot=plot)
        assert p._plot_pool == pool
        assert p._plot_training == training

    def test_angle_coordinate_name_properties(self):
        from nessai_tpu.reparameterisations.angle import Angle, AnglePair

        a = Angle(parameters=["phi"], prior_bounds={"phi": [0, 2 * np.pi]})
        assert a.x == "phi_x"
        assert a.y == "phi_y"
        assert a.radius == a.radial
        ap = AnglePair(
            parameters=["ra", "dec"],
            prior_bounds={
                "ra": [0, 2 * np.pi],
                "dec": [-np.pi / 2, np.pi / 2],
            },
        )
        assert ap.x.endswith("_x")
        assert ap.y.endswith("_y")
        assert ap.z.endswith("_z")

    def test_rejection_proposal_draw_and_log_proposal(self, simple_model):
        from nessai_tpu.proposal.rejection import RejectionProposal

        p = RejectionProposal(simple_model, poolsize=20)
        x = p.draw_proposal()
        assert len(x) == 20
        log_q = p.log_proposal(x)
        assert len(log_q) == 20

    def test_flowmodel_reference_shims(self, tmp_path):
        import json
        import os

        from nessai_tpu.flowmodel import FlowModel

        fm = FlowModel(
            flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4),
            training_config=dict(max_epochs=2, batch_size=32),
            output=str(tmp_path),
        )
        fm.move_to("cpu")  # no-op shim
        t = fm.numpy_array_to_tensor(np.ones((3, 2)))
        assert t.shape == (3, 2)
        fm.update_mask()  # no-op hook
        fm.setup_from_input_dict(
            dict(n_inputs=2, n_blocks=3), dict(max_epochs=5)
        )
        assert fm.flow_config.n_blocks == 3
        assert fm.training_config.max_epochs == 5
        assert os.path.exists(os.path.join(str(tmp_path), "flow_config.json"))
        with open(os.path.join(str(tmp_path), "training_config.json")) as f:
            assert json.load(f)["max_epochs"] == 5

    def test_flowmodel_finalise_lars(self, tmp_path, rng):
        from nessai_tpu.flowmodel import FlowModel

        fm = FlowModel(
            flow_config=dict(
                n_inputs=2,
                n_blocks=2,
                n_neurons=4,
                distribution="lars",
            ),
            training_config=dict(max_epochs=2, batch_size=32),
            output=str(tmp_path),
        )
        fm.initialise()
        before = float(fm.params["base"]["log_Z"])
        fm.finalise()
        after = float(fm.params["base"]["log_Z"])
        assert np.isfinite(after)
        # a from-scratch MC estimate replaces the EMA value
        assert after != before or abs(after - before) < 1.0

    def test_importance_flowmodel_model_and_resume(self, tmp_path, rng):
        from nessai_tpu.flowmodel.importance import ImportanceFlowModel

        fm = ImportanceFlowModel(
            flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4),
            training_config=dict(max_epochs=2, batch_size=32),
            output=str(tmp_path),
            rng=rng,
        )
        fm.initialise()
        assert fm.model is None
        assert fm.models == []
        fm.add_new_flow()
        fm.train(rng.standard_normal((64, 2)).astype(np.float32))
        assert fm.n_models == 1
        assert fm.model is fm.params_list[-1]
        fm.save_all_weights()

        fm2 = ImportanceFlowModel(
            flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4),
            training_config=dict(max_epochs=2, batch_size=32),
            output=str(tmp_path),
            rng=rng,
        )
        fm2.resume(
            flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4),
            weights_path=str(tmp_path),
        )
        assert fm2.n_models == 1

    def test_ifp_flow_config_property(self, simple_model, tmp_path):
        from nessai_tpu.proposal.importance import ImportanceFlowProposal

        p = ImportanceFlowProposal(simple_model, output=str(tmp_path))
        assert p.flow_config["n_inputs"] == simple_model.dims
        p.flow_config = {"n_blocks": 3}
        assert p.flow_config["n_inputs"] == simple_model.dims
        assert p.flow_config["n_blocks"] == 3

    def test_flowproposal_configure_methods(self, simple_model):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(simple_model, poolsize=10)
        p.configure_population(drawsize=123, latent_temperature=2.0)
        assert p.drawsize == 123
        assert p.latent_temperature == 2.0
        p._truncation_scheme = None
        p.configure_truncation(truncation_methods=["min_log_q"])
        assert p.truncation_methods == ["min_log_q"]

    def test_ns_check_resume(self, simple_model, tmp_path):
        from nessai_tpu.samplers.nestedsampler import NestedSampler

        ns = NestedSampler(
            simple_model,
            output=str(tmp_path),
            nlive=100,
            plot=False,
            checkpointing=False,
        )
        ns.resumed = True
        ns.uninformed_sampling = True
        ns.check_resume()
        assert ns.resumed is False
