"""Single-dispatch device-loop populate.

The ``lax.while_loop`` populate must target the same truncated-proposal
distribution as the per-batch rounds path (same rejection scheme, device
PRNG instead of the host stream) and keep the sampler calibrated.
Reference semantics: ``nessai/proposal/flowproposal/flowproposal.py:
391-534`` (population), SURVEY.md §7 (while_loop formulation).
"""

import numpy as np
import pytest
from scipy.stats import ks_2samp

from nessai_tpu.proposal import FlowProposal
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def flow_config():
    return dict(n_blocks=2, n_neurons=8, n_layers=1)


@pytest.fixture()
def training_config():
    return dict(max_epochs=5, batch_size=128, patience=3)


def _make(model, tmp_path, rng, mode, **kw):
    fp = FlowProposal(
        model,
        output=str(tmp_path / mode),
        poolsize=200,
        flow_config=kw.pop("flow_config"),
        training_config=kw.pop("training_config"),
        populate_mode=mode,
        rng=rng,
        plot=False,
        **kw,
    )
    fp.initialise()
    return fp


def test_device_loop_matches_rounds_distribution(
    rng, tmp_path, flow_config, training_config
):
    """Pools from the two modes are draws from the same distribution
    (two-sample KS per parameter on large pools)."""
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    x = model.new_point(512)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    pools = {}
    for mode in ("rounds", "device_loop"):
        fp = _make(
            model,
            tmp_path,
            np.random.default_rng(7),
            mode,
            flow_config=flow_config,
            training_config=training_config,
        )
        fp.train(x, plot=False)
        fp.populate(x[np.argmin(x["logL"])], n_samples=1500)
        pools[mode] = fp.samples
    for name in model.names:
        stat = ks_2samp(
            np.asarray(pools["rounds"][name], float),
            np.asarray(pools["device_loop"][name], float),
        )
        assert stat.pvalue > 1e-3, f"{name}: KS p={stat.pvalue}"


def test_device_loop_eligibility_gates(
    rng, tmp_path, flow_config, training_config
):
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    # accumulate_weights disables the loop
    fp = _make(
        model,
        tmp_path,
        rng,
        "auto",
        flow_config=flow_config,
        training_config=training_config,
        accumulate_weights=True,
    )
    assert not fp._can_device_loop
    # forcing device_loop with an unsupported config raises
    fp2 = _make(
        model,
        tmp_path,
        np.random.default_rng(3),
        "device_loop",
        flow_config=flow_config,
        training_config=training_config,
        accumulate_weights=True,
    )
    with pytest.raises(RuntimeError, match="does not support"):
        fp2._use_device_loop()
    # likelihood-gated truncation disables it
    fp3 = _make(
        model,
        tmp_path,
        np.random.default_rng(4),
        "auto",
        flow_config=flow_config,
        training_config=training_config,
        truncation={
            "latent_radius": {"mode": "constant_volume"},
            "likelihood_threshold": {},
        },
    )
    assert not fp3._can_device_loop


def test_device_loop_with_angle_aux_prior(
    rng, tmp_path, flow_config, training_config
):
    """Angle configs run the chi radial prior inside the loop."""
    from tests.test_fused_reparams import AngleGaussianModel

    model = AngleGaussianModel()
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=150,
        flow_config=flow_config,
        training_config=training_config,
        reparameterisations={"phi": "angle-2pi"},
        populate_mode="device_loop",
        rng=rng,
        plot=False,
    )
    fp.initialise()
    assert fp._can_device_loop
    x = model.new_point(256)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    fp.populate(x[np.argmin(x["logL"])], n_samples=150)
    s = fp.samples
    assert len(s) == 150
    assert model.in_bounds(s).all()
    np.testing.assert_allclose(
        np.asarray(s["logL"], float),
        model.log_likelihood(s),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.integration_test
def test_end_to_end_device_loop_logz(rng, tmp_path):
    """Full sampler with populate_mode='device_loop' recovers the
    analytic evidence."""
    from nessai_tpu.flowsampler import FlowSampler

    model = IntegrationTestModel(2)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=250,
        seed=11,
        resume=False,
        plot=False,
        populate_mode="device_loop",
        maximum_uninformed=150,
        flow_config=dict(n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=20, batch_size=128, patience=5),
    )
    fs.run(plot=False, save=False)
    assert fs.ns._flow_proposal._can_device_loop
    err = max(fs.log_evidence_error, 1e-3)
    assert abs(fs.logZ - model.analytic_log_evidence) < 4 * err


def test_device_loop_adaptive_budget_fills_pool(
    rng, tmp_path, flow_config, training_config
):
    """With no explicit max_samples the device loop treats the budget as
    soft and keeps proposing (scaled by 1/acceptance) until the pool
    fills — the terminal-regime fix: no retrain-per-handful pools."""
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = _make(
        model,
        tmp_path,
        rng,
        "device_loop",
        flow_config=flow_config,
        training_config=training_config,
    )
    assert fp._max_samples_explicit is False
    x = model.new_point(256)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    # Shrink the soft budget so filling 2000 samples necessarily
    # overshoots it; the adaptive loop must push past.
    fp.max_samples = 512
    fp.populate(x[np.argmin(x["logL"])], n_samples=2000)
    assert fp.populated
    assert len(fp.samples) == 2000


def test_device_loop_explicit_cap_is_exact(
    rng, tmp_path, flow_config, training_config
):
    """An explicit max_samples is honoured exactly: the loop stops with a
    shortfall instead of adapting past the cap."""
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = _make(
        model,
        tmp_path,
        rng,
        "device_loop",
        flow_config=flow_config,
        training_config=training_config,
        max_samples=512,
    )
    assert fp._max_samples_explicit is True
    x = model.new_point(256)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    fp.populate(x[np.argmin(x["logL"])], n_samples=2000)
    assert fp.populated
    assert len(fp.samples) < 2000


def test_populate_max_samples_kwarg_is_exact_on_device_loop(
    rng, tmp_path, flow_config, training_config
):
    """populate(max_samples=...) enforces the exact reference cap for
    that call even in otherwise-adaptive mode, then restores it."""
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = _make(
        model,
        tmp_path,
        rng,
        "device_loop",
        flow_config=flow_config,
        training_config=training_config,
    )
    x = model.new_point(256)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    fp.populate(x[np.argmin(x["logL"])], n_samples=2000, max_samples=512)
    assert len(fp.samples) < 2000
    assert fp._max_samples_explicit is False
    assert fp.max_samples == 1_000_000


def test_device_loop_shortfall_respects_max_samples(
    rng, tmp_path, flow_config, training_config
):
    """An untrained/terrible flow cannot fill the pool: the loop stops at
    max_samples with a warning rather than spinning forever."""
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = _make(
        model,
        tmp_path,
        rng,
        "device_loop",
        flow_config=flow_config,
        training_config=training_config,
        max_samples=4096,
    )
    x = model.new_point(256)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    # an absurd latent temperature gives near-zero acceptance
    fp.latent_temperature = 1.0  # keep program; shrink radius instead
    rule = fp._truncation_scheme.get_rule("latent_radius")
    fp.populate(x[0], n_samples=100)
    assert fp.populated
    assert len(fp.samples) <= 100


# ----------------------------------------------------------------------
# Uniform-box prior auto-detection (enables the device loop for plain
# user-defined uniform priors, e.g. the eggbox/rosenbrock examples)
# ----------------------------------------------------------------------
def test_uniform_box_prior_detected():
    import numpy as np

    from nessai_tpu.model import Model

    class PlainUniform(Model):
        names = ["x_0", "x_1"]
        bounds = {"x_0": [0.0, 2.0], "x_1": [-3.0, 5.0]}

        def log_prior(self, x):
            log_p = np.log(self.in_bounds(x), dtype="float")
            for b in self.bounds.values():
                log_p -= np.log(b[1] - b[0])
            return log_p

        def log_likelihood(self, x):
            return np.zeros(x.size)

    m = PlainUniform()
    assert m.uniform_prior_box is False
    assert m.has_uniform_box_prior is True
    # cached
    assert m._uniform_box_detected is True


def test_non_uniform_prior_not_detected():
    import numpy as np

    from nessai_tpu.model import Model

    class GaussPrior(Model):
        names = ["x_0"]
        bounds = {"x_0": [-5.0, 5.0]}

        def log_prior(self, x):
            return np.where(
                self.in_bounds(x), -0.5 * np.asarray(x["x_0"]) ** 2, -np.inf
            )

        def log_likelihood(self, x):
            return np.zeros(x.size)

    m = GaussPrior()
    assert m.has_uniform_box_prior is False


def test_jax_prior_skips_detection():
    import numpy as np

    from nessai_tpu.model import Model

    class WithJax(Model):
        names = ["x_0"]
        bounds = {"x_0": [-5.0, 5.0]}

        def log_prior(self, x):
            return np.log(self.in_bounds(x), dtype="float") - np.log(10.0)

        def jax_log_likelihood(self, x):
            return -0.5 * x[..., 0] ** 2

        def log_likelihood(self, x):
            return -0.5 * np.asarray(x["x_0"]) ** 2

        def jax_log_prior(self, x):
            import jax.numpy as jnp

            return jnp.full(x.shape[:-1], -jnp.log(10.0))

    m = WithJax()
    # declared jax prior wins; detection not consulted
    assert m.has_jax_prior
    assert m.has_uniform_box_prior is False


def test_device_loop_enabled_for_detected_uniform_box(rng, tmp_path):
    """The eggbox-example shape (manual uniform log_prior + jax
    likelihood, no flags) now takes the single-dispatch device loop."""
    import numpy as np

    from nessai_tpu.model import Model
    from nessai_tpu.proposal import FlowProposal

    class EggboxLike(Model):
        names = ["x_0", "x_1"]
        bounds = {"x_0": [0.0, 10.0], "x_1": [0.0, 10.0]}

        def log_prior(self, x):
            log_p = np.log(self.in_bounds(x), dtype="float")
            for b in self.bounds.values():
                log_p -= np.log(b[1] - b[0])
            return log_p

        def log_likelihood(self, x):
            v = self.unstructured_view(x)
            return (2.0 + np.prod(np.cos(v / 2.0), axis=-1)) ** 2.0

        def jax_log_likelihood(self, x):
            import jax.numpy as jnp

            return (2.0 + jnp.prod(jnp.cos(x / 2.0), axis=-1)) ** 2.0

    model = EggboxLike()
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=2, batch_size=64),
        rng=rng,
        plot=False,
    )
    fp.initialise()
    x = model.new_point(256)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    assert fp._can_device_loop
    fp.populate(x[0], n_samples=50)
    assert fp.populated
    assert model.in_bounds(fp.x).all()
