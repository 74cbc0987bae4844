"""Fused populate with non-affine reparameterisations.

The device-side inverse-reparameterisation stage must make
``_can_fuse_populate`` True for the reference-default RescaleToBounds
config, logit/inversion variants and angle reparameterisations, and the
fused program must agree with the host ``backward_pass``.
Reference: ``nessai/proposal/flowproposal/base.py:578-633`` (default
reparameterisation), ``reparameterisations/rescale.py:321``,
``angle.py:17``.
"""

import numpy as np
import pytest

from nessai_tpu.model import Model
from nessai_tpu.proposal import FlowProposal
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def flow_config():
    return dict(n_blocks=2, n_neurons=8, n_layers=1)


@pytest.fixture()
def training_config():
    return dict(max_epochs=5, batch_size=128, patience=3)


class AngleGaussianModel(Model):
    """2-D model with one periodic parameter (phase) and one bounded
    amplitude, with a JAX likelihood — the GW-analogue shape."""

    uniform_prior_box = True

    def __init__(self):
        self.names = ["amp", "phi"]
        self.bounds = {"amp": [-5.0, 5.0], "phi": [0.0, 2 * np.pi]}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float64")
        log_p -= np.log(10.0) + np.log(2 * np.pi)
        return log_p

    def log_likelihood(self, x):
        return (
            -0.5 * (np.asarray(x["amp"], float) ** 2)
            + np.cos(np.asarray(x["phi"], float))
        )

    def jax_log_likelihood(self, x):
        import jax.numpy as jnp

        return -0.5 * x[..., 0] ** 2 + jnp.cos(x[..., 1])


def _train_proposal(fp, model, n=256):
    fp.initialise()
    x = model.new_point(n)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    return x


def _assert_fused_matches_host(fp, n_z=200, atol=2e-3):
    """_fused_backward must agree with the host backward_pass row-wise."""
    z = fp.flow.sample_latent_distribution(n_z)
    x_host, log_q_host, _ = fp.backward_pass(z, return_z=True)
    x_arr, log_q_f, log_l, in_b = fp._fused_backward(z)
    keep = in_b & np.isfinite(log_q_f)
    assert keep.sum() == len(x_host), "row filtering differs"
    for i, p in enumerate(fp.parameters):
        np.testing.assert_allclose(
            x_arr[keep, i],
            np.asarray(x_host[p], np.float64),
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"parameter {p}",
        )
    np.testing.assert_allclose(
        log_q_f[keep], log_q_host, rtol=1e-4, atol=atol
    )
    # fused logL matches a direct evaluation of the fused x
    direct = fp.model.batch_evaluate_log_likelihood(
        _to_struct(fp, x_arr[keep])
    )
    np.testing.assert_allclose(log_l[keep], direct, rtol=1e-4, atol=1e-4)


def _to_struct(fp, x_arr):
    from nessai_tpu.livepoint import empty_structured_array

    out = empty_structured_array(len(x_arr), names=list(fp.model.names))
    for i, p in enumerate(fp.parameters):
        if p in fp.model.names:
            out[p] = x_arr[:, fp.parameters.index(p)]
    return out


@pytest.mark.parametrize(
    "reparams",
    ["default", "logit", "inversion", "inversion-duplicate", "zscore"],
)
def test_fused_with_rescale_configs(
    rng, tmp_path, flow_config, training_config, reparams
):
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=flow_config,
        training_config=training_config,
        reparameterisations=reparams,
        rng=rng,
        plot=False,
    )
    _train_proposal(fp, model)
    assert fp._device_inverse is not None
    assert fp._can_fuse_populate
    _assert_fused_matches_host(fp)
    x = model.new_point(10)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.populate(x[np.argmin(x["logL"])], n_samples=50)
    assert fp.populated
    assert model.in_bounds(fp.samples).all()


def test_fused_with_angle_reparameterisation(
    rng, tmp_path, flow_config, training_config
):
    """The GW-analogue config (angle-2pi + zscore fallback) fuses; the
    auxiliary radial column is produced on device and the chi prior is
    applied in compute_weights."""
    model = AngleGaussianModel()
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=flow_config,
        training_config=training_config,
        reparameterisations={"phi": "angle-2pi"},
        rng=rng,
        plot=False,
    )
    _train_proposal(fp, model)
    assert "phi_radial" in fp.parameters
    assert fp._device_inverse is not None
    assert fp._can_fuse_populate
    _assert_fused_matches_host(fp)
    x = model.new_point(10)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.populate(x[np.argmin(x["logL"])], n_samples=50)
    assert fp.populated
    assert model.in_bounds(fp.samples).all()
    # pool weights included the chi(2) radial prior: re-deriving logP on
    # the pool (model prior only) differs from fp.x's logP + chi term
    assert np.isfinite(fp.samples["logL"]).all()


def test_fused_consts_refresh_across_trainings(
    rng, tmp_path, flow_config, training_config
):
    """Data-driven bound updates between trainings flow into the SAME
    traced program via consts (no stale captured values)."""
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=flow_config,
        training_config=training_config,
        reparameterisations="default",
        rng=rng,
        plot=False,
    )
    _train_proposal(fp, model)
    _assert_fused_matches_host(fp)
    # retrain on a narrower region: update_bounds shrinks the bounds
    x2 = model.new_point(600)
    x2 = x2[np.abs(np.asarray(x2["x_0"], float)) < 3.0]
    x2["logL"] = model.batch_evaluate_log_likelihood(x2)
    fp.train(x2, plot=False)
    r = next(iter(fp._reparameterisation.values()))
    assert r.bounds["x_0"][1] < 5.0  # bounds really shrank
    _assert_fused_matches_host(fp)


def test_fused_sharded_matches_single_device_nonaffine(
    rng, tmp_path, flow_config, training_config
):
    """Sharded-vs-single-device equivalence for a NON-affine config
    (reference-default RescaleToBounds)."""
    import jax

    from nessai_tpu.parallel import get_mesh, replicated_sharding

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual cpu devices")

    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=64,
        flow_config=flow_config,
        training_config=training_config,
        reparameterisations="default",
        rng=rng,
        plot=False,
    )
    _train_proposal(fp, model, n=128)
    assert fp._can_fuse_populate
    z = fp.flow.sample_latent_distribution(37)
    single = fp._fused_backward(z)

    mesh = get_mesh(devices=cpus, n_devices=8)
    fp.flow.mesh = mesh
    fp.flow._scope = None
    fp.flow.params = jax.device_put(
        fp.flow.params, replicated_sharding(mesh)
    )
    sharded = fp._fused_backward(z)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(
            np.asarray(a, np.float64),
            np.asarray(b, np.float64),
            rtol=1e-5,
            atol=1e-5,
        )


@pytest.mark.integration_test
def test_end_to_end_default_reparam_fused(rng, tmp_path):
    """Full sampler run with the reference-default reparameterisation;
    the fused path stays engaged and logZ is sane."""
    from nessai_tpu.flowsampler import FlowSampler

    model = IntegrationTestModel(2)
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=200,
        seed=7,
        resume=False,
        plot=False,
        reparameterisations="default",
        maximum_uninformed=100,
        flow_config=dict(n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=20, batch_size=128, patience=5),
    )
    fs.run(plot=False, save=False)
    assert fs.ns._flow_proposal._can_fuse_populate
    assert np.isfinite(fs.logZ)
    assert abs(fs.logZ - model.analytic_log_evidence) < 1.0


def test_callback_likelihood_mesh_sharded_host_dispatch(
    rng, tmp_path, flow_config, training_config, caplog
):
    """mesh + pure_callback likelihood: flow inverse + reparams + bounds
    stay sharded over the mesh and the callback likelihood splits out to
    the host (sharded host-dispatch; reference pool contract
    utils/multiprocessing.py:134-196). Populate announces the split
    once and the pool carries host-evaluated likelihoods."""
    import jax

    from nessai_tpu.parallel import get_mesh
    from nessai_tpu.utils.testing import IntegrationTestModel

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual cpu devices")

    class CallbackModel(IntegrationTestModel):
        jax_log_likelihood = None
        likelihood_callback = True

    m = CallbackModel(2)
    m.set_rng(rng)
    mesh = get_mesh(devices=cpus, n_devices=8)
    fp = FlowProposal(
        m,
        output=str(tmp_path),
        poolsize=50,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
        mesh=mesh,
    )
    _train_proposal(fp, m, n=128)
    assert fp._device_inverse is not None
    # the mesh no longer kills the fused path: the program without the
    # likelihood shards, the callback runs on the host
    assert fp._can_fuse_populate
    assert fp._resolve_fuse_likelihood() is False
    x = m.new_point(10)
    x["logL"] = m.batch_evaluate_log_likelihood(x)
    import logging as _logging

    with caplog.at_level(_logging.INFO):
        fp.populate(x[0], n_samples=30)
    assert "dispatched on the host" in caplog.text
    assert fp.populated
    assert np.all(np.isfinite(fp.samples["logL"]))
    # only announces once
    caplog.clear()
    with caplog.at_level(_logging.INFO):
        fp.populate(x[0], n_samples=30)
    assert "dispatched on the host" not in caplog.text


def test_callback_mesh_matches_single_device(
    rng, tmp_path, flow_config, training_config
):
    """The likelihood-free fused program for a callback model produces
    identical draws batch-sharded over the mesh as single-device."""
    import jax

    from nessai_tpu.parallel import get_mesh, replicated_sharding
    from nessai_tpu.utils.testing import IntegrationTestModel

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual cpu devices")

    class CallbackModel(IntegrationTestModel):
        jax_log_likelihood = None
        likelihood_callback = True

    m = CallbackModel(2)
    m.set_rng(rng)
    fp = FlowProposal(
        m,
        output=str(tmp_path),
        poolsize=50,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
    )
    _train_proposal(fp, m, n=128)
    assert fp._can_fuse_populate
    z = fp.flow.sample_latent_distribution(37)
    single = fp._fused_backward(z, with_likelihood=False)

    mesh = get_mesh(devices=cpus, n_devices=8)
    fp.flow.mesh = mesh
    fp.flow._scope = None
    fp.flow.params = jax.device_put(
        fp.flow.params, replicated_sharding(mesh)
    )
    sharded = fp._fused_backward(z, with_likelihood=False)
    for a, b in zip(single, sharded):
        if a is None or b is None:
            assert a is None and b is None
            continue
        np.testing.assert_allclose(
            np.asarray(a, np.float64),
            np.asarray(b, np.float64),
            rtol=1e-5,
            atol=1e-5,
        )


class DataArgModel(Model):
    """Model whose JAX likelihood takes its observed data as a runtime
    argument (jax_likelihood_data) instead of a captured constant."""

    def __init__(self, center=0.0):
        self.names = ["a", "b"]
        self.bounds = {"a": [-10.0, 10.0], "b": [-10.0, 10.0]}
        self.jax_likelihood_data = {
            "center": np.full(2, center, dtype=np.float32)
        }

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float64")
        return log_p - 2 * np.log(20.0)

    def log_likelihood(self, x):
        c = np.asarray(self.jax_likelihood_data["center"], float)
        out = np.zeros(len(np.atleast_1d(x)))
        for i, n in enumerate(self.names):
            out += -0.5 * (np.asarray(x[n], float) - c[i]) ** 2
        return out

    def jax_log_likelihood(self, x, data):
        import jax.numpy as jnp

        return -0.5 * jnp.sum((x - data["center"]) ** 2, axis=-1)


def test_jax_likelihood_data_argument_path(rng, tmp_path):
    """jax_likelihood_data enters programs as a runtime argument: two
    same-shape datasets share one program fingerprint yet evaluate their
    OWN data (no cross-instance staleness)."""
    m1 = DataArgModel(0.0)
    m2 = DataArgModel(3.0)
    m1.set_rng(rng)
    m2.set_rng(np.random.default_rng(1))
    assert m1.program_fingerprint == m2.program_fingerprint
    x = m1.new_point(8)
    out1 = m1.batch_evaluate_log_likelihood(x)
    out2 = m2.batch_evaluate_log_likelihood(x)
    np.testing.assert_allclose(out1, m1.log_likelihood(x), atol=1e-4)
    np.testing.assert_allclose(out2, m2.log_likelihood(x), atol=1e-4)
    assert not np.allclose(out1, out2)


def test_fused_populate_with_data_argument(
    rng, tmp_path, flow_config, training_config
):
    m = DataArgModel(1.0)
    m.set_rng(rng)
    fp = FlowProposal(
        m,
        output=str(tmp_path),
        poolsize=60,
        flow_config=flow_config,
        training_config=training_config,
        rng=rng,
        plot=False,
    )
    _train_proposal(fp, m, n=128)
    assert fp._can_fuse_populate
    _assert_fused_matches_host(fp, n_z=100)
    x = m.new_point(10)
    x["logL"] = m.batch_evaluate_log_likelihood(x)
    fp.populate(x[np.argmin(x["logL"])], n_samples=30)
    assert fp.populated


@pytest.mark.parametrize("fuse_likelihood", [True, False])
def test_fuse_likelihood_modes_equivalent_pools(
    rng, tmp_path, flow_config, training_config, fuse_likelihood
):
    """Forced fused vs split likelihood both produce valid pools with
    correct logL (split evaluates accepted samples only)."""
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=60,
        flow_config=flow_config,
        training_config=training_config,
        fuse_likelihood=fuse_likelihood,
        populate_mode="rounds",
        rng=rng,
        plot=False,
    )
    _train_proposal(fp, model, n=128)
    before = model.likelihood_evaluations
    x = model.new_point(10)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.populate(x[np.argmin(x["logL"])], n_samples=40)
    assert fp._fuse_likelihood_resolved is fuse_likelihood
    s = fp.samples
    direct = model.log_likelihood(s)
    np.testing.assert_allclose(s["logL"], direct, rtol=1e-4, atol=1e-4)
    evals = model.likelihood_evaluations - before
    if not fuse_likelihood:
        # split mode: likelihood ran on (at most) the accepted pool plus
        # the 10 direct calls above, far fewer than the latent draws
        assert evals < 10_000


def test_fuse_likelihood_auto_probe_cheap_fuses(
    rng, tmp_path, flow_config, training_config
):
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=60,
        flow_config=flow_config,
        training_config=training_config,
        populate_mode="rounds",
        rng=rng,
        plot=False,
    )
    _train_proposal(fp, model, n=128)
    x = model.new_point(5)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.populate(x[0], n_samples=30)
    # a trivial Gaussian likelihood on-device is far under the probe
    # threshold -> fused
    assert fp._fuse_likelihood_resolved is True
