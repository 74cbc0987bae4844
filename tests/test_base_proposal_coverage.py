"""Remaining branch coverage for BaseFlowProposal: plotting config,
properties, unit-hypercube paths, pool bookkeeping, and pickle/resume.
Reference: ``nessai/proposal/flowproposal/base.py``.
"""

import os
import pickle

import numpy as np
import pytest

from nessai_tpu.proposal import FlowProposal
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def model(rng):
    m = IntegrationTestModel(2)
    m.set_rng(rng)
    return m


def make_fp(model, rng, tmp_path, **kwargs):
    kwargs.setdefault("plot", False)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=2, batch_size=64),
        rng=rng,
        **kwargs,
    )
    fp.initialise()
    return fp


@pytest.fixture()
def fp(model, rng, tmp_path):
    return make_fp(model, rng, tmp_path)


@pytest.fixture()
def fp_hypercube(model, rng, tmp_path):
    return make_fp(model, rng, tmp_path, map_to_unit_hypercube=True)


@pytest.mark.parametrize(
    "plot, pool, training",
    [
        ("all", "all", "all"),
        ("train", False, "all"),
        ("pool", "all", False),
        ("min", True, True),
        ("minimal", True, True),
        (True, True, True),
        (False, False, False),
        (None, False, False),
    ],
)
def test_configure_plotting(fp, plot, pool, training):
    fp.configure_plotting(plot)
    assert fp._plot_pool == pool
    assert fp._plot_training == training


def test_configure_plotting_unknown_string_warns(fp, caplog):
    with caplog.at_level("WARNING"):
        fp.configure_plotting("sometimes")
    assert fp._plot_pool is False
    assert fp._plot_training is False
    assert any("Unknown plot argument" in r.message for r in caplog.records)


def test_configure_poolsize_none_raises(fp):
    with pytest.raises(RuntimeError, match="poolsize"):
        fp.configure_poolsize(None, True, 10)


def test_rescaled_dims_deprecated(fp):
    with pytest.warns(DeprecationWarning, match="prime_dims"):
        assert fp.rescaled_dims == fp.prime_dims


def test_dtype_and_parameter_properties(fp):
    assert fp.dims == 2
    assert fp.population_dtype == fp.x_dtype
    assert fp.internal_prime_parameters == fp.prime_parameters
    assert fp.x_prime_internal_dtype == fp.x_prime_dtype
    assert fp.flow_dims == fp.prime_dims


def test_latent_log_prob_matches_standard_normal(fp):
    z = np.zeros((3, fp.prime_dims))
    expected = -0.5 * fp.prime_dims * np.log(2 * np.pi)
    np.testing.assert_allclose(fp.latent_log_prob(z), expected, rtol=1e-6)


def test_reset_model_weights_changes_params(fp):
    import jax

    before = jax.tree.leaves(fp.flow.params)
    fp.reset_model_weights(weights=True, permutations=True)
    after = jax.tree.leaves(fp.flow.params)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_check_prior_bounds_filters(fp):
    x = fp.model.new_point(10)
    x[fp.model.names[0]][0] = 1e6  # push one point out of bounds
    extra = np.arange(10)
    x_out, extra_out = fp.check_prior_bounds(x, extra)
    assert len(x_out) == 9
    assert 0 not in extra_out
    # no companion arrays: returns the array alone
    alone = fp.check_prior_bounds(x)
    assert len(alone) == 9


def test_check_prior_bounds_hypercube(fp_hypercube):
    x = fp_hypercube.model.new_point(5)
    u = fp_hypercube.model.to_unit_hypercube(x)
    u[fp_hypercube.model.names[0]][0] = 1.5
    assert len(fp_hypercube.check_prior_bounds(u)) == 4


def test_flow_config_setter_none(fp):
    fp.flow_config = None
    assert fp.flow_config == {}


def test_prior_bounds_hypercube(fp_hypercube):
    bounds = fp_hypercube.prior_bounds
    for n in fp_hypercube.model.names:
        np.testing.assert_array_equal(bounds[n], [0.0, 1.0])


def test_get_prior_bounds_for_parameters(fp):
    name = fp.model.names[0]
    # scalar parameter name
    out = fp._get_prior_bounds_for_parameters(name)
    assert set(out) == {name}
    # unknown parameter -> None
    assert fp._get_prior_bounds_for_parameters("not_a_param") is None
    assert fp._get_prior_bounds_for_parameters([]) is None


def test_spec_unknown_reparameterisation_raises(fp):
    from nessai_tpu.reparameterisations.utils import (
        parse_reparameterisations,
    )

    specs = parse_reparameterisations(
        {"x_0": "definitely-not-a-reparam"},
        model_names=list(fp.model.names),
    )
    with pytest.raises(RuntimeError, match="not a parameter in the model"):
        fp.get_reparameterisation_from_spec(specs[0])


def test_spec_input_parameters_spelling(fp):
    from nessai_tpu.reparameterisations.utils import (
        parse_reparameterisations,
    )

    specs = parse_reparameterisations(
        {"x_0": {"reparameterisation": "zscore",
                 "input_parameters": ["x_0"]}},
        model_names=list(fp.model.names),
    )
    rc, config = fp.get_reparameterisation_from_spec(specs[0])
    assert config["parameters"] == ["x_0"]
    assert "input_parameters" not in config


def test_check_state_and_inverse_rescale_hypercube(fp_hypercube):
    fp = fp_hypercube
    x = fp.model.new_point(50)
    fp.check_state(x)
    u = fp.model.to_unit_hypercube(fp._convert_to_x(x))
    x_prime, log_j = fp.rescale(u)
    # return_unit_hypercube=False maps back to the model space
    x_model, log_j_inv = fp.inverse_rescale(x_prime)
    for n in fp.model.names:
        np.testing.assert_allclose(x_model[n], x[n], atol=1e-8)
    np.testing.assert_allclose(log_j, -log_j_inv, atol=1e-10)


def test_train_saves_training_data(model, rng, tmp_path):
    fp = make_fp(model, rng, tmp_path, save_training_data=True)
    x = model.new_point(64)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    assert os.path.exists(os.path.join(fp.output, "training_data_0.npy"))
    assert fp.training_count == 1
    assert fp.populated is False


def test_train_uninitialised_raises(model, rng, tmp_path):
    fp = FlowProposal(
        model, output=str(tmp_path), poolsize=10, rng=rng, plot=False
    )
    with pytest.raises(RuntimeError, match="initialised before training"):
        fp.train(model.new_point(8))


def test_train_hypercube(fp_hypercube):
    x = fp_hypercube.model.new_point(64)
    x["logL"] = fp_hypercube.model.batch_evaluate_log_likelihood(x)
    fp_hypercube.train(x, plot=False)
    # training data is stored in the hypercube
    for n in fp_hypercube.model.names:
        assert np.all(fp_hypercube.training_data[n] >= 0.0)
        assert np.all(fp_hypercube.training_data[n] <= 1.0)


def test_forward_pass_no_rescale(fp):
    x = fp.model.new_point(16)
    z, log_q = fp.forward_pass(fp._convert_to_x(x), rescale=False)
    assert z.shape == (16, fp.dims)
    assert np.all(np.isfinite(log_q))


def test_backward_pass_hypercube_model_space(fp_hypercube):
    fp = fp_hypercube
    x = fp.model.new_point(64)
    x["logL"] = fp.model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    z = np.random.default_rng(7).normal(size=(32, fp.prime_dims))
    x_hc, _ = fp.backward_pass(z)
    # default: stays in the hypercube
    for n in fp.model.names:
        assert np.all((x_hc[n] >= 0) & (x_hc[n] <= 1))
    x_model, log_q, z_out = fp.backward_pass(
        z, return_unit_hypercube=False, return_z=True
    )
    assert len(x_model) == len(log_q) == len(z_out)
    # exact semantics: the model-space output equals from_unit_hypercube
    # of the hypercube-space output for the same latent draws
    expected = fp.model.from_unit_hypercube(x_hc)
    for n in fp.model.names:
        np.testing.assert_allclose(x_model[n], expected[n], atol=1e-10)


def test_log_prior_hypercube_and_compute_weights(fp_hypercube):
    fp = fp_hypercube
    x = fp.model.new_point(8)
    u = fp._convert_to_x(fp.model.to_unit_hypercube(x))
    log_p = fp.log_prior(u)
    np.testing.assert_allclose(log_p, fp.unit_hypercube_log_prior(u))
    log_w, log_p2 = fp.compute_weights(
        u, np.zeros(len(u)), return_log_prior=True
    )
    np.testing.assert_allclose(log_w, log_p2)
    np.testing.assert_allclose(u["logP"], log_p2)


def test_convert_to_samples_hypercube(fp_hypercube):
    fp = fp_hypercube
    x = fp.model.new_point(8)
    u = fp._convert_to_x(fp.model.to_unit_hypercube(x))
    u["logL"] = 1.0
    out = fp.convert_to_samples(u)
    assert set(out.dtype.names) >= set(fp.model.names)
    # mapped back to the model space exactly (from_unit_hypercube of the
    # same hypercube points) and logP re-evaluated there
    expected = fp.model.from_unit_hypercube(u)
    for n in fp.model.names:
        np.testing.assert_allclose(out[n], expected[n], atol=1e-10)
    np.testing.assert_allclose(
        out["logP"], fp.model.batch_evaluate_log_prior(out)
    )
    np.testing.assert_array_equal(out["logL"], 1.0)


def test_plot_pool_writes_file(fp):
    x = fp.model.new_point(32)
    fp.training_data = fp._convert_to_x(fp.model.new_point(32))
    fp.plot_pool(x)
    assert os.path.exists(
        os.path.join(fp.output, f"pool_{fp.populated_count}.png")
    )


def test_compute_acceptance(fp):
    samples = fp.model.new_point(10)
    samples["logL"] = np.arange(10.0)
    fp.samples = samples
    assert fp.compute_acceptance(4.5) == 0.5


def test_draw_and_reset(fp, monkeypatch):
    pool = fp.model.new_point(3)

    def fake_populate(worst_point, n_samples=None, **kwargs):
        fp.samples = pool.copy()
        fp.indices = list(range(len(pool)))
        fp.populated = True
        fp.populated_count += 1

    monkeypatch.setattr(fp, "populate", fake_populate)
    fp.update_poolsize = True
    fp.ns_acceptance = 0.5
    drawn = [fp.draw(None) for _ in range(3)]
    assert len(drawn) == 3
    assert fp.populated is False  # pool exhausted
    assert fp._poolsize_scale == 2.0
    fp.x = pool
    fp.acceptance = [0.1]
    fp.reset()
    assert fp.x is None
    assert fp.training_latent is None
    assert fp.acceptance == []
    assert fp.populated_count == 0


def test_getstate_resume_roundtrip(model, rng, tmp_path):
    fp = make_fp(model, rng, tmp_path)
    x = model.new_point(64)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    weights_file = fp.flow.weights_file
    fp2 = pickle.loads(pickle.dumps(fp))
    assert fp2.flow is None
    assert fp2.model is None
    assert not fp2.initialised
    fp2.resume(model, weights_file=weights_file)
    assert fp2.initialised
    assert fp2.populated is False
    # full proposal parity after resume: the fitted reparameterisation
    # state (zscore estimates etc.) survives the pickle, so rescaling the
    # SAME model-space points through both proposals must agree exactly
    assert fp2.training_data is not None
    probe = fp._convert_to_x(model.new_point(16))
    x_prime, log_j = fp.rescale(probe.copy())
    x_prime2, log_j2 = fp2.rescale(probe.copy())
    for n in x_prime.dtype.names:
        np.testing.assert_allclose(
            x_prime[n], x_prime2[n], atol=1e-12, equal_nan=True
        )
    np.testing.assert_allclose(log_j, log_j2, atol=1e-12)
    # and the inverse direction (backward_pass rescaling leg)
    x_back, lj_inv = fp.inverse_rescale(x_prime.copy())
    x_back2, lj_inv2 = fp2.inverse_rescale(x_prime2.copy())
    for n in model.names:
        np.testing.assert_allclose(x_back[n], x_back2[n], atol=1e-12)
    np.testing.assert_allclose(lj_inv, lj_inv2, atol=1e-12)
    # the restored flow reproduces the trained flow's log-prob
    from nessai_tpu.livepoint import live_points_to_array

    arr = live_points_to_array(x_prime, fp.prime_parameters)
    _, lq1 = fp.flow.forward_and_log_prob(arr)
    _, lq2 = fp2.flow.forward_and_log_prob(arr)
    np.testing.assert_allclose(lq1, lq2, rtol=1e-5)
