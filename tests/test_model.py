"""Tests for the Model ABC."""

import numpy as np
import pytest

from nessai_tpu.model import Model, ModelError, OneDimensionalModelError
from nessai_tpu.utils.testing import IntegrationTestModel


def test_new_point(model):
    x = model.new_point(10)
    assert len(x) == 10
    assert np.all(model.in_bounds(x))


def test_verify_model(model):
    model.verify_model()


def test_one_dimensional_rejected(rng):
    class OneD(Model):
        names = ["x"]
        bounds = {"x": [0, 1]}

        def log_prior(self, x):
            return np.zeros(x.size)

        def log_likelihood(self, x):
            return np.zeros(x.size)

    m = OneD()
    m.set_rng(rng)
    with pytest.raises(OneDimensionalModelError):
        m.verify_model()


def test_invalid_bounds(rng):
    class Bad(IntegrationTestModel):
        def __init__(self):
            super().__init__(2)
            self.bounds = {n: [0, np.inf] for n in self.names}

    m = Bad()
    m.set_rng(rng)
    with pytest.raises(ModelError):
        m.verify_model()


def test_batch_evaluate_log_likelihood(model):
    x = model.new_point(16)
    before = model.likelihood_evaluations
    logl = model.batch_evaluate_log_likelihood(x)
    assert logl.shape == (16,)
    assert model.likelihood_evaluations == before + 16
    # jax path should match numpy path
    expected = model.log_likelihood(x)
    np.testing.assert_allclose(logl, expected, rtol=1e-6)


def test_vectorised_detection(model):
    assert model.vectorised_likelihood
    assert model.vectorised_prior


def test_unit_hypercube_maps(model):
    x = model.new_point(8)
    u = model.to_unit_hypercube(x)
    assert np.all((u["x_0"] >= 0) & (u["x_0"] <= 1))
    x2 = model.from_unit_hypercube(u)
    np.testing.assert_allclose(x["x_0"], x2["x_0"], atol=1e-12)


def test_pool_evaluation(rng):
    class ScalarModel(IntegrationTestModel):
        allow_vectorised = False
        jax_log_likelihood = None  # force the pool path

        def log_likelihood(self, x):
            x = np.atleast_1d(x)
            out = np.zeros(x.size)
            for n in self.names:
                out += -0.5 * np.asarray(x[n]) ** 2
            return out - 0.5 * len(self.names) * np.log(2 * np.pi)

    m = ScalarModel(2)
    m.set_rng(rng)
    m.configure_pool(n_pool=2)
    try:
        x = m.new_point(8)
        logl = m.batch_evaluate_log_likelihood(x)
        assert logl.shape == (8,)
        expected = IntegrationTestModel(2).log_likelihood(x)
        np.testing.assert_allclose(logl, expected, rtol=1e-10)
    finally:
        m.close_pool()


def test_jax_log_prior_hook(rng):
    import jax.numpy as jnp

    class JaxPriorModel(IntegrationTestModel):
        def jax_log_prior(self, x):
            inside = jnp.all((x >= -10) & (x <= 10), axis=-1)
            return jnp.where(inside, -2 * jnp.log(20.0), -jnp.inf)

    m = JaxPriorModel(2)
    m.set_rng(rng)
    assert m.has_jax_prior
    x = m.new_point(10)
    lp = m.batch_evaluate_log_prior(x)
    np.testing.assert_allclose(lp, m.log_prior(x), rtol=1e-6)


def test_uniform_prior_mixin(rng):
    from nessai_tpu.model import Model, UniformPriorMixin

    class M(UniformPriorMixin, Model):
        def __init__(self):
            self.names = ["a", "b"]
            self.bounds = {"a": [0, 2], "b": [-1, 1]}

        def log_likelihood(self, x):
            return np.zeros(np.atleast_1d(x).size)

    m = M()
    m.set_rng(rng)
    m.verify_model()
    x = m.new_point(8)
    np.testing.assert_allclose(m.log_prior(x), -np.log(2) - np.log(2))
    u = m.to_unit_hypercube(x)
    assert m.in_unit_hypercube(u).all()
    x2 = m.from_unit_hypercube(u)
    np.testing.assert_allclose(x2["a"], x["a"], atol=1e-12)
