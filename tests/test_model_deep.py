"""Deep branch coverage for the Model ABC.

Ports the highest-value assertions of the reference's
``tests/test_model.py`` (1509 LoC): verify_model error branches, point
generation, bounds helpers, batched evaluation dispatch, counters and
pickling.
"""

import multiprocessing
import pickle

import numpy as np
import pytest

from nessai_tpu.livepoint import empty_structured_array
from nessai_tpu.model import (
    Model,
    ModelError,
    OneDimensionalModelError,
    UniformPriorMixin,
)
from nessai_tpu.utils.testing import IntegrationTestModel


class BoxModel(UniformPriorMixin, Model):
    def __init__(self, names=("x", "y"), bounds=None):
        self.names = list(names)
        self.bounds = bounds or {n: [-5.0, 5.0] for n in self.names}

    def log_likelihood(self, x):
        out = np.zeros(x.size)
        for n in self.names:
            out = out - 0.5 * np.asarray(x[n]) ** 2
        return out


@pytest.fixture()
def box(rng):
    m = BoxModel()
    m.set_rng(rng)
    return m


# ----------------------------------------------------------------------
# verify_model error branches
# ----------------------------------------------------------------------
def test_names_empty_list_rejected_on_assignment():
    # reference: ``model.py:135`` raises at assignment time
    m = BoxModel()
    with pytest.raises(ValueError, match="`names` list is empty"):
        m.names = []


def test_names_invalid_type_rejected_on_assignment():
    m = BoxModel()
    with pytest.raises(TypeError, match="`names` must be a list"):
        m.names = True


def test_bounds_invalid_type_rejected_on_assignment():
    m = BoxModel()
    with pytest.raises(TypeError, match="`bounds` must be a dictionary"):
        m.bounds = True


def test_verify_no_names(rng):
    m = BoxModel()
    m._names = None  # bypass the validating setter: simulate unset names
    m.set_rng(rng)
    with pytest.raises(ModelError, match="[Nn]ames"):
        m.verify_model()


def test_verify_no_bounds(rng):
    m = BoxModel()
    m.bounds = {}
    m.set_rng(rng)
    with pytest.raises(ModelError, match="[Bb]ounds"):
        m.verify_model()


def test_one_dimensional_names_rejected_on_assignment():
    # reference: OneDimensionalModelError at assignment (``model.py:137``)
    with pytest.raises(OneDimensionalModelError, match="length 1"):
        BoxModel(names=["x"], bounds={"x": [-1, 1], "y": [-1, 1]})


def test_one_dimensional_bounds_rejected_on_assignment():
    m = BoxModel()
    with pytest.raises(OneDimensionalModelError, match="length 1"):
        m.bounds = {"x": [-1, 1]}


def test_bounds_entry_wrong_length_rejected_on_assignment():
    # reference: ValueError at assignment (``model.py:188``)
    with pytest.raises(
        ValueError, match="Each entry in `bounds` must have length 2"
    ):
        BoxModel(bounds={"x": [0.0], "y": [-1, 1]})


@pytest.mark.parametrize(
    "bad_bounds, match",
    [
        # infinite bounds fall back to the new_point probe (reference
        # ``model.py:853-865``), which fails for the default new_point
        ({"x": [0.0, np.inf], "y": [-1, 1]}, "Could not draw a new point"),
        ({"x": [1.0, -1.0], "y": [-1, 1]}, "ordered"),
    ],
)
def test_verify_bad_bounds(rng, bad_bounds, match):
    m = BoxModel(bounds=bad_bounds)
    m.set_rng(rng)
    with pytest.raises(ModelError, match=match):
        m.verify_model()


def test_verify_log_prior_none(rng):
    class M(BoxModel):
        def log_prior(self, x):
            return None

    m = M()
    m.set_rng(rng)
    with pytest.raises(ModelError, match="Log-prior returned None"):
        m.verify_model()


def test_verify_log_likelihood_none(rng):
    class M(BoxModel):
        def log_likelihood(self, x):
            return None

    m = M()
    m.set_rng(rng)
    with pytest.raises(ModelError, match="Log-likelihood returned None"):
        m.verify_model()


def test_verify_log_likelihood_nan(rng):
    class M(BoxModel):
        def log_likelihood(self, x):
            return np.full(x.size, np.nan)

    m = M()
    m.set_rng(rng)
    with pytest.raises(ModelError, match="NaN"):
        m.verify_model()


def test_verify_multi_valued_likelihood(rng):
    """A likelihood that returns different values for the same point must
    be caught (reference nessai/model.py multi-valued check)."""

    class M(BoxModel):
        def __init__(self):
            super().__init__()
            self._counter = 0

        def log_likelihood(self, x):
            self._counter += 1
            return np.full(x.size, float(self._counter))

    m = M()
    m.set_rng(rng)
    with pytest.raises(ModelError):
        m.verify_model()


def test_verify_ok(box):
    box.verify_model()


# ----------------------------------------------------------------------
# bounds / points helpers
# ----------------------------------------------------------------------
def test_dims_and_bounds_arrays(box):
    assert box.dims == 2
    np.testing.assert_array_equal(box.lower_bounds, [-5.0, -5.0])
    np.testing.assert_array_equal(box.upper_bounds, [5.0, 5.0])


def test_new_point_single_and_batch(box):
    x1 = box.new_point(1)
    assert x1.size == 1
    xn = box.new_point(100)
    assert xn.size == 100
    assert box.in_bounds(xn).all()
    lp = box.new_point_log_prob(xn)
    assert np.isfinite(lp).all()


def test_in_bounds_mask(box):
    x = empty_structured_array(3, names=box.names)
    x["x"] = [0.0, -6.0, 2.0]
    x["y"] = [0.0, 0.0, 7.0]
    np.testing.assert_array_equal(box.in_bounds(x), [True, False, False])


def test_parameter_in_bounds(box):
    x = empty_structured_array(3, names=box.names)
    x["x"] = [0.0, -6.0, 4.0]
    np.testing.assert_array_equal(
        box.parameter_in_bounds(x["x"], "x"), [True, False, True]
    )


def test_unstructured_view(box):
    x = box.new_point(10)
    view = box.unstructured_view(x)
    assert view.shape == (10, 2)
    # it is a view: mutating it mutates the structured array
    view[0, 0] = 4.32
    assert x["x"][0] == 4.32


def test_sample_parameter_mixin(box):
    s = box.sample_parameter("x", n=50)
    assert len(s) == 50
    assert ((s >= -5) & (s <= 5)).all()


def test_sample_parameter_not_implemented(rng):
    class Plain(Model):
        names = ["x", "y"]
        bounds = {"x": [0, 1], "y": [0, 1]}

        def log_prior(self, x):
            return np.zeros(x.size)

        def log_likelihood(self, x):
            return np.zeros(x.size)

    m = Plain()
    m.set_rng(rng)
    with pytest.raises(NotImplementedError):
        m.sample_parameter("x")


def test_unit_hypercube_roundtrip(box):
    x = box.new_point(20)
    u = box.to_unit_hypercube(x)
    assert box.in_unit_hypercube(u).all()
    back = box.from_unit_hypercube(u)
    np.testing.assert_allclose(back["x"], x["x"], atol=1e-12)
    s = box.sample_unit_hypercube(10)
    assert box.in_unit_hypercube(s).all()


# ----------------------------------------------------------------------
# likelihood evaluation: dispatch, counters, timing
# ----------------------------------------------------------------------
def test_evaluate_log_likelihood_counter(box):
    x = box.new_point(1)
    before = box.likelihood_evaluations
    box.evaluate_log_likelihood(x[0])
    assert box.likelihood_evaluations == before + 1


def test_batch_evaluate_counters_and_time(box):
    x = box.new_point(64)
    before = box.likelihood_evaluations
    t_before = box.likelihood_evaluation_time
    out = box.batch_evaluate_log_likelihood(x)
    assert out.shape == (64,)
    assert box.likelihood_evaluations == before + 64
    assert box.likelihood_evaluation_time >= t_before


def test_batch_evaluate_scalar_loop(rng):
    """Non-vectorisable likelihood falls back to the scalar loop."""

    class Scalar(BoxModel):
        allow_vectorised = False

        def log_likelihood(self, x):
            # scalar-only: fails on arrays
            return -0.5 * float(x["x"]) ** 2

    m = Scalar()
    m.set_rng(rng)
    assert not m.vectorised_likelihood
    x = m.new_point(8)
    out = m.batch_evaluate_log_likelihood(x)
    np.testing.assert_allclose(out, -0.5 * x["x"] ** 2)


def test_jax_likelihood_preferred(rng):
    m = IntegrationTestModel(2)
    m.set_rng(rng)
    assert m.has_jax_likelihood
    assert m.vectorised_likelihood
    x = m.new_point(16)
    out = m.batch_evaluate_log_likelihood(x)
    np.testing.assert_allclose(out, m.log_likelihood(x), rtol=1e-5)


def test_batch_evaluate_unit_hypercube_flag(rng):
    m = IntegrationTestModel(2)
    m.set_rng(rng)
    u = m.sample_unit_hypercube(8)
    out = m.batch_evaluate_log_likelihood(u, unit_hypercube=True)
    direct = m.log_likelihood(m.from_unit_hypercube(u))
    np.testing.assert_allclose(out, direct, rtol=1e-5)


def test_likelihood_chunksize(rng):
    class Chunked(BoxModel):
        likelihood_chunksize = 10

    m = Chunked()
    m.set_rng(rng)
    x = m.new_point(25)
    out = m.batch_evaluate_log_likelihood(x)
    assert out.shape == (25,)


def test_pool_configuration(box):
    # n_pool creates a pool with the worker initializer (reference:
    # user-supplied pools must call initialise_pool_variables themselves)
    box.configure_pool(n_pool=1)
    try:
        assert box.pool is not None
        x = box.new_point(8)
        out = box.batch_evaluate_log_likelihood(x)
        assert out.shape == (8,)
    finally:
        box.close_pool()
    assert box.pool is None


def test_model_pickles_without_pool(box):
    box.configure_pool(n_pool=1)
    try:
        state = pickle.dumps(box)
    finally:
        box.close_pool()
    m2 = pickle.loads(state)
    assert m2.names == box.names


# ----------------------------------------------------------------------
# prior evaluation
# ----------------------------------------------------------------------
def test_batch_evaluate_log_prior(box):
    x = box.new_point(16)
    lp = box.batch_evaluate_log_prior(x)
    np.testing.assert_allclose(lp, np.full(16, -2 * np.log(10.0)), atol=1e-12)


def test_batch_evaluate_log_prior_unit_hypercube(box):
    u = box.sample_unit_hypercube(8)
    out = box.batch_evaluate_log_prior_unit_hypercube(u)
    np.testing.assert_array_equal(out, np.zeros(8))


def test_jax_prior_fast_path(rng):
    class JaxPrior(BoxModel):
        def jax_log_prior(self, x):
            import jax.numpy as jnp

            return -x.shape[-1] * jnp.log(10.0) * jnp.ones(x.shape[0])

    m = JaxPrior()
    m.set_rng(rng)
    assert m.has_jax_prior
    x = m.new_point(8)
    out = m.batch_evaluate_log_prior(x)
    np.testing.assert_allclose(out, m.log_prior(x), rtol=1e-6)


def test_rng_not_set_raises():
    # reference-exact: drawing without an rng raises RNGNotSetError
    from nessai_tpu.utils.errors import RNGNotSetError

    m = BoxModel()
    assert m.rng is None
    with pytest.raises(RNGNotSetError):
        m.new_point(2)


def test_set_rng_default_and_double_set():
    from nessai_tpu.utils.errors import RNGSetError

    m = BoxModel()
    m.set_rng()  # default generator
    assert m.rng is not None
    with pytest.raises(RNGSetError):
        m.set_rng(np.random.default_rng(1))
