"""Reference-parity behaviour tests for ``nessai_tpu.model.Model``.

Mirrors ``/root/reference/tests/test_model.py`` (1509 LoC, 100 tests),
written fresh against this package's API.
"""

import logging
import pickle

import numpy as np
import pytest
from scipy.stats import norm

from nessai_tpu.livepoint import numpy_array_to_live_points
from nessai_tpu.model import (
    Model,
    ModelError,
    OneDimensionalModelError,
    UniformPriorMixin,
)
from nessai_tpu.utils.errors import RNGNotSetError, RNGSetError


class BasicModel(Model):
    def __init__(self):
        self.bounds = {"x": [-5, 5], "y": [-5, 5]}
        self.names = ["x", "y"]

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for n in self.names:
            log_p -= np.log(self.bounds[n][1] - self.bounds[n][0])
        return log_p

    def log_likelihood(self, x):
        log_l = np.ones(x.size)
        for pn in self.names:
            log_l += norm.logpdf(x[pn])
        return log_l


@pytest.fixture
def basic(rng):
    m = BasicModel()
    m.set_rng(rng)
    return m


# ----------------------------------------------------------------------
# names / bounds properties
# ----------------------------------------------------------------------
def test_names_returns_set_value(basic):
    assert basic.names == ["x", "y"]


def test_names_invalid_type():
    m = BasicModel()
    with pytest.raises(TypeError, match="`names` must be a list"):
        m.names = True


def test_names_empty_list():
    m = BasicModel()
    with pytest.raises(ValueError, match="`names` list is empty"):
        m.names = []


def test_names_1d_list():
    m = BasicModel()
    with pytest.raises(
        OneDimensionalModelError, match="names list has length 1"
    ):
        m.names = ["x"]


def test_bounds_setter_stores_arrays(basic):
    basic.bounds = {"x": [-1, 1], "y": [-2, 2]}
    assert list(basic.bounds.keys()) == ["x", "y"]
    np.testing.assert_array_equal(basic.bounds["x"], [-1, 1])
    np.testing.assert_array_equal(basic.bounds["y"], [-2, 2])


def test_bounds_invalid_type():
    m = BasicModel()
    with pytest.raises(TypeError, match="`bounds` must be a dictionary"):
        m.bounds = True


def test_bounds_1d():
    m = BasicModel()
    with pytest.raises(
        OneDimensionalModelError, match="bounds dictionary has length 1"
    ):
        m.bounds = {"x": [0, 1]}


@pytest.mark.parametrize("b", [[1], [1, 2, 3]])
def test_bounds_incorrect_length(b):
    m = BasicModel()
    with pytest.raises(
        ValueError, match="Each entry in `bounds` must have length 2"
    ):
        m.bounds = {"x": b, "y": [0, 1]}


def test_model_1d_error_at_construction():
    class TestModel(BasicModel):
        def __init__(self):
            self.names = ["x"]
            self.bounds = {"x": [-5, 5]}

    with pytest.raises(OneDimensionalModelError) as excinfo:
        TestModel()
    assert "one-dimensional models" in str(excinfo.value)


def test_dims(basic):
    assert basic.dims == 2


def test_lower_upper_bounds_follow_names_order():
    m = BasicModel()
    m.names = ["y", "x"]
    m.bounds = {"x": [0, 1], "y": [-1, 2]}
    np.testing.assert_array_equal(m.lower_bounds, np.array([-1, 0]))
    np.testing.assert_array_equal(m.upper_bounds, np.array([2, 1]))


# ----------------------------------------------------------------------
# discrete parameters
# ----------------------------------------------------------------------
def test_discrete_parameters_default(basic):
    assert basic.discrete_parameters is None
    assert basic.has_discrete_parameters is False


def test_discrete_parameters_setter_warns(basic, caplog):
    with caplog.at_level(logging.WARNING, logger="nessai_tpu"):
        basic.discrete_parameters = ["x"]
    assert "discrete parameters is experimental" in caplog.text
    assert basic.discrete_parameters == ["x"]
    assert basic.has_discrete_parameters is True


# ----------------------------------------------------------------------
# vectorisation detection
# ----------------------------------------------------------------------
def test_vectorised_likelihood_true(basic):
    assert basic.vectorised_likelihood is True


def test_vectorised_likelihood_allow_vectorised_false(basic):
    basic.allow_vectorised = False
    basic._vectorised_likelihood = None
    assert basic.vectorised_likelihood is False


def test_vectorised_likelihood_error_means_false(rng):
    class M(BasicModel):
        def log_likelihood(self, x):
            if x.size > 1:
                raise ValueError
            return np.zeros(1)

    m = M()
    m.set_rng(rng)
    assert m.vectorised_likelihood is False


def test_vectorised_likelihood_setter(basic):
    basic.vectorised_likelihood = "test"
    assert basic._vectorised_likelihood == "test"


@pytest.mark.parametrize("allow", [True, False])
def test_vectorised_prior(basic, allow):
    basic.allow_vectorised_prior = allow
    basic._vectorised_prior = None
    assert basic.vectorised_prior is (True and allow)


def test_vectorised_prior_setter(basic):
    basic.vectorised_prior = "test"
    assert basic._vectorised_prior == "test"


def test_vectorised_prior_unit_hypercube_setter(basic):
    basic.vectorised_prior_unit_hypercube = "test"
    assert basic._vectorised_prior_unit_hypercube == "test"


# ----------------------------------------------------------------------
# bounds checks
# ----------------------------------------------------------------------
def test_in_bounds_with_infinite_bounds():
    m = BasicModel()
    m.bounds = {"x": [0, 1], "y": [-np.inf, np.inf]}
    x = numpy_array_to_live_points(
        np.array([[0.5, 1.0], [2.0, 1.0]]), ["x", "y"]
    )
    np.testing.assert_array_equal(
        m.in_bounds(x), np.array([True, False])
    )


def test_parameter_in_bounds():
    # x is a plain array of values for one parameter
    # (reference: ``tests/test_model.py:327-333``)
    m = BasicModel()
    m.bounds = {"x": [0, 1], "y": [0, 4]}
    np.testing.assert_array_equal(
        m.parameter_in_bounds(np.array([0, 0.5, 1, 3]), "x"),
        np.array([True, True, True, False]),
    )


def test_sample_parameter_not_implemented(basic):
    with pytest.raises(NotImplementedError) as excinfo:
        Model.sample_parameter(basic, "x", n=2)
    assert "User must implement this method!" in str(excinfo.value)


# ----------------------------------------------------------------------
# new_point
# ----------------------------------------------------------------------
def test_new_point_single(basic):
    x = basic.new_point()
    assert x.size == 1
    assert (x["x"] >= -5) & (x["x"] <= 5)
    assert basic.new_point_log_prob(x) == 0


def test_new_point_multiple(basic):
    x = basic.new_point(N=100)
    assert x.size == 100
    assert np.all((x["x"] >= -5) & (x["x"] <= 5))
    assert np.all(np.isnan(x["logP"]))
    assert (basic.new_point_log_prob(x) == 0).all()


def test_new_point_rejection(rng):
    # prior only finite in the right half of the box
    class M(BasicModel):
        def log_prior(self, x):
            out = super().log_prior(x)
            return np.where(np.asarray(x["x"]) > 0, out, -np.inf)

    m = M()
    m.set_rng(rng)
    x = m.new_point(N=50)
    assert x.size == 50
    assert np.all(x["x"] > 0)


# ----------------------------------------------------------------------
# likelihood evaluation counters
# ----------------------------------------------------------------------
def test_evaluate_log_likelihood_counter_single(basic):
    basic.likelihood_evaluations = 1
    x = basic.new_point()
    basic.evaluate_log_likelihood(x)
    assert basic.likelihood_evaluations == 2


def test_batch_evaluate_log_likelihood_counter(basic):
    basic.likelihood_evaluations = 1
    x = basic.new_point(10)
    out = basic.batch_evaluate_log_likelihood(x)
    assert out.shape == (10,)
    assert basic.likelihood_evaluations == 11


# ----------------------------------------------------------------------
# hypercube maps
# ----------------------------------------------------------------------
def test_to_unit_hypercube_not_implemented(basic):
    with pytest.raises(NotImplementedError):
        Model.to_unit_hypercube(basic, 1)


def test_from_unit_hypercube_not_implemented(basic):
    with pytest.raises(NotImplementedError):
        Model.from_unit_hypercube(basic, 1)


def test_log_prior_unit_hypercube_bounds(basic):
    x = numpy_array_to_live_points(
        np.array([[0.5, 0.5], [-0.1, 0.5]]), ["x", "y"]
    )
    out = basic.log_prior_unit_hypercube(x)
    assert out[0] == 0
    assert out[1] == -np.inf


# ----------------------------------------------------------------------
# abstract methods / new_point pairing
# ----------------------------------------------------------------------
def test_missing_log_prior():
    class TestModel(Model):
        def __init__(self):
            self.bounds = {"x": [-5, 5], "y": [-5, 5]}
            self.names = ["x", "y"]

        def log_likelihood(self, x):
            return x

    with pytest.raises(TypeError, match="abstract"):
        TestModel()


def test_missing_log_likelihood():
    class TestModel(Model):
        def __init__(self):
            self.bounds = {"x": [-5, 5], "y": [-5, 5]}
            self.names = ["x", "y"]

        def log_prior(self, x):
            return 0.0

    with pytest.raises(TypeError, match="abstract"):
        TestModel()


def test_check_new_point_methods_valid():
    BasicModel().check_new_point_methods()


def test_check_new_point_methods_invalid_new_point():
    class TestModel(BasicModel):
        def new_point(self, N=1):
            return 0.0

    with pytest.raises(
        ModelError, match="`new_point` method has been redefined"
    ):
        TestModel().check_new_point_methods()


def test_check_new_point_methods_invalid_new_point_log_prob():
    class TestModel(BasicModel):
        def new_point_log_prob(self, x):
            return 0.0

    with pytest.raises(
        ModelError, match="`new_point_log_prob` method has been redefined"
    ):
        TestModel().check_new_point_methods()


# ----------------------------------------------------------------------
# verify_model branches
# ----------------------------------------------------------------------
def test_verify_broken_prior_valid_point_guard(rng):
    class BrokenModel(BasicModel):
        def log_prior(self, x):
            return -np.inf

    model = BrokenModel()
    model.set_rng(rng)
    with pytest.raises(ModelError, match="valid point"):
        model.verify_model()


def test_verify_float16_warning(caplog, rng):
    class M(BasicModel):
        def log_prior(self, x):
            return super().log_prior(x).astype(np.float16)

    m = M()
    m.set_rng(rng)
    with caplog.at_level(logging.WARNING, logger="nessai_tpu"):
        m.verify_model()
    assert "float16" in caplog.text


def test_verify_repeated_likelihood_calls(rng):
    class M(BasicModel):
        def log_likelihood(self, x):
            return super().log_likelihood(x) + self.rng.random()

    m = M()
    m.set_rng(rng)
    with pytest.raises(ModelError, match="[Rr]epeated"):
        m.verify_model()


def test_verify_repeated_likelihood_calls_allowed(rng):
    class M(BasicModel):
        allow_multi_valued_likelihood = True

        def log_likelihood(self, x):
            return super().log_likelihood(x) + self.rng.random()

    m = M()
    m.set_rng(rng)
    m.verify_model()


# ----------------------------------------------------------------------
# rng contract
# ----------------------------------------------------------------------
def test_rng_not_set_new_point():
    m = BasicModel()
    with pytest.raises(RNGNotSetError):
        m.new_point()


def test_rng_not_set_verify_model():
    m = BasicModel()
    with pytest.raises(RNGNotSetError):
        m.verify_model()


def test_rng_not_set_sample_unit_hypercube():
    class M(UniformPriorMixin, Model):
        def __init__(self):
            self.names = ["x", "y"]
            self.bounds = {n: [-1.0, 1.0] for n in self.names}

        def log_likelihood(self, x):
            return np.zeros(x.size)

    m = M()
    with pytest.raises(RNGNotSetError):
        m.sample_unit_hypercube()


def test_set_rng(rng):
    m = BasicModel()
    m.set_rng(rng)
    assert m.rng is rng


def test_set_rng_not_specified():
    m = BasicModel()
    m.set_rng()
    assert isinstance(m.rng, np.random.Generator)


def test_set_rng_already_set(rng):
    m = BasicModel()
    m.set_rng(rng)
    with pytest.raises(RNGSetError):
        m.set_rng(rng)


# ----------------------------------------------------------------------
# misc
# ----------------------------------------------------------------------
def test_unstructured_view(basic):
    x = basic.new_point(10)
    view = basic.unstructured_view(x)
    assert view.shape == (10, 2)
    np.testing.assert_array_equal(view[:, 0], x["x"])


def test_get_state_excludes_pool(basic):
    basic.pool = object()
    state = pickle.loads(pickle.dumps(basic)).__dict__
    assert state["pool"] is None


def test_in_bounds_integration_values(basic, rng):
    x = basic.new_point(100)
    assert basic.in_bounds(x).all()
    x["x"] += 100
    assert not basic.in_bounds(x).any()
