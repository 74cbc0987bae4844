"""Reference-parity behaviour tests for
``utils.{settings,testing,threading,distributions}``.

Behaviours mirrored from ``/root/reference/tests/test_utils/
{test_settings,test_testing_utils,test_threading_utils,
test_distribution_utils}.py``, written fresh against this package's API.
"""

import numpy as np
import pytest

from nessai_tpu.utils.settings import (
    get_all_kwargs,
    get_run_kwargs_list,
    get_standard_methods,
)
from nessai_tpu.utils.testing import (
    IntegrationTestModel,
    assert_structured_arrays_equal,
)


# ----------------------------------------------------------------------
# settings
# ----------------------------------------------------------------------
def test_get_standard_methods_list():
    methods = get_standard_methods()
    assert len(methods) >= 3
    assert all(callable(m) for m in methods)


@pytest.mark.parametrize("ins", [False, True])
def test_get_all_kwargs_contains_sampler_knobs(ins):
    out = get_all_kwargs(importance_nested_sampler=ins)
    assert isinstance(out, dict)
    assert "nlive" in out
    assert "output" in out
    # positional args must not appear
    assert "model" not in out
    assert "kwargs" not in out


@pytest.mark.parametrize("ins", [False, True])
def test_get_all_kwargs_split(ins):
    out = get_all_kwargs(importance_nested_sampler=ins, split_kwargs=True)
    assert isinstance(out, (list, tuple))
    assert all(isinstance(d, dict) for d in out)
    merged = {}
    for d in out:
        merged.update(d)
    assert "nlive" in merged


@pytest.mark.parametrize("ins", [False, True])
def test_get_run_kwargs_list(ins):
    out = get_run_kwargs_list(importance_nested_sampler=ins)
    assert isinstance(out, list)
    assert "plot" in out
    assert "save" in out


# ----------------------------------------------------------------------
# testing utils
# ----------------------------------------------------------------------
@pytest.mark.parametrize("n", [1, 10])
@pytest.mark.parametrize("dims", [2, 4])
def test_integration_test_model(n, dims, rng):
    model = IntegrationTestModel(dims)
    model.set_rng(rng)
    model.verify_model()
    x = model.new_point(n)
    log_p = model.log_prior(x)
    log_l = model.log_likelihood(x)
    assert np.isfinite(log_p).all()
    assert np.isfinite(log_l).all()
    assert len(np.atleast_1d(log_p)) == len(np.atleast_1d(x))
    assert len(np.atleast_1d(log_l)) == len(np.atleast_1d(x))
    x_hyper = model.to_unit_hypercube(x)
    x_re = model.from_unit_hypercube(x_hyper)
    assert_structured_arrays_equal(x_re, x, rtol=1e-14, atol=1e-14)
    assert len(np.atleast_1d(x_hyper)) == len(np.atleast_1d(x))


def test_assert_struct_arrays_different_fields():
    x = np.array((1, 2), dtype=[("x", "f8"), ("y", "f8")])
    y = np.array((1, 2), dtype=[("x", "f8"), ("y", "f4")])
    with pytest.raises(AssertionError):
        assert_structured_arrays_equal(x, y)


def test_assert_struct_arrays_equal_values():
    dtype = [("x", "f8"), ("y", "f8"), ("z", "f4")]
    x = np.array((1, 2, 3), dtype=dtype)
    y = np.array((1, 3, 4), dtype=dtype)
    with pytest.raises(AssertionError):
        assert_structured_arrays_equal(x, y)


@pytest.mark.parametrize(
    "y",
    [
        np.array([(2, 3), (4, 5)], dtype=[("x", "f8"), ("y", "f8")]),
        np.array([(1, 2)], dtype=[("x", "f8"), ("y", "f8")]),
    ],
)
def test_assert_struct_arrays_equal_array_mismatch(y):
    x = np.array([(1, 2), (3, 4)], dtype=[("x", "f8"), ("y", "f8")])
    with pytest.raises(AssertionError):
        assert_structured_arrays_equal(x, y)


def test_assert_struct_arrays_equal_nans_ok():
    dtype = [("x", "f8"), ("y", "f8"), ("z", "f4")]
    x = np.array((1, 2, np.nan), dtype=dtype)
    y = np.array((1, 2, np.nan), dtype=dtype)
    assert_structured_arrays_equal(x, y)


def test_assert_struct_array_equal_tol():
    dtype = [("x", "f8"), ("y", "f8"), ("z", "f8")]
    x = np.array((1.0, 2.0, 3.0), dtype=dtype)
    y = np.array((1.0, 2.0, 3.0 + 1e-10), dtype=dtype)
    assert_structured_arrays_equal(x, y, atol=1e-9, rtol=0.0)


def test_assert_struct_array_equal_tol_error():
    dtype = [("x", "f8"), ("y", "f8"), ("z", "f8")]
    x = np.array((1.0, 2.0, 3.0), dtype=dtype)
    y = np.array((1.0, 2.0, 3.0 + 1e-10), dtype=dtype)
    with pytest.raises(AssertionError):
        assert_structured_arrays_equal(x, y, atol=1e-11, rtol=0.0)


# ----------------------------------------------------------------------
# threading
# ----------------------------------------------------------------------
def test_configure_threads_noop_on_none():
    from nessai_tpu.utils.threading import configure_threads

    configure_threads(pytorch_threads=None)  # must not raise


def test_configure_threads_with_value():
    from nessai_tpu.utils.threading import configure_threads

    configure_threads(pytorch_threads=1)  # must not raise


# ----------------------------------------------------------------------
# distributions
# ----------------------------------------------------------------------
def test_get_uniform_distribution_bounds():
    import jax

    from nessai_tpu.utils.distributions import get_uniform_distribution

    dist = get_uniform_distribution(3, 2.0)
    s = dist.sample(jax.random.PRNGKey(0), 100)
    s = np.asarray(s)
    assert s.shape == (100, 3)
    assert np.all(s >= -2.0) and np.all(s <= 2.0)
    lp = np.asarray(dist.log_prob(s))
    np.testing.assert_allclose(lp, -3 * np.log(4.0), rtol=1e-6)


def test_get_multivariate_normal_var():
    import jax

    from nessai_tpu.utils.distributions import get_multivariate_normal

    dist = get_multivariate_normal(2, var=2.0)
    s = np.asarray(dist.sample(jax.random.PRNGKey(1), 50_000))
    assert s.shape == (50_000, 2)
    np.testing.assert_allclose(s.var(axis=0), 2.0, rtol=0.05)
    # log_prob matches the analytic diagonal Gaussian
    lp = np.asarray(dist.log_prob(np.zeros((1, 2))))
    expected = -0.5 * 2 * np.log(2 * np.pi * 2.0)
    np.testing.assert_allclose(lp, expected, rtol=1e-5)
