"""Reference-parity behaviour tests for ``utils.multiprocessing``.

Mirrors ``/root/reference/tests/test_utils/test_multiprocessing_utils.py``
(thread-backed ``multiprocessing.dummy.Pool`` so the tests stay fast and
hermetic).
"""

import logging
from multiprocessing.dummy import Pool
from types import SimpleNamespace
from unittest.mock import patch

import numpy as np
import pytest

from nessai_tpu.utils.multiprocessing import (
    batch_evaluate_function,
    check_multiprocessing_start_method,
    check_vectorised_function,
    get_n_pool,
    initialise_pool_variables,
    log_likelihood_wrapper,
    log_prior_unit_hypercube_wrapper,
    log_prior_wrapper,
)


def test_pool_variables():
    model = SimpleNamespace(
        log_likelihood=lambda x: x * 100,
        log_prior=lambda x: x * 10,
        log_prior_unit_hypercube=lambda x: x / 10,
    )
    initialise_pool_variables(model)
    pool = Pool(1)
    out_ll = pool.map(log_likelihood_wrapper, [1, 2, 3])
    out_lp = pool.map(log_prior_wrapper, [1, 2, 3])
    out_lpu = pool.map(log_prior_unit_hypercube_wrapper, [1, 2, 3])
    pool.close()
    pool.terminate()
    assert out_ll == [100, 200, 300]
    assert out_lp == [10, 20, 30]
    assert out_lpu == [0.1, 0.2, 0.3]
    initialise_pool_variables(None)


def test_uninitialised_model_error():
    initialise_pool_variables(None)
    with pytest.raises(AttributeError, match="log_likelihood"):
        log_likelihood_wrapper(1)


@pytest.mark.parametrize("method", ["fork", "forkserver", "spawn"])
def test_check_multiprocessing_start_method(method, caplog):
    with (
        patch("multiprocessing.get_start_method", return_value=method),
        caplog.at_level(logging.WARNING, logger="nessai_tpu"),
    ):
        check_multiprocessing_start_method()
    if method != "fork":
        assert "This may lead to high memory usage or errors" in caplog.text


def test_get_n_pool_processes():
    pool = SimpleNamespace(_processes=4)
    assert get_n_pool(pool) == 4


def test_get_n_pool_ray():
    pool = SimpleNamespace(_actor_pool=4 * [0])
    assert get_n_pool(pool) == 4


def test_get_n_pool_executor():
    pool = SimpleNamespace(_max_workers=3)
    assert get_n_pool(pool) == 3


def test_get_n_pool_unknown():
    assert get_n_pool(SimpleNamespace()) is None


def test_get_n_pool_none():
    assert get_n_pool(None) is None


@pytest.mark.parametrize(
    "n, vectorised, chunksize, expected_calls",
    [
        (10, True, None, 1),
        (10, False, None, 10),
        (10, True, 4, 3),
        (10, False, 4, 10),
    ],
)
def test_batch_evaluate_function_call_counts(
    n, vectorised, chunksize, expected_calls
):
    calls = {"n": 0}

    def func(x):
        calls["n"] += 1
        return (-(x**2)).sum(-1)

    x = np.random.default_rng(0).standard_normal((n, 2))
    out = batch_evaluate_function(
        func, x, vectorised=vectorised, chunksize=chunksize
    )
    assert out.shape == (10,)
    assert calls["n"] == expected_calls


def test_batch_evaluate_function_with_pool_vectorised():
    pool = Pool(2)
    x = np.arange(10, dtype=float)[:, None]
    out = batch_evaluate_function(
        lambda xx: (-(xx**2)).sum(-1),
        x,
        vectorised=True,
        pool=pool,
        n_pool=2,
    )
    pool.close()
    pool.terminate()
    np.testing.assert_allclose(out, -(x[:, 0] ** 2))


def test_batch_evaluate_function_with_pool_scalar():
    pool = Pool(2)
    x = np.arange(6, dtype=float)[:, None]
    out = batch_evaluate_function(
        lambda xx: float(-(xx**2).sum()),
        x,
        vectorised=False,
        pool=pool,
        n_pool=2,
    )
    pool.close()
    pool.terminate()
    np.testing.assert_allclose(out, -(x[:, 0] ** 2))


def test_check_vectorised_function_pass():
    def func(x):
        return (-(x**2)).sum(axis=-1)

    x = np.arange(10)[:, np.newaxis]
    assert check_vectorised_function(func, x, dtype="float64") is True


def test_check_vectorised_function_error():
    def func(x):
        len(x)
        return 0.5

    x = np.arange(10)[:, np.newaxis]
    assert check_vectorised_function(func, x) is False


def test_check_vectorised_function_invalid_output():
    assert check_vectorised_function(lambda x: 0.5, np.arange(10)) is False


def test_check_vectorised_function_invalid_value():
    assert (
        check_vectorised_function(lambda x: np.cumsum(x), np.arange(10))
        is False
    )


def test_check_vectorised_function_invalid_input():
    with pytest.raises(ValueError, match=r"Input has length <= 1"):
        check_vectorised_function(lambda x: x, np.array([0]))
