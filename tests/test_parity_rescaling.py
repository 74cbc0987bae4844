"""Reference-parity behaviour tests for ``nessai_tpu.utils.rescaling``.

Each test asserts a behaviour covered by the reference suite
(``/root/reference/tests/test_utils/test_rescaling_utils.py``), written
fresh against this package's API (array-valued log-Jacobians).
"""

import numpy as np
import pytest
from scipy import stats

from nessai_tpu.utils.rescaling import (
    configure_edge_detection,
    detect_edge,
    determine_rescaled_bounds,
    exp_with_log_jacobian,
    gaussian_cdf,
    inverse_gaussian_cdf,
    inverse_rescale_minus_one_to_one,
    inverse_rescale_zero_to_one,
    log_with_log_jacobian,
    logistic_function,
    logit,
    rescale_minus_one_to_one,
    rescale_zero_to_one,
    sigmoid,
)


def test_rescale_minus_one_to_one_values():
    x = np.array([-5.0, -2.5, 0.0, 2.5, 5.0])
    x_out, log_j = rescale_minus_one_to_one(x, -5, 5)
    np.testing.assert_array_equal(x_out, [-1, -0.5, 0.0, 0.5, 1.0])
    np.testing.assert_allclose(log_j, np.log(2) - np.log(10))


def test_inverse_rescale_minus_one_to_one_values():
    x = np.array([-1, -0.5, 0.0, 0.5, 1.0])
    x_out, log_j = inverse_rescale_minus_one_to_one(x, -5, 5)
    np.testing.assert_array_equal(x_out, [-5.0, -2.5, 0.0, 2.5, 5.0])
    np.testing.assert_allclose(log_j, -np.log(2) + np.log(10))


def test_rescale_zero_to_one_values():
    x = np.array([-5.0, -2.5, 0.0, 2.5, 5.0])
    x_out, log_j = rescale_zero_to_one(x, -5, 5)
    np.testing.assert_array_equal(x_out, [0, 0.25, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(log_j, -np.log(10))


def test_inverse_rescale_zero_to_one_values():
    x = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    x_out, log_j = inverse_rescale_zero_to_one(x, -5, 5)
    np.testing.assert_array_equal(x_out, [-5.0, -2.5, 0.0, 2.5, 5.0])
    np.testing.assert_allclose(log_j, np.log(10))


@pytest.mark.parametrize(
    "test, expected",
    [(False, False), ("lower", False), ("upper", "upper"), ("both", "both")],
)
def test_detect_edge_test_mode(test, expected):
    # test mode skips the histogram entirely
    out = detect_edge(1, test=test, allowed_bounds=["upper"])
    assert out == expected


@pytest.mark.parametrize(
    "samples, kwargs, expected",
    [
        # density piled at the upper bound
        (np.concatenate([np.full(90, 2.9), np.linspace(0, 3, 10)]), {}, "upper"),
        # density piled at the lower bound
        (np.concatenate([np.full(90, 0.05), np.linspace(0, 3, 10)]), {}, "lower"),
        # flat-ish interior max -> none when allowed
        (np.full(100, 1.5), {"allow_none": True, "x_range": [0, 3]}, False),
        # both edges -> both when allowed
        (
            np.concatenate([np.full(50, 0.05), np.full(50, 2.95)]),
            {"allow_both": True},
            "both",
        ),
        # lower only allowed_bounds excludes detection at lower
        (
            np.concatenate([np.full(90, 0.05), np.linspace(0, 3, 10)]),
            {"allowed_bounds": ["upper"], "allow_none": True},
            False,
        ),
    ],
)
def test_detect_edge_density(samples, kwargs, expected):
    out = detect_edge(samples, nbins=3, **kwargs)
    assert out == expected


def test_detect_edge_auto_bins_runs():
    rng = np.random.default_rng(42)
    out = detect_edge(rng.uniform(0, 1, 500), nbins="auto", allow_none=True)
    assert out in (False, "lower", "upper")


def test_detect_edge_invalid_bound():
    with pytest.raises(RuntimeError) as excinfo:
        detect_edge(1, allowed_bounds=["both"])
    assert "Unknown allowed bounds: ['both']" in str(excinfo.value)


def test_configure_edge_detection_detect_edges():
    out = configure_edge_detection({"x": 1}, detect_edges=True)
    assert out == {"x": 1, "allow_none": True, "cutoff": 0.5}


def test_configure_edge_detection_no_detect_edges():
    out = configure_edge_detection(None, False)
    assert out == {"allow_none": False, "cutoff": 0.0}


@pytest.mark.parametrize(
    "prior_min, prior_max, x_min, x_max, kwargs, expected",
    [
        (-10, 8, -2, 2, {"inversion": False}, (-5, 4)),
        (-10, 8, -2, 2, {"inversion": True, "invert": False}, (-5, 4)),
        (-10, 8, -2, 2, {"inversion": False, "invert": "lower"}, (-5, 4)),
        (-10, 6, -2, 2, {"invert": "lower", "inversion": True}, (-2, 2)),
        (-10, 6, -2, 2, {"invert": "upper", "inversion": True}, (-3, 3)),
        (-10, 6, -2, 2, {"invert": "both", "inversion": True}, (-0.5, 1.5)),
    ],
)
def test_determine_rescaled_bounds_reference_cases(
    prior_min, prior_max, x_min, x_max, kwargs, expected
):
    out = determine_rescaled_bounds(
        prior_min, prior_max, x_min, x_max, **kwargs
    )
    assert out == expected


def test_determine_rescaled_bounds_min_max_equal():
    with pytest.raises(ValueError) as excinfo:
        determine_rescaled_bounds(-1, 1, 0.5, 0.5)
    assert "New minimum and maximum are equal" in str(excinfo.value)


def test_determine_rescaled_bounds_invalid_invert():
    with pytest.raises(ValueError) as excinfo:
        determine_rescaled_bounds(
            -1, 1, -0.5, 0.5, invert="test", inversion=True
        )
    assert "Invalid value for `invert`: test" in str(excinfo.value)


def test_determine_rescaled_bounds_invert_without_inversion_warns(caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="nessai_tpu"):
        out = determine_rescaled_bounds(
            -10, 8, -2, 2, invert="lower", inversion=False
        )
    assert out == (-5, 4)


@pytest.mark.parametrize("x, y", [(0.0, -np.inf), (1.0, np.inf)])
def test_logit_bounds(x, y):
    with np.errstate(divide="ignore"):
        out, log_j = logit(np.array(x), eps=0)
    assert out == y
    assert log_j == np.inf


@pytest.mark.parametrize("x, y", [(np.inf, 1.0), (-np.inf, 0.0)])
def test_sigmoid_bounds(x, y):
    with np.errstate(divide="ignore"):
        out, log_j = sigmoid(np.array(x))
    assert out == y
    assert log_j == -np.inf


@pytest.mark.parametrize("p", [1e-5, 0.5, 1.0 - 1e-5])
@pytest.mark.parametrize("eps", [1e-12, None])
def test_logit_sigmoid_invertible(p, eps):
    x = logit(np.array(p), eps=eps)
    y = sigmoid(x[0])
    np.testing.assert_almost_equal(p, y[0], decimal=10)
    np.testing.assert_almost_equal(x[1] + y[1], 0.0, decimal=10)


@pytest.mark.parametrize("p", [-10.0, -1.0, 0.0, 1.0, 10.0])
@pytest.mark.parametrize("eps", [1e-12, None])
def test_sigmoid_logit_invertible(p, eps):
    x = sigmoid(np.array(p))
    y = logit(x[0], eps=eps)
    np.testing.assert_almost_equal(p, y[0], decimal=10)
    np.testing.assert_almost_equal(x[1] + y[1], 0.0, decimal=10)


def test_logistic_function_with_midpoint_and_gradient():
    assert logistic_function(0.0, 3.0, 2.0) == 1 / (1 + np.exp(6))


def test_logistic_function_matches_scipy_expit():
    from scipy.special import expit

    x = np.array([-5.0, 0.0, 5.0])
    np.testing.assert_array_equal(logistic_function(x), expit(x))


def test_log_with_log_jacobian_values():
    x = np.random.default_rng(1).random(10)
    x_log, logj = log_with_log_jacobian(x)
    np.testing.assert_array_equal(x_log, np.log(x))
    np.testing.assert_array_equal(logj, -np.log(x))


def test_exp_with_log_jacobian_values():
    x = np.random.default_rng(2).standard_normal(10)
    x_exp, logj = exp_with_log_jacobian(x)
    np.testing.assert_array_equal(x_exp, np.exp(x))
    np.testing.assert_array_equal(logj, x)


def test_log_exp_inverse():
    x = np.random.default_rng(3).random(10)
    x_log, logj_log = log_with_log_jacobian(x)
    x_out, logj_exp = exp_with_log_jacobian(x_log)
    np.testing.assert_almost_equal(x_out, x, decimal=14)
    np.testing.assert_almost_equal(logj_log, -logj_exp, decimal=14)


def test_gaussian_cdf_matches_scipy():
    x = np.random.default_rng(4).standard_normal(10)
    x_out, _ = gaussian_cdf(x)
    np.testing.assert_allclose(x_out, stats.norm.cdf(x), atol=1e-15)


def test_inverse_gaussian_cdf_matches_scipy():
    x = np.random.default_rng(5).random(10)
    x_out, _ = inverse_gaussian_cdf(x)
    np.testing.assert_allclose(x_out, stats.norm.ppf(x), atol=1e-12)


def test_gaussian_cdf_invertible():
    x = np.random.default_rng(6).random(100)
    xp, log_j = inverse_gaussian_cdf(x)
    x_out, log_j_inv = gaussian_cdf(xp)
    np.testing.assert_array_almost_equal(x_out, x, decimal=10)
    np.testing.assert_array_almost_equal(-log_j_inv, log_j, decimal=10)
