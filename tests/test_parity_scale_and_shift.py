"""Reference-parity behaviour tests for ``ScaleAndShift``.

Mirrors ``/root/reference/tests/test_reparameterisations/
test_scale_and_shift.py``, written fresh against this package's API
(here ``shift=None`` normalises to a zero-shift dict — mathematically
identical to the reference's ``None``).
"""

import numpy as np
import pytest
from scipy import stats

from nessai_tpu.livepoint import (
    empty_structured_array,
    numpy_array_to_live_points,
)
from nessai_tpu.reparameterisations import ScaleAndShift
from nessai_tpu.utils.testing import assert_structured_arrays_equal

PARAMETERS = ["x", "y"]
PRIOR_BOUNDS = {p: [-1, 1] for p in PARAMETERS}


def make(scale=None, shift=None, **kwargs):
    return ScaleAndShift(
        parameters=PARAMETERS,
        prior_bounds=PRIOR_BOUNDS,
        scale=scale,
        shift=shift,
        **kwargs,
    )


@pytest.mark.parametrize("scale", [2, 2.0, [1, 2], {"x": 1, "y": 2}])
def test_init_scale_types(scale):
    reparam = make(scale=scale)
    assert not set(reparam.scale.keys()) - set(PARAMETERS)
    assert isinstance(reparam.scale["x"], float)
    assert reparam.estimate_scale is False
    assert reparam.estimate_shift is False


def test_init_scale_and_shift():
    reparam = make(scale=1.0, shift=2.0)
    assert reparam.scale == {"x": 1.0, "y": 1.0}
    assert reparam.shift == {"x": 2.0, "y": 2.0}


def test_init_estimate():
    reparam = make(estimate_scale=True, estimate_shift=True)
    assert reparam.estimate_scale is True
    assert reparam.estimate_shift is True
    assert list(reparam.scale) == PARAMETERS
    assert list(reparam.shift) == PARAMETERS
    assert all(v == 1 for v in reparam.scale.values())
    assert all(v == 0 for v in reparam.shift.values())


def test_init_no_scale():
    with pytest.raises(
        RuntimeError, match="Must specify a scale or enable estimate_scale"
    ):
        make(scale=None, estimate_scale=False)


@pytest.mark.parametrize("scale", [[1], [1, 2, 3]])
def test_init_incorrect_scale_list(scale):
    with pytest.raises(RuntimeError, match="different length"):
        make(scale=scale)


@pytest.mark.parametrize("scale", [{"x": 1}, {"x": 1, "y": 1, "z": 1}])
def test_init_incorrect_scale_dict(scale):
    with pytest.raises(RuntimeError, match="Mismatched parameters"):
        make(scale=scale)


def test_init_incorrect_scale_type():
    with pytest.raises(TypeError, match=r"scale input must be .*"):
        make(scale="1")


def test_init_incorrect_shift_type():
    with pytest.raises(TypeError, match=r"shift input must be .*"):
        make(scale=1, shift="1")


@pytest.mark.parametrize("n", [1, 2])
def test_reparameterise_scale(n):
    reparam = make(scale={"x": -2.0, "y": 4.0})
    x = numpy_array_to_live_points(np.ones((n, 2)), PARAMETERS)
    x_prime = numpy_array_to_live_points(
        np.zeros((n, 2)), reparam.prime_parameters
    )
    log_j = np.zeros(n)
    x_out, x_prime_out, log_j_out = reparam.reparameterise(
        x, x_prime, log_j
    )
    assert_structured_arrays_equal(x, x_out)
    np.testing.assert_allclose(log_j_out, -np.log(8 * np.ones(n)))
    assert (x_prime_out[reparam.prime_parameters[0]] == -0.5).all()
    assert (x_prime_out[reparam.prime_parameters[1]] == 0.25).all()


@pytest.mark.parametrize("n", [1, 2])
def test_reparameterise_scale_and_shift(n):
    reparam = make(
        scale={"x": -2.0, "y": 4.0}, shift={"x": 2.0, "y": -2.0}
    )
    x = numpy_array_to_live_points(np.ones((n, 2)), PARAMETERS)
    x_prime = numpy_array_to_live_points(
        np.zeros((n, 2)), reparam.prime_parameters
    )
    log_j = np.zeros(n)
    _, x_prime_out, log_j_out = reparam.reparameterise(x, x_prime, log_j)
    np.testing.assert_allclose(log_j_out, -np.log(8 * np.ones(n)))
    assert (x_prime_out[reparam.prime_parameters[0]] == 0.5).all()
    assert (x_prime_out[reparam.prime_parameters[1]] == 0.75).all()


@pytest.mark.parametrize("n", [1, 2])
def test_reparameterise_pre_rescaling(n):
    reparam = make(
        scale={"x": -2.0, "y": 4.0},
        shift={"x": 1.0, "y": -2.0},
        pre_rescaling="inv_gaussian_cdf",
    )
    x = numpy_array_to_live_points(0.2 * np.ones((n, 2)), PARAMETERS)
    x_prime = empty_structured_array(n, names=reparam.prime_parameters)
    log_j = np.zeros(n)
    _, x_prime_out, _ = reparam.reparameterise(x.copy(), x_prime, log_j)
    np.testing.assert_allclose(
        x_prime_out[reparam.prime_parameters[0]],
        (stats.norm.ppf(0.2) - 1.0) / -2,
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        x_prime_out[reparam.prime_parameters[1]],
        (stats.norm.ppf(0.2) + 2.0) / 4.0,
        rtol=1e-12,
    )


@pytest.mark.parametrize("n", [1, 2])
def test_reparameterise_post_rescaling(n):
    reparam = make(
        scale={"x": -2.0, "y": 4.0},
        shift={"x": 2.0, "y": -2.0},
        post_rescaling="gaussian_cdf",
    )
    x = numpy_array_to_live_points(np.ones((n, 2)), PARAMETERS)
    x_prime = numpy_array_to_live_points(
        np.zeros((n, 2)), reparam.prime_parameters
    )
    log_j = np.zeros(n)
    _, x_prime_out, _ = reparam.reparameterise(x, x_prime, log_j)
    np.testing.assert_allclose(
        x_prime_out[reparam.prime_parameters[0]],
        stats.norm.cdf(0.5),
        rtol=1e-14,
    )
    np.testing.assert_allclose(
        x_prime_out[reparam.prime_parameters[1]],
        stats.norm.cdf(0.75),
        rtol=1e-14,
    )


@pytest.mark.parametrize("scale", [1e60, 1e-60])
def test_reparameterise_scale_overflow(scale):
    reparam = ScaleAndShift(
        parameters=["x", "y"],
        prior_bounds=PRIOR_BOUNDS,
        scale=scale,
    )
    x_array = np.arange(100.0, dtype=float)
    x = numpy_array_to_live_points(
        scale * np.stack([x_array, x_array], axis=1), ["x", "y"]
    )
    x_prime = numpy_array_to_live_points(
        np.ones((x_array.size, 2)), reparam.prime_parameters
    )
    log_j = np.zeros(x.size)
    _, x_prime_out, log_j_out = reparam.reparameterise(x, x_prime, log_j)
    np.testing.assert_array_almost_equal(
        x_array, x_prime_out[reparam.prime_parameters[0]], decimal=14
    )
    np.testing.assert_allclose(log_j_out, -2 * np.log(scale))


@pytest.mark.parametrize("n", [1, 2])
def test_inverse_reparameterise_scale(n):
    reparam = make(scale={"x": -2.0, "y": 4.0})
    x = numpy_array_to_live_points(np.zeros((n, 2)), PARAMETERS)
    x_prime = numpy_array_to_live_points(
        np.ones((n, 2)), reparam.prime_parameters
    )
    x_prime[reparam.prime_parameters[0]] *= -1
    log_j = np.zeros(n)
    x_out, x_prime_out, log_j_out = reparam.inverse_reparameterise(
        x, x_prime, log_j
    )
    assert_structured_arrays_equal(x_prime, x_prime_out)
    np.testing.assert_allclose(log_j_out, np.log(8 * np.ones(n)))
    assert (x_out["x"] == 2.0).all()
    assert (x_out["y"] == 4.0).all()


@pytest.mark.parametrize("n", [1, 2])
def test_inverse_reparameterise_scale_and_shift(n):
    reparam = make(
        scale={"x": -2.0, "y": 4.0}, shift={"x": 1.0, "y": -2.0}
    )
    x = numpy_array_to_live_points(np.zeros((n, 2)), PARAMETERS)
    x_prime = numpy_array_to_live_points(
        np.ones((n, 2)), reparam.prime_parameters
    )
    x_prime[reparam.prime_parameters[0]] *= -1
    log_j = np.zeros(n)
    x_out, _, log_j_out = reparam.inverse_reparameterise(
        x, x_prime, log_j
    )
    np.testing.assert_allclose(log_j_out, np.log(8 * np.ones(n)))
    assert (x_out["x"] == 3.0).all()
    assert (x_out["y"] == 2.0).all()


@pytest.mark.parametrize("scale", [1e60, 1e-60])
def test_inverse_reparameterise_scale_overflow(scale):
    reparam = ScaleAndShift(
        parameters=["x", "y"], prior_bounds=PRIOR_BOUNDS, scale=scale
    )
    x_array = np.arange(100.0, dtype=float)
    x = numpy_array_to_live_points(
        np.ones((x_array.size, 2)), ["x", "y"]
    )
    x_prime = numpy_array_to_live_points(
        np.stack([x_array, x_array], axis=1), reparam.prime_parameters
    )
    log_j = np.zeros(x.size)
    x_out, _, log_j_out = reparam.inverse_reparameterise(
        x, x_prime, log_j
    )
    np.testing.assert_array_equal(x_array * scale, x_out["x"])
    np.testing.assert_allclose(log_j_out, 2 * np.log(scale))


@pytest.mark.parametrize("est_scale", [False, True])
@pytest.mark.parametrize("est_shift", [False, True])
def test_update_estimates(rng, est_scale, est_shift):
    reparam = make(
        scale=1.0, estimate_scale=est_scale, estimate_shift=est_shift
    )
    x = numpy_array_to_live_points(
        rng.standard_normal((64, 2)) * 3.0 + 2.0, PARAMETERS
    )
    old_scale = dict(reparam.scale)
    old_shift = dict(reparam.shift)
    reparam.update(x)
    for p in PARAMETERS:
        if est_scale:
            np.testing.assert_allclose(
                reparam.scale[p], np.std(np.asarray(x[p], float))
            )
        else:
            assert reparam.scale[p] == old_scale[p]
        if est_shift:
            np.testing.assert_allclose(
                reparam.shift[p], np.mean(np.asarray(x[p], float))
            )
        else:
            assert reparam.shift[p] == old_shift[p]


@pytest.mark.parametrize("est_scale", [False, True])
@pytest.mark.parametrize("est_shift", [False, True])
def test_reset_estimates(rng, est_scale, est_shift):
    reparam = make(
        scale=1.0, estimate_scale=est_scale, estimate_shift=est_shift
    )
    x = numpy_array_to_live_points(
        rng.standard_normal((64, 2)) * 3.0 + 2.0, PARAMETERS
    )
    reparam.update(x)
    reparam.reset()
    if est_scale:
        assert all(s == 1.0 for s in reparam.scale.values())
    if est_shift:
        assert all(s == 0.0 for s in reparam.shift.values())


@pytest.mark.parametrize("scale", [-2.0, 2.0])
@pytest.mark.parametrize("shift", [-2.0, 2.0, None])
@pytest.mark.parametrize("estimate_scale", [True, False])
@pytest.mark.parametrize("estimate_shift", [True, False])
@pytest.mark.parametrize("pre_rescaling", [None, "inv_gaussian_cdf"])
@pytest.mark.parametrize("post_rescaling", [None, "gaussian_cdf"])
def test_invertible(
    rng, scale, shift, estimate_scale, estimate_shift, pre_rescaling,
    post_rescaling,
):
    """Round-trip invertibility across the full settings grid."""
    if pre_rescaling is not None:
        # pre-rescaling expects unit-hypercube inputs
        vals = rng.random((100, 2))
    else:
        vals = rng.uniform(-1, 1, (100, 2))
    x = numpy_array_to_live_points(vals, PARAMETERS)
    reparam = ScaleAndShift(
        parameters=PARAMETERS,
        prior_bounds=PRIOR_BOUNDS,
        scale=scale,
        shift=shift,
        estimate_scale=estimate_scale,
        estimate_shift=estimate_shift,
        pre_rescaling=pre_rescaling,
        post_rescaling=post_rescaling,
    )
    reparam.update(x)
    x_prime = empty_structured_array(
        x.size, names=reparam.prime_parameters
    )
    log_j = np.zeros(x.size)
    _, x_prime_out, log_j_f = reparam.reparameterise(
        x.copy(), x_prime, log_j.copy()
    )
    x_back = empty_structured_array(x.size, names=PARAMETERS)
    x_back_out, _, log_j_b = reparam.inverse_reparameterise(
        x_back, x_prime_out, np.zeros(x.size)
    )
    for p in PARAMETERS:
        np.testing.assert_allclose(
            x_back_out[p], np.asarray(x[p], float), atol=1e-10, rtol=1e-10
        )
    # gaussian_cdf -> ppf round trips leave ~1e-10 residual in the tails
    np.testing.assert_allclose(log_j_f + log_j_b, 0.0, atol=1e-8)
