"""Reference-parity behaviour tests for ``RescaleToBounds``.

Mirrors ``/root/reference/tests/test_reparameterisations/
test_rescale_to_bounds.py`` at the behaviour level (no mocking of
internals) against this package's API.
"""

import numpy as np
import pytest

from nessai_tpu.livepoint import (
    empty_structured_array,
    numpy_array_to_live_points,
)
from nessai_tpu.reparameterisations import RescaleToBounds
from nessai_tpu.utils.testing import assert_structured_arrays_equal

PARAMETERS = ["x", "y"]
PRIOR_BOUNDS = {"x": [-1, 1], "y": [0, 1]}


def make(**kwargs):
    kwargs.setdefault("parameters", PARAMETERS)
    kwargs.setdefault("prior_bounds", PRIOR_BOUNDS)
    return RescaleToBounds(**kwargs)


def check_invertible(reparam, x, atol=1e-14, rtol=1e-14):
    """Round-trip x -> x' -> x and check values and the Jacobian."""
    n = x.size
    x_prime = empty_structured_array(n, names=reparam.prime_parameters)
    log_j = np.zeros(n)
    x_re, x_prime_re, log_j_re = reparam.reparameterise(
        x.copy(), x_prime, log_j
    )
    x_in = empty_structured_array(x_re.size, names=reparam.parameters)
    x_inv, _, log_j_inv = reparam.inverse_reparameterise(
        x_in, x_prime_re, np.zeros(x_re.size)
    )
    m = x_re.size // n
    for i in range(m):
        sl = slice(i * n, (i + 1) * n)
        for p in reparam.parameters:
            np.testing.assert_allclose(
                x_inv[p][sl], np.asarray(x[p], float), atol=atol, rtol=rtol
            )
    np.testing.assert_allclose(log_j_re, -log_j_inv, atol=atol, rtol=rtol)
    return True


def new_points(rng, n=100, bounds=PRIOR_BOUNDS, names=PARAMETERS):
    vals = np.stack(
        [rng.uniform(bounds[p][0], bounds[p][1], n) for p in names], axis=1
    )
    return numpy_array_to_live_points(vals, names)


# ----------------------------------------------------------------------
# Configuration
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "value, expected",
    [
        (None, {"x": [-1, 1], "y": [-1, 1]}),
        ([0, 1], {"x": [0, 1], "y": [0, 1]}),
        ({"x": [0, 1], "y": [-1, 1]}, {"x": [0, 1], "y": [-1, 1]}),
    ],
)
def test_rescale_bounds_config(value, expected):
    reparam = make(rescale_bounds=value)
    assert reparam.rescale_bounds == expected


def test_rescale_bounds_dict_missing_params():
    with pytest.raises(
        RuntimeError, match="Missing rescale bounds for parameters"
    ):
        make(rescale_bounds={"x": [0, 1]})


def test_rescale_bounds_incorrect_type():
    with pytest.raises(TypeError, match="must be an instance of list or dict"):
        make(rescale_bounds=1)


@pytest.mark.parametrize(
    "value, expected",
    [
        (True, {"x": "split", "y": "split"}),
        (False, False),
        (["x"], {"x": "split"}),
        ({"x": "split"}, {"x": "split"}),
        (None, False),
    ],
)
def test_boundary_inversion_config(value, expected):
    reparam = RescaleToBounds(
        parameters=PARAMETERS,
        prior_bounds={"x": [0, 1], "y": [0, 1]},
        boundary_inversion=value,
    )
    assert reparam.boundary_inversion == expected


def test_boundary_inversion_invalid_type():
    with pytest.raises(
        TypeError, match="boundary_inversion must be a list, dict or bool"
    ):
        make(boundary_inversion="Yes")


def test_detect_edges_without_inversion():
    with pytest.raises(
        RuntimeError,
        match="Must enable boundary inversion to use detect edges",
    ):
        make(detect_edges=True)


def test_set_offsets():
    reparam = RescaleToBounds(
        parameters=["x", "y"],
        prior_bounds={"x": [8, 32], "y": [2, 4]},
        offset=True,
        pre_rescaling=(
            lambda x: (np.asarray(x, float) / 2, np.zeros_like(x, dtype=float)),
            lambda x: (2 * np.asarray(x, float), np.zeros_like(x, dtype=float)),
        ),
    )
    assert reparam.offsets == {"x": 10.0, "y": 1.5}


def test_reset_inversion():
    reparam = make(boundary_inversion=True, prior_bounds={"x": [0, 1], "y": [0, 1]})
    reparam._edges = {"x": "lower", "y": "upper"}
    reparam.reset_inversion()
    assert reparam._edges == {"x": None, "y": None}


def test_reset_inversion_no_edges():
    reparam = make()
    assert reparam._edges is None
    reparam.reset_inversion()
    assert reparam._edges is None


def test_update_calls_bounds_and_inversion(rng):
    reparam = make(
        boundary_inversion=True, prior_bounds={"x": [0, 1], "y": [0, 1]}
    )
    reparam._edges = {"x": "lower", "y": "upper"}
    x = new_points(rng, bounds={"x": [0, 1], "y": [0, 1]})
    reparam.update(x)
    assert reparam._edges == {"x": None, "y": None}
    for p in PARAMETERS:
        np.testing.assert_allclose(
            reparam.bounds[p],
            [np.min(np.asarray(x[p], float)), np.max(np.asarray(x[p], float))],
        )


def test_reset_restores_prior_bounds(rng):
    reparam = make()
    x = new_points(rng)
    reparam.update(x)
    reparam.reset()
    for p in PARAMETERS:
        np.testing.assert_array_equal(reparam.bounds[p], PRIOR_BOUNDS[p])


@pytest.mark.parametrize("rescaling", ["log", "logit"])
def test_post_rescaling_with_str(rescaling):
    bounds = {"x": [0.5, 1], "y": [0.5, 1]}
    reparam = make(
        prior_bounds=bounds,
        post_rescaling=rescaling,
        update_bounds=False,
    )
    assert reparam.post_rescaling is not None
    assert reparam.post_rescaling_name == rescaling
    # log/logit force the main rescaling onto [0, 1]
    assert reparam.rescale_bounds == {"x": [0, 1], "y": [0, 1]}


@pytest.mark.parametrize("rescaling", ["log", "logit"])
def test_post_rescaling_with_logit_update_bounds(rescaling):
    with pytest.raises(
        RuntimeError, match=r"Cannot use log or logit with update bounds"
    ):
        make(post_rescaling=rescaling, update_bounds=True)


def test_update_bounds_disabled(rng, caplog):
    # scope to the module logger: configure_logger in other tests raises
    # the package logger level above DEBUG
    caplog.set_level(
        "DEBUG", logger="nessai_tpu.reparameterisations.rescale"
    )
    reparam = make(update_bounds=False)
    old = {p: np.array(reparam.bounds[p]).copy() for p in PARAMETERS}
    reparam.update_bounds(new_points(rng))
    assert "Update bounds not enabled" in caplog.text
    for p in PARAMETERS:
        np.testing.assert_array_equal(reparam.bounds[p], old[p])


def test_update_bounds_with_offsets():
    reparam = RescaleToBounds(
        parameters=["x", "y"],
        prior_bounds={"x": [-5, 5], "y": [-5, 5]},
        offset=True,
    )
    # offsets are the prior midpoints = 0 here; shift them manually
    reparam.offsets = {"x": 0.0, "y": 1.0}
    x = numpy_array_to_live_points(
        np.array([[-1.0, -2.0], [0.0, 0.0], [1.0, 2.0]]), ["x", "y"]
    )
    reparam.update_bounds(x)
    np.testing.assert_array_equal(reparam.bounds["x"], [-1, 1])
    np.testing.assert_array_equal(reparam.bounds["y"], [-3, 1])


# ----------------------------------------------------------------------
# Integration behaviour (reference integration tests)
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "rescale_bounds", [None, [0, 1], {"x": [0, 1], "y": [-1, 1]}]
)
def test_rescale_bounds_integration(rng, rescale_bounds):
    reparam = make(rescale_bounds=rescale_bounds)
    if rescale_bounds is None:
        expected = {p: [-1, 1] for p in PARAMETERS}
    elif isinstance(rescale_bounds, list):
        expected = {p: rescale_bounds for p in PARAMETERS}
    else:
        expected = rescale_bounds
    assert reparam.rescale_bounds == expected
    assert check_invertible(reparam, new_points(rng))


@pytest.mark.parametrize(
    "boundary_inversion",
    [False, True, ["x"], {"x": "split"}, {"x": "duplicate"}],
)
def test_boundary_inversion_integration(rng, boundary_inversion):
    reparam = make(boundary_inversion=boundary_inversion, rng=rng)
    assert check_invertible(reparam, new_points(rng))


def test_pre_rescaling_integration(rng):
    def forward(x):
        x = np.asarray(x, float)
        return np.log(x), -np.log(x)

    def inv(x):
        x = np.asarray(x, float)
        return np.exp(x), x.copy()

    reparam = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [1.0, np.e]},
        pre_rescaling=(forward, inv),
        rescale_bounds=[-1.0, 1.0],
    )

    x = numpy_array_to_live_points(
        np.array([[1.0], [np.e**0.5], [2.0], [np.e]]), ["x"]
    )
    x_prime = empty_structured_array(x.size, reparam.prime_parameters)
    log_j = np.zeros(x.size)

    x_out, x_prime_out, log_j_out = reparam.reparameterise(x, x_prime, log_j)

    assert_structured_arrays_equal(x_out, x)
    np.testing.assert_allclose(
        x_prime_out[reparam.prime_parameters[0]],
        np.array([-1, 0.0, 2 * np.log(2) - 1, 1]),
        rtol=1e-14,
        atol=1e-14,
    )
    np.testing.assert_allclose(
        log_j_out,
        -np.log(np.asarray(x["x"], float)) + np.log(2),
        rtol=1e-14,
        atol=1e-14,
    )

    x_in = empty_structured_array(x_prime_out.size, ["x"])
    x_back, _, log_j_final = reparam.inverse_reparameterise(
        x_in, x_prime_out, np.zeros(x.size)
    )
    np.testing.assert_allclose(
        log_j_final,
        np.log(np.asarray(x_back["x"], float)) - np.log(2),
        rtol=1e-13,
        atol=1e-13,
    )
    np.testing.assert_allclose(
        x_back["x"], np.asarray(x["x"], float), rtol=1e-14, atol=1e-14
    )
    np.testing.assert_allclose(
        log_j_final, -log_j_out, rtol=1e-13, atol=1e-13
    )


def test_update_integration(rng):
    """Edges and bounds are updated by update()."""
    bounds = {"x": [-5.0, 5.0]}
    x = numpy_array_to_live_points(
        rng.uniform(-5, 5, (2, 1)), ["x"]
    )
    reparam = RescaleToBounds(
        parameters=["x"],
        update_bounds=True,
        boundary_inversion=True,
        detect_edges=True,
        prior_bounds=bounds,
    )
    reparam._edges = {"x": "lower"}
    reparam.bounds = {"x": [-100, 100]}
    reparam.update(x)
    assert reparam._edges == {"x": None}
    np.testing.assert_allclose(
        reparam.bounds["x"],
        [np.min(np.asarray(x["x"], float)), np.max(np.asarray(x["x"], float))],
    )


def test_update_integration_no_update(rng):
    """Bounds and edges are not updated when disabled."""
    bounds = {"x": [-5.0, 5.0]}
    x = numpy_array_to_live_points(rng.uniform(-5, 5, (2, 1)), ["x"])
    reparam = RescaleToBounds(
        parameters=["x"],
        update_bounds=False,
        boundary_inversion=False,
        detect_edges=False,
        prior_bounds=bounds,
    )
    reparam.update(x)
    assert reparam._edges is None
    np.testing.assert_array_equal(reparam.bounds["x"], bounds["x"])


@pytest.mark.parametrize(
    "kwargs, atol",
    [
        (dict(post_rescaling="logit", update_bounds=False), 1e-9),
        (dict(post_rescaling="log", update_bounds=False), 1e-13),
        (dict(update_bounds=False), 1e-14),
        (dict(update_bounds=False, boundary_inversion=True), 1e-14),
        (dict(boundary_inversion=["x"]), 1e-14),
    ],
)
def test_is_invertible_general_config(rng, kwargs, atol):
    bounds = {"x": [0.1, 1.0], "y": [0.1, 1.0]}
    reparam = RescaleToBounds(
        parameters=PARAMETERS, prior_bounds=bounds, rng=rng, **kwargs
    )
    x = new_points(rng, bounds=bounds)
    if kwargs.get("boundary_inversion"):
        reparam.update(x)
    assert check_invertible(reparam, x, atol=atol, rtol=atol)


def test_is_invertible_dynamic_range(rng):
    """Extreme dynamic range needs pre_rescaling='log' to stay invertible."""
    bounds = {"a_1": [1.1679062461797653e-15, 943497510298152.8]}

    def draw(n):
        a = np.exp(
            rng.uniform(
                np.log(bounds["a_1"][0]), np.log(bounds["a_1"][1]), (n, 1)
            )
        )
        return numpy_array_to_live_points(a, ["a_1"])

    x = draw(100)
    reparam = RescaleToBounds(parameters=["a_1"], prior_bounds=bounds)
    with pytest.raises(AssertionError):
        check_invertible(reparam, x, atol=1e-11, rtol=1e-11)

    reparam = RescaleToBounds(
        parameters=["a_1"], prior_bounds=bounds, pre_rescaling="log"
    )
    assert check_invertible(reparam, x, atol=1e-11, rtol=1e-11)
