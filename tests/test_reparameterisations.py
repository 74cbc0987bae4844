"""Tests for reparameterisations: round-trip invertibility and Jacobians."""

import numpy as np
import pytest

from nessai_tpu.livepoint import numpy_array_to_live_points
from nessai_tpu.reparameterisations import (
    Angle,
    AnglePair,
    CombinedReparameterisation,
    Dequantise,
    NullReparameterisation,
    RescaleToBounds,
    ScaleAndShift,
    ToCartesian,
    default_reparameterisations,
    get_reparameterisation,
)


def make_x(names, values):
    return numpy_array_to_live_points(np.asarray(values, dtype=float), names)


def make_prime(n, prime_names):
    return np.zeros(n, dtype=[(p, "f8") for p in prime_names])


def roundtrip(reparam, x, extra_aux=()):
    n = len(x)
    x_prime = make_prime(n, reparam.prime_parameters)
    log_j = np.zeros(n)
    x1, x_prime, log_j = reparam.reparameterise(x.copy(), x_prime, log_j)
    n_out = len(x_prime)
    # rebuild x for inverse
    names = list(x.dtype.names) + [
        a for a in getattr(reparam, "auxiliary_parameters", []) if a not in x.dtype.names
    ]
    x_out = np.zeros(n_out, dtype=[(nm, "f8") for nm in names])
    log_j_inv = np.zeros(n_out)
    x_out, x_prime, log_j_inv = reparam.inverse_reparameterise(
        x_out, x_prime, log_j_inv
    )
    return x1, x_out, x_prime, log_j, log_j_inv


def test_rescale_to_bounds_roundtrip(rng):
    r = RescaleToBounds(
        parameters=["a", "b"],
        prior_bounds={"a": [-5, 5], "b": [0, 10]},
        update_bounds=False,
    )
    x = make_x(["a", "b"], rng.uniform([-5, 0], [5, 10], (20, 2)))
    x1, x_out, x_prime, log_j, log_j_inv = roundtrip(r, x)
    np.testing.assert_allclose(x_out["a"], x["a"], atol=1e-12)
    np.testing.assert_allclose(x_out["b"], x["b"], atol=1e-12)
    np.testing.assert_allclose(log_j + log_j_inv, 0, atol=1e-12)
    assert x_prime["a_prime"].min() >= -1 and x_prime["a_prime"].max() <= 1


def test_rescale_to_bounds_update(rng):
    r = RescaleToBounds(
        parameters=["a"], prior_bounds={"a": [-5, 5]}, update_bounds=True
    )
    x = make_x(["a"], rng.uniform(-1, 1, (50, 1)))
    r.update(x)
    np.testing.assert_allclose(r.bounds["a"][0], x["a"].min())
    x_prime = make_prime(50, r.prime_parameters)
    _, x_prime, _ = r.reparameterise(x, x_prime, np.zeros(50))
    assert np.isclose(x_prime["a_prime"].min(), -1)
    assert np.isclose(x_prime["a_prime"].max(), 1)


@pytest.mark.parametrize("inversion_type", ["split", "duplicate"])
def test_boundary_inversion(rng, inversion_type):
    r = RescaleToBounds(
        parameters=["a"],
        prior_bounds={"a": [0, 1]},
        boundary_inversion=["a"],
        detect_edges=False,
        inversion_type=inversion_type,
    )
    # samples concentrated at the lower edge
    vals = rng.beta(0.3, 3.0, (100, 1))
    x = make_x(["a"], vals)
    r.update(x)
    x1, x_out, x_prime, log_j, log_j_inv = roundtrip(r, x)
    expected_n = 200 if inversion_type == "duplicate" else 100
    assert len(x_prime) == expected_n
    np.testing.assert_allclose(x_out["a"], x1["a"], atol=1e-10)


def test_zscore_roundtrip(rng):
    r = ScaleAndShift(
        parameters=["a", "b"],
        prior_bounds={"a": [-5, 5], "b": [0, 10]},
        estimate_scale=True,
        estimate_shift=True,
    )
    x = make_x(["a", "b"], rng.normal(3, 2, (30, 2)))
    r.update(x)
    x1, x_out, x_prime, log_j, log_j_inv = roundtrip(r, x)
    np.testing.assert_allclose(x_out["a"], x["a"], atol=1e-10)
    np.testing.assert_allclose(log_j + log_j_inv, 0, atol=1e-10)
    # prime is whitened
    assert abs(np.mean(x_prime["a_prime"])) < 1e-8
    assert abs(np.std(x_prime["a_prime"]) - 1) < 1e-8


def test_angle_roundtrip(rng):
    r = Angle(
        parameters=["phi"], prior_bounds={"phi": [0, 2 * np.pi]}, scale=1.0,
        rng=rng,
    )
    x = make_x(["phi"], rng.uniform(0, 2 * np.pi, (30, 1)))
    x1, x_out, x_prime, log_j, log_j_inv = roundtrip(r, x)
    np.testing.assert_allclose(x_out["phi"], x["phi"], atol=1e-10)
    # radius recovered as auxiliary field with chi(2) prior
    assert "phi_radial" in x_out.dtype.names
    lp = r.log_prior(x_out)
    assert np.all(np.isfinite(lp))


def test_angle_pair_roundtrip(rng):
    r = AnglePair(
        parameters=["ra", "dec"],
        prior_bounds={"ra": [0, 2 * np.pi], "dec": [-np.pi / 2, np.pi / 2]},
        rng=rng,
    )
    n = 30
    vals = np.stack(
        [rng.uniform(0, 2 * np.pi, n), rng.uniform(-np.pi / 2, np.pi / 2, n)],
        axis=1,
    )
    x = make_x(["ra", "dec"], vals)
    x1, x_out, x_prime, log_j, log_j_inv = roundtrip(r, x)
    np.testing.assert_allclose(x_out["ra"], x["ra"], atol=1e-10)
    np.testing.assert_allclose(x_out["dec"], x["dec"], atol=1e-10)
    assert set(x_prime.dtype.names) == {"ra_x", "ra_y", "ra_z"}


def test_to_cartesian_roundtrip(rng):
    r = ToCartesian(
        parameters=["a"], prior_bounds={"a": [0, 1]}, mode="split", rng=rng
    )
    x = make_x(["a"], rng.uniform(0, 1, (30, 1)))
    x1, x_out, x_prime, log_j, log_j_inv = roundtrip(r, x)
    np.testing.assert_allclose(x_out["a"], x["a"], atol=1e-10)


def test_dequantise_roundtrip(rng):
    r = Dequantise(
        parameters=["k"], prior_bounds={"k": [0, 5]}, rng=rng,
        update_bounds=False,
    )
    x = make_x(["k"], rng.integers(0, 6, (30, 1)).astype(float))
    x1, x_out, x_prime, log_j, log_j_inv = roundtrip(r, x)
    np.testing.assert_allclose(x_out["k"], x["k"], atol=1e-12)


def test_null():
    r = NullReparameterisation(parameters=["a"])
    x = make_x(["a"], np.arange(5.0)[:, None])
    x_prime = make_prime(5, r.prime_parameters)
    _, x_prime, _ = r.reparameterise(x, x_prime, np.zeros(5))
    np.testing.assert_array_equal(x_prime["a"], x["a"])


def test_combined_ordering_and_roundtrip(rng):
    r1 = RescaleToBounds(
        parameters=["a"], prior_bounds={"a": [-5, 5]}, update_bounds=False
    )
    r2 = ScaleAndShift(
        parameters=["b"],
        prior_bounds={"b": [0, 10]},
        scale=10.0,
    )
    c = CombinedReparameterisation([r1, r2])
    assert set(c.parameters) == {"a", "b"}
    x = make_x(["a", "b"], rng.uniform([-5, 0], [5, 10], (20, 2)))
    x_prime = make_prime(20, c.prime_parameters)
    log_j = np.zeros(20)
    x1, x_prime, log_j = c.reparameterise(x.copy(), x_prime, log_j)
    x_out = np.zeros(20, dtype=x.dtype)
    log_j_inv = np.zeros(20)
    x_out, x_prime, log_j_inv = c.inverse_reparameterise(
        x_out, x_prime, log_j_inv
    )
    np.testing.assert_allclose(x_out["a"], x["a"], atol=1e-10)
    np.testing.assert_allclose(x_out["b"], x["b"], atol=1e-10)
    np.testing.assert_allclose(log_j + log_j_inv, 0, atol=1e-10)


def test_registry_and_get_reparameterisation():
    cls, kwargs = get_reparameterisation("default")
    assert cls is RescaleToBounds
    cls, kwargs = get_reparameterisation("zscore")
    assert cls is ScaleAndShift
    assert kwargs["estimate_scale"]
    cls, kwargs = get_reparameterisation("inversion-duplicate")
    assert kwargs["inversion_type"] == "duplicate"
    with pytest.raises(ValueError):
        get_reparameterisation("not-a-reparam")
    assert None in default_reparameterisations


def test_logit_reparam_roundtrip(rng):
    cls, kwargs = get_reparameterisation("logit")
    r = cls(parameters=["a"], prior_bounds={"a": [2, 4]}, **kwargs)
    x = make_x(["a"], rng.uniform(2.1, 3.9, (20, 1)))
    x1, x_out, x_prime, log_j, log_j_inv = roundtrip(r, x)
    np.testing.assert_allclose(x_out["a"], x["a"], atol=1e-8)
    np.testing.assert_allclose(log_j + log_j_inv, 0, atol=1e-6)
