"""Device-side jittable inverse reparameterisations.

Every reparameterisation's ``jax_inverse`` must agree with the host
``inverse_reparameterise`` (values and log-Jacobians) so the fused
single-program populate path is exact. Reference semantics:
``nessai/reparameterisations/rescale.py``, ``angle.py``, ``discrete.py``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nessai_tpu.livepoint import empty_structured_array
from nessai_tpu.reparameterisations import (
    Angle,
    AnglePair,
    CombinedReparameterisation,
    Dequantise,
    NullReparameterisation,
    Rescale,
    RescaleToBounds,
    ScaleAndShift,
    ToCartesian,
)


def _x_struct(names, values):
    x = empty_structured_array(len(values), names=list(names))
    for i, n in enumerate(names):
        x[n] = values[:, i]
    return x


def _forward(r, x, all_params):
    """Run the host forward pass, returning (x, x_prime, log_j)."""
    x_prime = np.zeros(
        len(x), dtype=[(p, "f8") for p in r.prime_parameters]
    )
    log_j = np.zeros(len(x))
    return r.reparameterise(x.copy(), x_prime, log_j)


def _host_inverse(r, x_prime, all_params):
    x = empty_structured_array(len(x_prime), names=list(all_params))
    log_j = np.zeros(len(x_prime))
    x, x_prime, log_j = r.inverse_reparameterise(x, x_prime, log_j)
    return x, log_j


def _device_inverse(r, x_prime):
    built = r.jax_inverse()
    assert built is not None
    fn, fingerprint = built
    assert isinstance(fingerprint, tuple)
    cols = {
        pp: jnp.asarray(np.asarray(x_prime[pp]), jnp.float32)
        for pp in x_prime.dtype.names
    }
    updates, log_j = fn(cols, r.jax_inverse_consts())
    return updates, np.asarray(log_j, np.float64)


def _assert_matches(r, x, all_params, atol=1e-5):
    """Forward on x, then compare host vs device inverse on the primes."""
    x1, x_prime, _ = _forward(r, x, all_params)
    x_host, log_j_host = _host_inverse(r, x_prime, all_params)
    updates, log_j_dev = _device_inverse(r, x_prime)
    for p in all_params:
        if p in updates:
            np.testing.assert_allclose(
                np.asarray(updates[p], np.float64),
                x_host[p],
                atol=atol,
                rtol=1e-5,
                err_msg=f"parameter {p}",
            )
    np.testing.assert_allclose(
        np.broadcast_to(log_j_dev, (len(x_prime),)),
        log_j_host,
        atol=atol,
        rtol=1e-5,
        err_msg="log_j",
    )


RNG = np.random.default_rng(42)


# ----------------------------------------------------------------------
# ScaleAndShift / Rescale
# ----------------------------------------------------------------------
def test_scale_and_shift_plain():
    r = ScaleAndShift(
        parameters=["a", "b"], scale={"a": 2.0, "b": 0.5}, shift={"a": -1.0, "b": 3.0}
    )
    x = _x_struct(["a", "b"], RNG.normal(size=(200, 2)))
    _assert_matches(r, x, ["a", "b"])


def test_scale_and_shift_estimated():
    r = ScaleAndShift(parameters=["a"], estimate=True, rng=RNG)
    x = _x_struct(["a"], 3.0 + 2.0 * RNG.normal(size=(300, 1)))
    r.update(x)
    _assert_matches(r, x, ["a"])


@pytest.mark.parametrize("pre", ["logit", "log", "gaussian_cdf"])
def test_scale_and_shift_pre_rescaling(pre):
    r = ScaleAndShift(
        parameters=["a"], estimate=True, pre_rescaling=pre, rng=RNG
    )
    x = _x_struct(["a"], RNG.uniform(0.05, 0.95, size=(200, 1)))
    r.update(x)
    _assert_matches(r, x, ["a"])


def test_scale_and_shift_post_rescaling_gaussian_cdf():
    r = ScaleAndShift(
        parameters=["a"], estimate=True, post_rescaling="gaussian_cdf", rng=RNG
    )
    x = _x_struct(["a"], RNG.normal(size=(200, 1)))
    r.update(x)
    _assert_matches(r, x, ["a"])


def test_custom_callable_rescaling_disables_jax_inverse():
    pair = (lambda x: (x, np.zeros_like(x)), lambda x: (x, np.zeros_like(x)))
    r = ScaleAndShift(parameters=["a"], scale=2.0, pre_rescaling=pair)
    assert r.jax_inverse() is None


def test_rescale_only():
    r = Rescale(parameters=["a"], scale=4.0)
    x = _x_struct(["a"], RNG.normal(size=(100, 1)))
    _assert_matches(r, x, ["a"])


# ----------------------------------------------------------------------
# RescaleToBounds
# ----------------------------------------------------------------------
def test_rescale_to_bounds_default():
    r = RescaleToBounds(
        parameters=["a", "b"],
        prior_bounds={"a": [-10.0, 10.0], "b": [0.0, 5.0]},
        rng=RNG,
    )
    x = _x_struct(
        ["a", "b"],
        np.stack(
            [RNG.uniform(-10, 10, 200), RNG.uniform(0, 5, 200)], axis=1
        ),
    )
    r.update(x)
    _assert_matches(r, x, ["a", "b"])


def test_rescale_to_bounds_offset_logit():
    r = RescaleToBounds(
        parameters=["a"],
        prior_bounds={"a": [2.0, 6.0]},
        offset=True,
        rescale_bounds=[0.0, 1.0],
        update_bounds=False,
        post_rescaling="logit",
        rng=RNG,
    )
    x = _x_struct(["a"], RNG.uniform(2.01, 5.99, size=(200, 1)))
    _assert_matches(r, x, ["a"])


@pytest.mark.parametrize("edge", ["lower", "upper", False])
def test_rescale_to_bounds_inversion(edge):
    r = RescaleToBounds(
        parameters=["a"],
        prior_bounds={"a": [0.0, 1.0]},
        boundary_inversion=True,
        detect_edges=True,
        inversion_type="split",
        rng=np.random.default_rng(5),
    )
    vals = RNG.uniform(0.0, 1.0, size=(300, 1))
    x = _x_struct(["a"], vals)
    r.update(x)
    r._edges["a"] = edge
    _assert_matches(r, x, ["a"])


def test_dequantise():
    r = Dequantise(
        parameters=["k"], prior_bounds={"k": [0, 4]}, rng=RNG
    )
    x = _x_struct(["k"], RNG.integers(0, 5, size=(200, 1)).astype(float))
    _assert_matches(r, x, ["k"])


def test_null():
    r = NullReparameterisation(parameters=["a"])
    x = _x_struct(["a"], RNG.normal(size=(50, 1)))
    _assert_matches(r, x, ["a"])


# ----------------------------------------------------------------------
# Angles
# ----------------------------------------------------------------------
def test_angle_auxiliary_radial():
    r = Angle(
        parameters=["phi"],
        prior_bounds={"phi": [0.0, 2 * np.pi]},
        scale=1.0,
        rng=RNG,
    )
    x = empty_structured_array(200, names=["phi", "phi_radial"])
    x["phi"] = RNG.uniform(0, 2 * np.pi, 200)
    _assert_matches(r, x, ["phi", "phi_radial"])


def test_angle_with_radial_parameter():
    r = Angle(
        parameters=["phi", "amp"],
        prior_bounds={"phi": [0.0, 2 * np.pi], "amp": [0.0, 5.0]},
        scale=1.0,
        rng=RNG,
    )
    x = _x_struct(
        ["phi", "amp"],
        np.stack(
            [RNG.uniform(0, 2 * np.pi, 200), RNG.uniform(0.1, 5, 200)],
            axis=1,
        ),
    )
    _assert_matches(r, x, ["phi", "amp"])


def test_angle_pi_scale():
    r = Angle(
        parameters=["iota"],
        prior_bounds={"iota": [0.0, np.pi]},
        scale=2.0,
        rng=RNG,
    )
    x = empty_structured_array(200, names=["iota", "iota_radial"])
    x["iota"] = RNG.uniform(0, np.pi, 200)
    _assert_matches(r, x, ["iota", "iota_radial"])


def test_to_cartesian():
    r = ToCartesian(
        parameters=["q"], prior_bounds={"q": [0.2, 0.9]}, rng=RNG
    )
    x = empty_structured_array(100, names=["q", "q_radial"])
    x["q"] = RNG.uniform(0.2, 0.9, 100)
    _assert_matches(r, x, ["q", "q_radial"])


@pytest.mark.parametrize("convention", ["ra-dec", "az-zen"])
def test_angle_pair(convention):
    if convention == "ra-dec":
        bounds = {"ra": [0.0, 2 * np.pi], "dec": [-np.pi / 2, np.pi / 2]}
    else:
        bounds = {"ra": [0.0, 2 * np.pi], "dec": [0.0, np.pi]}
    r = AnglePair(
        parameters=["ra", "dec"],
        prior_bounds=bounds,
        convention=convention,
        rng=RNG,
    )
    x = empty_structured_array(200, names=["ra", "dec", "ra_radial"])
    x["ra"] = RNG.uniform(*bounds["ra"], 200)
    x["dec"] = RNG.uniform(
        bounds["dec"][0] + 0.05, bounds["dec"][1] - 0.05, 200
    )
    _assert_matches(r, x, ["ra", "dec", "ra_radial"])


# ----------------------------------------------------------------------
# Combined
# ----------------------------------------------------------------------
def test_combined_mixed_stack():
    c = CombinedReparameterisation()
    c.add_reparameterisation(
        RescaleToBounds(
            parameters=["a"], prior_bounds={"a": [-5.0, 5.0]}, rng=RNG
        )
    )
    c.add_reparameterisation(
        Angle(
            parameters=["phi"],
            prior_bounds={"phi": [0.0, 2 * np.pi]},
            scale=1.0,
            rng=RNG,
        )
    )
    c.add_reparameterisation(
        ScaleAndShift(parameters=["b"], scale=2.0, shift=1.0, rng=RNG)
    )
    n = 200
    all_params = ["a", "phi", "b", "phi_radial"]
    x = empty_structured_array(n, names=all_params)
    x["a"] = RNG.uniform(-5, 5, n)
    x["phi"] = RNG.uniform(0, 2 * np.pi, n)
    x["b"] = RNG.normal(size=n)
    c.update(x)
    x_prime = np.zeros(n, dtype=[(p, "f8") for p in c.prime_parameters])
    log_j = np.zeros(n)
    x1, x_prime, log_j = c.reparameterise(x.copy(), x_prime, log_j)

    x_host = empty_structured_array(n, names=all_params)
    lj_host = np.zeros(n)
    x_host, _, lj_host = c.inverse_reparameterise(x_host, x_prime, lj_host)

    fn, fingerprint = c.jax_inverse()
    cols = {
        pp: jnp.asarray(np.asarray(x_prime[pp]), jnp.float32)
        for pp in x_prime.dtype.names
    }
    out_cols, lj_dev = fn(cols, c.jax_inverse_consts())
    for p in all_params:
        np.testing.assert_allclose(
            np.asarray(out_cols[p], np.float64),
            x_host[p],
            atol=1e-5,
            rtol=1e-5,
            err_msg=p,
        )
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(lj_dev, np.float64), (n,)),
        lj_host,
        atol=1e-5,
    )


def test_combined_none_when_child_unsupported():
    class NoJax(NullReparameterisation):
        def jax_inverse(self):
            return None

    c = CombinedReparameterisation()
    c.add_reparameterisation(NoJax(parameters=["a"]))
    assert c.jax_inverse() is None


def test_consts_update_without_retrace():
    """Consts are runtime values: after update() changes the bounds, the
    SAME traced fn with fresh consts matches the new host inverse."""
    r = RescaleToBounds(
        parameters=["a"], prior_bounds={"a": [0.0, 10.0]}, rng=RNG
    )
    fn, fp1 = r.jax_inverse()
    x1 = _x_struct(["a"], RNG.uniform(0, 10, size=(100, 1)))
    r.update(x1)
    fn2, fp2 = r.jax_inverse()
    assert fp1 == fp2
    _, x_prime, _ = _forward(r, x1, ["a"])
    x_host, lj_host = _host_inverse(r, x_prime, ["a"])
    cols = {
        pp: jnp.asarray(np.asarray(x_prime[pp]), jnp.float32)
        for pp in x_prime.dtype.names
    }
    updates, lj = fn(cols, r.jax_inverse_consts())
    np.testing.assert_allclose(
        np.asarray(updates["a"], np.float64), x_host["a"], atol=1e-5
    )
