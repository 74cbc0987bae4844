"""Deep coverage of the angle reparameterisations.

Reference: ``nessai/reparameterisations/angle.py`` and
``tests/test_reparameterisations/test_angle*.py``.
"""

import numpy as np
import pytest
from scipy import stats as scipy_stats

from nessai_tpu.livepoint import (
    empty_structured_array,
    numpy_array_to_live_points,
)
from nessai_tpu.reparameterisations.angle import Angle, AnglePair, ToCartesian


def _x(names, cols):
    x = empty_structured_array(len(cols[0]), names=list(names))
    for n, c in zip(names, cols):
        x[n] = c
    return x


def _prime(n, reparam):
    return numpy_array_to_live_points(
        np.zeros((n, len(reparam.prime_parameters))),
        reparam.prime_parameters,
    )


def test_angle_too_many_parameters():
    with pytest.raises(RuntimeError, match="Too many parameters"):
        Angle(
            parameters=["a", "b", "c"],
            prior_bounds={p: [0, 2 * np.pi] for p in "abc"},
        )


def test_angle_auxiliary_radius_chi2(rng):
    a = Angle(
        parameters=["phi"], prior_bounds={"phi": [0, 2 * np.pi]}, rng=rng
    )
    assert a.auxiliary_parameters == ["phi_radial"]
    assert a.has_prior
    assert a.radial == "phi_radial"
    # prior is chi(2)
    x = empty_structured_array(
        3, names=["phi"] + a.auxiliary_parameters
    )
    x["phi_radial"] = [0.5, 1.0, 2.0]
    np.testing.assert_allclose(
        a.log_prior(x), scipy_stats.chi(2).logpdf([0.5, 1.0, 2.0])
    )


def test_angle_with_radial_no_prior(rng):
    a = Angle(
        parameters=["phi", "r"],
        prior_bounds={"phi": [0, 2 * np.pi], "r": [0, 5]},
        rng=rng,
    )
    assert not a.has_prior
    assert a.log_prior(None) == 0.0
    assert a.radial == "r"


def test_angle_scale_none_infers_from_bounds(rng):
    a = Angle(
        parameters=["phi"],
        prior_bounds={"phi": [0, np.pi]},
        scale=None,
        rng=rng,
    )
    assert np.isclose(a.scale, 2.0)


def test_angle_roundtrip_with_radial(rng):
    a = Angle(
        parameters=["phi", "r"],
        prior_bounds={"phi": [0, 2 * np.pi], "r": [0.1, 5]},
        rng=rng,
    )
    n = 50
    phi = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(0.5, 4.0, n)
    x = _x(["phi", "r"], [phi, r])
    x_prime = _prime(n, a)
    x1, x_prime, log_j = a.reparameterise(x.copy(), x_prime, np.zeros(n))
    # forward Jacobian is log(r)
    np.testing.assert_allclose(log_j, np.log(r), atol=1e-12)
    x_out = x1.copy()
    x_out, _, log_j_inv = a.inverse_reparameterise(
        x_out, x_prime, np.zeros(n)
    )
    np.testing.assert_allclose(x_out["phi"], phi, atol=1e-10)
    np.testing.assert_allclose(x_out["r"], r, atol=1e-10)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-10)


def test_angle_negative_radius_raises(rng):
    a = Angle(
        parameters=["phi", "r"],
        prior_bounds={"phi": [0, 2 * np.pi], "r": [-1, 1]},
        rng=rng,
    )
    x = _x(["phi", "r"], [[0.3], [-0.5]])
    with pytest.raises(RuntimeError, match="negative"):
        a.reparameterise(x, _prime(1, a), np.zeros(1))


def test_angle_nonzero_lower_bound_branch(rng):
    """Angles with bounds [-pi, pi] skip the mod-2pi wrap."""
    a = Angle(
        parameters=["phi", "r"],
        prior_bounds={"phi": [-np.pi, np.pi], "r": [0.1, 5]},
        rng=rng,
    )
    assert not a._zero_bound
    n = 20
    phi = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(0.5, 2.0, n)
    x = _x(["phi", "r"], [phi, r])
    x1, x_prime, _ = a.reparameterise(x.copy(), _prime(n, a), np.zeros(n))
    x_out, _, _ = a.inverse_reparameterise(x1.copy(), x_prime, np.zeros(n))
    np.testing.assert_allclose(x_out["phi"], phi, atol=1e-10)


# ----------------------------------------------------------------------
def test_to_cartesian_unknown_mode():
    with pytest.raises(RuntimeError, match="Unknown mode"):
        ToCartesian(
            mode="bogus",
            parameters=["q"],
            prior_bounds={"q": [0, 1]},
        )


@pytest.mark.parametrize("mode", ["split", "half"])
def test_to_cartesian_roundtrip(mode, rng):
    t = ToCartesian(
        mode=mode, parameters=["q"], prior_bounds={"q": [2.0, 4.0]}, rng=rng
    )
    n = 40
    q = rng.uniform(2.0, 4.0, n)
    x = _x(["q", "q_radial"], [q, np.zeros(n)])
    x1, x_prime, log_j = t.reparameterise(x.copy(), _prime(n, t), np.zeros(n))
    x_out, _, log_j_inv = t.inverse_reparameterise(
        x1.copy(), x_prime, np.zeros(n)
    )
    np.testing.assert_allclose(x_out["q"], q, atol=1e-9)


def test_to_cartesian_duplicate_doubles(rng):
    t = ToCartesian(
        mode="duplicate",
        parameters=["q"],
        prior_bounds={"q": [0.0, 1.0]},
        rng=rng,
    )
    n = 10
    x = _x(["q"], [rng.uniform(size=n)])
    x1, x_prime, log_j = t.reparameterise(x.copy(), _prime(n, t), np.zeros(n))
    assert len(x_prime) == 2 * n
    assert len(log_j) == 2 * n


def test_to_cartesian_compute_radius_duplicates(rng):
    t = ToCartesian(
        mode="split", parameters=["q"], prior_bounds={"q": [0.0, 1.0]}, rng=rng
    )
    n = 10
    x = _x(["q"], [rng.uniform(size=n)])
    x1, x_prime, _ = t.reparameterise(
        x.copy(), _prime(n, t), np.zeros(n), compute_radius=True
    )
    assert len(x_prime) == 2 * n


# ----------------------------------------------------------------------
def test_angle_pair_wrong_count():
    with pytest.raises(RuntimeError, match="2 or 3 parameters"):
        AnglePair(
            parameters=["a"],
            prior_bounds={"a": [0, 2 * np.pi]},
        )


def test_angle_pair_radec_roundtrip(rng):
    p = AnglePair(
        parameters=["ra", "dec"],
        prior_bounds={"ra": [0, 2 * np.pi], "dec": [-np.pi / 2, np.pi / 2]},
        rng=rng,
    )
    assert p.convention == "ra-dec"
    assert p.chi is not None  # auxiliary chi(3) radius
    n = 50
    ra = rng.uniform(0, 2 * np.pi, n)
    dec = rng.uniform(-np.pi / 2, np.pi / 2, n)
    x = _x(["ra", "dec", "ra_radial"], [ra, dec, np.zeros(n)])
    x1, x_prime, log_j = p.reparameterise(x.copy(), _prime(n, p), np.zeros(n))
    x_out, _, log_j_inv = p.inverse_reparameterise(
        x1.copy(), x_prime, np.zeros(n)
    )
    np.testing.assert_allclose(x_out["ra"], ra, atol=1e-9)
    np.testing.assert_allclose(x_out["dec"], dec, atol=1e-9)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-9)
    # chi(3) prior on the radius
    np.testing.assert_allclose(
        p.log_prior(x_out), scipy_stats.chi(3).logpdf(x_out["ra_radial"])
    )


def test_angle_pair_azzen_with_radial(rng):
    p = AnglePair(
        parameters=["az", "zen", "d"],
        prior_bounds={
            "az": [0, 2 * np.pi],
            "zen": [0, np.pi],
            "d": [1.0, 10.0],
        },
        rng=rng,
    )
    assert p.convention == "az-zen"
    assert p.chi is None
    assert p.radial == "d"
    n = 50
    az = rng.uniform(0, 2 * np.pi, n)
    zen = rng.uniform(0.1, np.pi - 0.1, n)
    d = rng.uniform(1.0, 10.0, n)
    x = _x(["az", "zen", "d"], [az, zen, d])
    x1, x_prime, log_j = p.reparameterise(x.copy(), _prime(n, p), np.zeros(n))
    x_out, _, log_j_inv = p.inverse_reparameterise(
        x1.copy(), x_prime, np.zeros(n)
    )
    np.testing.assert_allclose(x_out["az"], az, atol=1e-9)
    np.testing.assert_allclose(x_out["zen"], zen, atol=1e-9)
    np.testing.assert_allclose(x_out["d"], d, atol=1e-9)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-9)


def test_angle_pair_horizontal_angle_reordered(rng):
    """The 2pi-range angle must come first regardless of input order."""
    p = AnglePair(
        parameters=["dec", "ra"],
        prior_bounds={"dec": [-np.pi / 2, np.pi / 2], "ra": [0, 2 * np.pi]},
        rng=rng,
    )
    assert p.angles[0] == "ra"


def test_angle_pair_unknown_convention(rng):
    with pytest.raises(RuntimeError, match="[Cc]onvention"):
        AnglePair(
            parameters=["a", "b"],
            prior_bounds={"a": [0, 2 * np.pi], "b": [0, 1.0]},
            rng=rng,
        )
    with pytest.raises(RuntimeError, match="Unknown convention"):
        AnglePair(
            parameters=["a", "b"],
            prior_bounds={"a": [0, 2 * np.pi], "b": [0, np.pi]},
            convention="bogus",
            rng=rng,
        )


def test_angle_pair_ambiguous_radial(rng):
    with pytest.raises(RuntimeError, match="angular parameters"):
        AnglePair(
            parameters=["a", "b", "c"],
            prior_bounds={
                "a": [0, 1.0],
                "b": [0, 2.0],
                "c": [0, 3.0],
            },
            rng=rng,
        )
