"""Deep branch coverage for the rescaling reparameterisations.

Ports the highest-value assertions of the reference's
``tests/test_reparameterisations/test_rescale_to_bounds.py`` (1045 LoC)
and ``test_rescale.py``: every option combination must roundtrip with
consistent Jacobians, and every error branch must raise.
"""

import numpy as np
import pytest

from nessai_tpu.livepoint import (
    empty_structured_array,
    numpy_array_to_live_points,
)
from nessai_tpu.reparameterisations.rescale import (
    Rescale,
    RescaleToBounds,
    ScaleAndShift,
)


def _x(names, values):
    x = empty_structured_array(len(values), names=names)
    for i, n in enumerate(names):
        x[n] = np.asarray(values)[:, i]
    return x


def _prime_array(n, reparam):
    fields = reparam.prime_parameters
    return numpy_array_to_live_points(np.zeros((n, len(fields))), fields)


def _roundtrip(reparam, x):
    """reparameterise then inverse_reparameterise; return both."""
    n = len(x)
    x_prime = _prime_array(n, reparam)
    log_j = np.zeros(n)
    x1, x_prime, log_j = reparam.reparameterise(x.copy(), x_prime, log_j)
    m = len(x_prime)
    x_out = x1.copy()
    log_j_inv = np.zeros(m)
    x_out, _, log_j_inv = reparam.inverse_reparameterise(
        x_out, x_prime, log_j_inv
    )
    return x1, x_prime, log_j, x_out, log_j_inv


# ----------------------------------------------------------------------
# ScaleAndShift / Rescale
# ----------------------------------------------------------------------
def test_scale_and_shift_requires_scale():
    with pytest.raises(RuntimeError, match="scale"):
        ScaleAndShift(parameters="x", prior_bounds={"x": [0, 1]})


def test_rescale_requires_scale():
    with pytest.raises(RuntimeError, match="scale"):
        Rescale(parameters="x", prior_bounds={"x": [0, 1]})


@pytest.mark.parametrize(
    "scale", [2.0, {"x": 2.0, "y": 4.0}, [2.0, 4.0], np.array([2.0, 4.0])]
)
def test_scale_and_shift_scale_formats(scale):
    r = ScaleAndShift(
        parameters=["x", "y"],
        prior_bounds={"x": [-1, 1], "y": [-2, 2]},
        scale=scale,
    )
    assert r.scale["x"] == 2.0
    assert set(r.scale) == {"x", "y"}


def test_scale_and_shift_roundtrip_with_shift():
    r = ScaleAndShift(
        parameters=["x"],
        prior_bounds={"x": [-5, 5]},
        scale=2.0,
        shift=1.0,
    )
    x = _x(["x"], np.linspace(-4, 4, 11)[:, None])
    x1, x_prime, log_j, x_out, log_j_inv = _roundtrip(r, x)
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-12)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-12)
    # forward map is (x - shift)/scale
    np.testing.assert_allclose(x_prime["x_prime"], (x["x"] - 1.0) / 2.0)
    # Jacobian is -log|scale|
    np.testing.assert_allclose(log_j, -np.log(2.0))


def test_scale_and_shift_estimate_updates():
    rng = np.random.default_rng(42)
    r = ScaleAndShift(
        parameters=["x"],
        prior_bounds={"x": [-10, 10]},
        estimate=True,
        rng=rng,
    )
    data = _x(["x"], rng.normal(3.0, 2.0, size=(1000, 1)))
    r.update(data)
    assert np.isclose(r.shift["x"], 3.0, atol=0.3)
    assert np.isclose(r.scale["x"], 2.0, atol=0.3)
    # roundtrip after estimation
    x1, x_prime, log_j, x_out, log_j_inv = _roundtrip(r, data[:16])
    np.testing.assert_allclose(x_out["x"], data[:16]["x"], atol=1e-10)


def test_scale_and_shift_estimate_scale_only():
    rng = np.random.default_rng(1)
    r = ScaleAndShift(
        parameters=["x"],
        prior_bounds={"x": [-10, 10]},
        estimate_scale=True,
    )
    assert r.estimate_scale and not r.estimate_shift
    data = _x(["x"], rng.normal(5.0, 3.0, size=(500, 1)))
    r.update(data)
    assert r.shift["x"] == 0.0
    assert r.scale["x"] != 1.0


def test_scale_and_shift_as_affine():
    r = ScaleAndShift(
        parameters=["x"], prior_bounds={"x": [0, 1]}, scale=3.0, shift=0.5
    )
    aff = r.as_affine()
    assert aff == {"x": (3.0, 0.5)}
    # pre/post rescaling disables the affine fast path
    r2 = ScaleAndShift(
        parameters=["x"],
        prior_bounds={"x": [0.01, 0.99]},
        scale=1.0,
        pre_rescaling="logit",
    )
    assert r2.as_affine() is None


def test_scale_and_shift_pre_rescaling_roundtrip():
    r = ScaleAndShift(
        parameters=["x"],
        prior_bounds={"x": [0.01, 0.99]},
        scale=1.0,
        pre_rescaling="logit",
    )
    x = _x(["x"], np.linspace(0.05, 0.95, 9)[:, None])
    x1, x_prime, log_j, x_out, log_j_inv = _roundtrip(r, x)
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-10)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-10)


def test_scale_and_shift_unknown_rescaling():
    with pytest.raises(RuntimeError, match="Unknown rescaling function"):
        ScaleAndShift(
            parameters="x",
            prior_bounds={"x": [0, 1]},
            scale=1.0,
            pre_rescaling="not-a-function",
        )


def test_scale_and_shift_invalid_rescaling_type():
    with pytest.raises(RuntimeError, match="must be a str or tuple"):
        ScaleAndShift(
            parameters="x",
            prior_bounds={"x": [0, 1]},
            scale=1.0,
            post_rescaling=123,
        )


def test_scale_and_shift_custom_rescaling_pair():
    fwd = lambda x: (2 * x, np.full_like(x, np.log(2)))  # noqa: E731
    inv = lambda x: (0.5 * x, np.full_like(x, -np.log(2)))  # noqa: E731
    r = ScaleAndShift(
        parameters="x",
        prior_bounds={"x": [0, 1]},
        scale=1.0,
        post_rescaling=(fwd, inv),
    )
    x = _x(["x"], np.linspace(0.1, 0.9, 5)[:, None])
    _, _, log_j, x_out, log_j_inv = _roundtrip(r, x)
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-12)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-12)


# ----------------------------------------------------------------------
# RescaleToBounds: construction / validation
# ----------------------------------------------------------------------
def test_rtb_defaults():
    r = RescaleToBounds(parameters=["x"], prior_bounds={"x": [0.0, 10.0]})
    assert r.rescale_bounds == {"x": [-1.0, 1.0]}
    assert r.offsets == {"x": 0.0}
    assert r.update_bounds_enabled


def test_rtb_rescale_bounds_dict():
    r = RescaleToBounds(
        parameters=["x", "y"],
        prior_bounds={"x": [0, 1], "y": [0, 2]},
        rescale_bounds={"x": [0, 1], "y": [-1, 1]},
    )
    assert r.rescale_bounds["x"] == [0.0, 1.0]
    assert r.rescale_bounds["y"] == [-1.0, 1.0]


def test_rtb_unknown_inversion_parameter():
    with pytest.raises(RuntimeError, match="Unknown inversion parameters"):
        RescaleToBounds(
            parameters=["x"],
            prior_bounds={"x": [0, 1]},
            boundary_inversion=["y"],
        )


def test_rtb_unknown_inversion_type():
    with pytest.raises(RuntimeError, match="Unknown inversion type"):
        RescaleToBounds(
            parameters=["x"],
            prior_bounds={"x": [0, 1]},
            boundary_inversion=True,
            inversion_type="reflect",
        )


def test_rtb_detect_edges_requires_inversion():
    with pytest.raises(RuntimeError, match="Must enable boundary inversion"):
        RescaleToBounds(
            parameters=["x"],
            prior_bounds={"x": [0, 1]},
            detect_edges=True,
        )


def test_rtb_boundary_inversion_list_and_true():
    r1 = RescaleToBounds(
        parameters=["x", "y"],
        prior_bounds={"x": [0, 1], "y": [0, 1]},
        boundary_inversion=["x"],
    )
    assert r1.boundary_inversion == {"x": "split"}
    r2 = RescaleToBounds(
        parameters=["x", "y"],
        prior_bounds={"x": [0, 1], "y": [0, 1]},
        boundary_inversion=True,
    )
    assert r2.boundary_inversion == {"x": "split", "y": "split"}
    # reference rejects strings (``rescale.py:440-444``)
    with pytest.raises(TypeError, match="list, dict or bool"):
        RescaleToBounds(
            parameters=["x", "y"],
            prior_bounds={"x": [0, 1], "y": [0, 1]},
            boundary_inversion="x",
        )


# ----------------------------------------------------------------------
# RescaleToBounds: maps and Jacobians
# ----------------------------------------------------------------------
@pytest.mark.parametrize("rescale_bounds", [[-1, 1], [0, 1], [-2, 3]])
def test_rtb_roundtrip_bounds(rescale_bounds):
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [2.0, 6.0]},
        rescale_bounds=rescale_bounds,
        update_bounds=False,
    )
    x = _x(["x"], np.linspace(2.0, 6.0, 13)[:, None])
    x1, x_prime, log_j, x_out, log_j_inv = _roundtrip(r, x)
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-12)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-12)
    # endpoints map to the rescale bounds
    assert np.isclose(x_prime["x_prime"][0], rescale_bounds[0])
    assert np.isclose(x_prime["x_prime"][-1], rescale_bounds[1])


def test_rtb_offset():
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [100.0, 110.0]},
        offset=True,
        update_bounds=False,
    )
    assert r.offsets["x"] == 105.0
    x = _x(["x"], np.linspace(100, 110, 7)[:, None])
    _, x_prime, log_j, x_out, log_j_inv = _roundtrip(r, x)
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-9)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-12)


def test_rtb_update_bounds_from_data():
    rng = np.random.default_rng(0)
    r = RescaleToBounds(
        parameters=["x"], prior_bounds={"x": [0.0, 100.0]}, update_bounds=True
    )
    data = _x(["x"], rng.uniform(40, 60, size=(200, 1)))
    r.update(data)
    assert r.bounds["x"][0] >= 40.0
    assert r.bounds["x"][1] <= 60.0
    # roundtrip inside the updated bounds
    x = _x(["x"], rng.uniform(41, 59, size=(20, 1)))
    _, _, log_j, x_out, log_j_inv = _roundtrip(r, x)
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-10)


def test_rtb_update_does_not_reset_edges_via_update_bounds():
    """``update_bounds`` only updates bounds; ``update`` also resets the
    inversion (reference ``rescale.py:699-725``)."""
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0, 1]},
        boundary_inversion=True,
    )
    r._edges = {"x": "lower"}
    x = _x(["x"], np.random.default_rng(0).random((10, 1)))
    r.update_bounds(x)
    assert r._edges == {"x": "lower"}
    r.update(x)
    assert r._edges == {"x": None}


def test_rtb_reset_restores_prior_bounds():
    rng = np.random.default_rng(0)
    r = RescaleToBounds(
        parameters=["x"], prior_bounds={"x": [0.0, 10.0]}, update_bounds=True
    )
    r.update(_x(["x"], rng.uniform(4, 6, size=(50, 1))))
    assert r.bounds["x"][1] < 10.0
    r.reset()
    np.testing.assert_allclose(r.bounds["x"], [0.0, 10.0])


def test_rtb_set_bounds():
    r = RescaleToBounds(
        parameters=["x"], prior_bounds={"x": [0.0, 1.0]}, offset=False
    )
    r.set_bounds({"x": [-2.0, 2.0]})
    np.testing.assert_allclose(r.bounds["x"], [-2.0, 2.0])


def test_rtb_reset_inversion_only_clears_edges():
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0.0, 1.0]},
        boundary_inversion=True,
    )
    r._edges["x"] = "lower"
    bounds_before = dict(r.bounds)
    r.reset_inversion()
    assert r._edges["x"] is None
    assert r.bounds == bounds_before


def test_rtb_post_rescaling_roundtrip():
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0.0, 1.0]},
        rescale_bounds=[0.0, 1.0],
        post_rescaling="logit",
        update_bounds=False,
    )
    x = _x(["x"], np.linspace(0.05, 0.95, 9)[:, None])
    _, _, log_j, x_out, log_j_inv = _roundtrip(r, x)
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-8)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-8)


# ----------------------------------------------------------------------
# Boundary inversion
# ----------------------------------------------------------------------
def _edge_data(edge, n=400, rng=None):
    rng = rng or np.random.default_rng(7)
    if edge == "lower":
        vals = rng.beta(1, 5, size=n)  # mass at 0
    else:
        vals = rng.beta(5, 1, size=n)  # mass at 1
    return _x(["x"], vals[:, None])


@pytest.mark.parametrize("edge", ["lower", "upper"])
def test_rtb_inversion_split_roundtrip(edge):
    rng = np.random.default_rng(3)
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0.0, 1.0]},
        boundary_inversion=True,
        detect_edges=True,
        inversion_type="split",
        rng=rng,
    )
    x = _edge_data(edge)
    r.update(x)
    x1, x_prime, log_j, x_out, log_j_inv = _roundtrip(r, x)
    assert r._edges["x"] in ("lower", "upper", False, None)
    # same length in split mode
    assert len(x_prime) == len(x)
    np.testing.assert_allclose(x_out["x"], x1["x"], atol=1e-10)


@pytest.mark.parametrize("edge", ["lower", "upper"])
def test_rtb_inversion_duplicate_doubles(edge):
    rng = np.random.default_rng(3)
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0.0, 1.0]},
        boundary_inversion=True,
        inversion_type="duplicate",
        rng=rng,
    )
    x = _edge_data(edge)
    r.update(x)
    r._edges["x"] = edge  # force the edge
    x_prime = _prime_array(len(x), r)
    log_j = np.zeros(len(x))
    x1, x_prime, log_j = r.reparameterise(x.copy(), x_prime, log_j)
    assert len(x_prime) == 2 * len(x)
    assert len(x1) == 2 * len(x)
    assert len(log_j) == 2 * len(x)
    # prime values come in +/- mirrored pairs
    v = x_prime["x_prime"]
    np.testing.assert_allclose(v[: len(x)], -v[len(x) :], atol=1e-12)
    # inverse maps both halves back to the same x
    x_out = x1.copy()
    log_j_inv = np.zeros(len(x_prime))
    x_out, _, _ = r.inverse_reparameterise(x_out, x_prime, log_j_inv)
    np.testing.assert_allclose(
        x_out["x"][: len(x)], x_out["x"][len(x) :], atol=1e-10
    )


def test_rtb_inversion_compute_radius_forces_duplicate():
    rng = np.random.default_rng(3)
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0.0, 1.0]},
        boundary_inversion=True,
        inversion_type="split",
        rng=rng,
    )
    x = _edge_data("lower")
    r.update(x)
    r._edges["x"] = "lower"
    x_prime = _prime_array(len(x), r)
    x1, x_prime, log_j = r.reparameterise(
        x.copy(), x_prime, np.zeros(len(x)), compute_radius=True
    )
    assert len(x_prime) == 2 * len(x)


def test_rtb_inversion_no_edge_plain_rescale():
    """edge=False (no inversion detected) falls through to the plain
    [0,1] rescale with no reflection."""
    rng = np.random.default_rng(3)
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0.0, 1.0]},
        boundary_inversion=True,
        detect_edges=True,
        rng=rng,
    )
    # uniform data: no edge
    x = _x(["x"], rng.uniform(size=(500, 1)))
    r.update(x)
    x1, x_prime, log_j, x_out, log_j_inv = _roundtrip(r, x)
    assert len(x_prime) == len(x)
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-10)


def test_rtb_inversion_truly_no_edge_roundtrip():
    """Centered unimodal data genuinely detects NO edge (False); the
    plain-rescale fallback must round-trip with matching Jacobians
    (reference ``rescale.py:575-583`` forward, ``:597-601`` inverse)."""
    rng = np.random.default_rng(3)
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0.0, 1.0]},
        boundary_inversion=True,
        detect_edges=True,
        rng=rng,
    )
    x = _x(["x"], np.clip(rng.normal(0.5, 0.08, 500), 0, 1)[:, None])
    r.update(x)
    x1, x_prime, log_j, x_out, log_j_inv = _roundtrip(r, x)
    assert r._edges["x"] is False
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-12)
    np.testing.assert_allclose(log_j, -log_j_inv, atol=1e-12)


def test_rtb_inversion_forces_zero_one_rescale_bounds():
    """Inversion parameters always use [0, 1] rescale bounds
    (reference ``rescale.py:447-449``)."""
    r = RescaleToBounds(
        parameters=["x", "y"],
        prior_bounds={"x": [0.0, 1.0], "y": [0.0, 2.0]},
        boundary_inversion=["x"],
    )
    assert r.rescale_bounds["x"] == [0.0, 1.0]
    assert r.rescale_bounds["y"] == [-1.0, 1.0]


# ----------------------------------------------------------------------
# Prime prior
# ----------------------------------------------------------------------
def test_rtb_prime_prior_available():
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0.0, 1.0]},
        prior="uniform",
        update_bounds=False,
    )
    assert r.has_prime_prior
    x_prime = _prime_array(3, r)
    x_prime["x_prime"] = [-0.5, 0.0, 2.0]
    log_p = r.x_prime_log_prior(x_prime)
    assert np.isfinite(log_p[:2]).all()
    assert log_p[2] == -np.inf
    np.testing.assert_allclose(log_p[0], -np.log(2.0))


def test_rtb_prime_prior_unavailable_with_update_bounds():
    r = RescaleToBounds(
        parameters=["x"],
        prior_bounds={"x": [0.0, 1.0]},
        prior="uniform",
        update_bounds=True,
    )
    assert not r.has_prime_prior
    with pytest.raises(RuntimeError, match="Prime prior not available"):
        r.x_prime_log_prior(_prime_array(2, r))


def test_rtb_multi_parameter_mixed_options():
    """Two parameters with different rescale bounds + offsets roundtrip."""
    rng = np.random.default_rng(11)
    r = RescaleToBounds(
        parameters=["x", "y"],
        prior_bounds={"x": [0.0, 1.0], "y": [-20.0, -10.0]},
        rescale_bounds={"x": [0, 1], "y": [-1, 1]},
        offset=True,
        update_bounds=False,
    )
    vals = np.stack(
        [rng.uniform(0, 1, 25), rng.uniform(-20, -10, 25)], axis=1
    )
    x = _x(["x", "y"], vals)
    _, _, log_j, x_out, log_j_inv = _roundtrip(r, x)
    np.testing.assert_allclose(x_out["x"], x["x"], atol=1e-10)
    np.testing.assert_allclose(x_out["y"], x["y"], atol=1e-9)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-10)


def test_rtb_boundary_inversion_dict_per_param_types():
    """Dict form maps parameter -> inversion type (reference
    ``rescale.py:424-445``): one parameter can duplicate while another
    splits."""
    rng = np.random.default_rng(3)
    r = RescaleToBounds(
        parameters=["x", "y"],
        prior_bounds={"x": [0.0, 1.0], "y": [0.0, 1.0]},
        boundary_inversion={"x": "duplicate", "y": "split"},
        rng=rng,
    )
    assert r.boundary_inversion == {"x": "duplicate", "y": "split"}
    assert r._inversion_types == {"x": "duplicate", "y": "split"}
    x = _x(
        ["x", "y"],
        np.stack([rng.beta(1, 5, 100), rng.beta(1, 5, 100)], axis=1),
    )
    r.update(x)
    r._edges["x"] = "lower"
    r._edges["y"] = "lower"
    x_prime = _prime_array(len(x), r)
    x1, x_prime, log_j = r.reparameterise(
        x.copy(), x_prime, np.zeros(len(x))
    )
    # x duplicates -> batch doubles once (y splits in place)
    assert len(x_prime) == 2 * len(x)


def test_rtb_boundary_inversion_invalid_type_raises():
    with pytest.raises(TypeError, match="list, dict or bool"):
        RescaleToBounds(
            parameters=["x"],
            prior_bounds={"x": [0.0, 1.0]},
            boundary_inversion=42,
        )


def test_rtb_boundary_inversion_dict_bad_inversion_type():
    with pytest.raises(RuntimeError, match="Unknown inversion type"):
        RescaleToBounds(
            parameters=["x"],
            prior_bounds={"x": [0.0, 1.0]},
            boundary_inversion={"x": "reflect"},
        )
