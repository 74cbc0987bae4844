"""Tests for the live-point codec."""

import numpy as np

from nessai_tpu import config
from nessai_tpu.livepoint import (
    add_extra_parameters_to_live_points,
    dict_to_live_points,
    empty_structured_array,
    get_dtype,
    live_points_to_array,
    live_points_to_dict,
    numpy_array_to_live_points,
    parameters_to_live_point,
    unstructured_view,
)


def test_get_dtype():
    dtype = get_dtype(["x", "y"])
    assert dtype.names == ("x", "y", "logP", "logL", "it")


def test_empty_structured_array():
    x = empty_structured_array(3, names=["a", "b"])
    assert len(x) == 3
    assert np.all(np.isnan(x["a"]))
    assert np.all(np.isnan(x["logL"]))
    assert np.all(x["it"] == 0)


def test_roundtrip_array():
    arr = np.arange(6, dtype=float).reshape(3, 2)
    lp = numpy_array_to_live_points(arr, ["x", "y"])
    back = live_points_to_array(lp, ["x", "y"])
    np.testing.assert_array_equal(arr, back)


def test_unstructured_view_is_view():
    arr = np.arange(6, dtype=float).reshape(3, 2)
    lp = numpy_array_to_live_points(arr, ["x", "y"])
    view = unstructured_view(lp, names=["x", "y"])
    view[0, 0] = -99.0
    assert lp["x"][0] == -99.0


def test_dict_roundtrip():
    d = {"x": np.array([1.0, 2.0]), "y": np.array([3.0, 4.0])}
    lp = dict_to_live_points(d)
    d2 = live_points_to_dict(lp, ["x", "y"])
    np.testing.assert_array_equal(d["x"], d2["x"])


def test_parameters_to_live_point():
    lp = parameters_to_live_point([1.0, 2.0], ["x", "y"])
    assert lp["x"][0] == 1.0
    assert lp["y"][0] == 2.0


def test_extra_parameters():
    add_extra_parameters_to_live_points(["logW"], [0.0])
    x = empty_structured_array(2, names=["a", "b"])
    assert "logW" in x.dtype.names
    assert np.all(x["logW"] == 0.0)
    config.livepoints.reset()
