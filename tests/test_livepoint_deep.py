"""Deep tests for the live-point codec.

Mirrors the high-value assertions of the reference's
``tests/test_livepoint.py`` (461 LoC): extra-parameter registration,
dtype control, empty/zero-point arrays, all converter roundtrips with
non-sampling fields, and the zero-copy unstructured view.
"""

import numpy as np
import pandas as pd
import pytest

from nessai_tpu import config
from nessai_tpu.livepoint import (
    add_extra_parameters_to_live_points,
    dataframe_to_live_points,
    dict_to_live_points,
    empty_structured_array,
    get_dtype,
    live_points_to_array,
    live_points_to_dataframe,
    live_points_to_dict,
    numpy_array_to_live_points,
    parameters_to_live_point,
    reset_extra_live_points_parameters,
    unstructured_view,
)


class TestExtraParameters:
    def test_add_with_defaults(self):
        add_extra_parameters_to_live_points(["logW"], default_values=[0.0])
        try:
            assert "logW" in config.livepoints.extra_parameters
            x = empty_structured_array(2, names=["x"])
            assert np.all(x["logW"] == 0.0)
        finally:
            reset_extra_live_points_parameters()

    def test_duplicate_warns(self, caplog):
        add_extra_parameters_to_live_points(["logW"], default_values=[0.0])
        try:
            with caplog.at_level("WARNING"):
                add_extra_parameters_to_live_points(
                    ["logW"], default_values=[1.0]
                )
            assert "already been added" in caplog.text
            # the original default is kept
            x = empty_structured_array(1, names=["x"])
            assert x["logW"][0] == 0.0
        finally:
            reset_extra_live_points_parameters()


class TestDtype:
    def test_fields_and_order(self):
        dt = get_dtype(["a", "b"])
        assert dt.names[:2] == ("a", "b")
        for f in config.livepoints.non_sampling_parameters:
            assert f in dt.names

    def test_custom_array_dtype(self):
        dt = get_dtype(["a"], array_dtype="f4")
        assert dt["a"] == np.dtype("f4")


class TestEmptyStructuredArray:
    def test_defaults_filled(self):
        x = empty_structured_array(3, names=["a"])
        assert np.isnan(x["a"]).all()
        for f, v in zip(
            config.livepoints.non_sampling_parameters,
            config.livepoints.non_sampling_defaults,
        ):
            if np.isnan(v):
                assert np.isnan(x[f]).all()
            else:
                assert np.all(x[f] == v)

    def test_zero_points(self):
        x = empty_structured_array(0, names=["a"])
        assert x.size == 0
        assert "a" in x.dtype.names

    def test_from_dtype_only(self):
        dt = get_dtype(["a", "b"])
        x = empty_structured_array(2, dtype=dt)
        assert np.isnan(x["a"]).all()
        assert np.isnan(x["b"]).all()


class TestConverters:
    def test_parameters_to_live_point(self):
        x = parameters_to_live_point([1.0, 2.0], ["a", "b"])
        assert x.size == 1
        assert x["a"][0] == 1.0
        assert x["b"][0] == 2.0

    def test_parameters_to_live_point_empty(self):
        x = parameters_to_live_point([], ["a", "b"])
        assert x.size == 0

    def test_numpy_1d_becomes_single_point(self):
        x = numpy_array_to_live_points(np.array([1.0, 2.0]), ["a", "b"])
        assert x.size == 1
        assert x["b"][0] == 2.0

    def test_numpy_empty(self):
        x = numpy_array_to_live_points(np.empty((0, 2)), ["a", "b"])
        assert x.size == 0

    def test_array_roundtrip_subset_names(self, rng):
        arr = rng.normal(size=(5, 3))
        x = numpy_array_to_live_points(arr, ["a", "b", "c"])
        out = live_points_to_array(x, names=["c", "a"])
        np.testing.assert_array_equal(out[:, 0], arr[:, 2])
        np.testing.assert_array_equal(out[:, 1], arr[:, 0])

    def test_dict_roundtrip_with_non_sampling(self, rng):
        d = {"a": rng.normal(size=4), "b": rng.normal(size=4)}
        x = dict_to_live_points(d)
        x["logL"] = 1.0
        back = live_points_to_dict(x)
        np.testing.assert_array_equal(back["a"], d["a"])
        assert np.all(back["logL"] == 1.0)

    def test_dict_scalar_values(self):
        x = dict_to_live_points({"a": 1.0, "b": 2.0})
        assert x.size == 1

    def test_dict_with_logL_field(self, rng):
        d = {
            "a": rng.normal(size=3),
            "logL": np.arange(3, dtype=float),
        }
        x = dict_to_live_points(d)
        np.testing.assert_array_equal(x["logL"], d["logL"])
        assert "a" in x.dtype.names

    def test_dataframe_roundtrip(self, rng):
        df = pd.DataFrame(
            {"a": rng.normal(size=6), "b": rng.normal(size=6)}
        )
        x = dataframe_to_live_points(df)
        assert x.size == 6
        df2 = live_points_to_dataframe(x)
        np.testing.assert_array_equal(df2["a"].to_numpy(), df["a"])
        for f in config.livepoints.non_sampling_parameters:
            assert f in df2.columns


class TestUnstructuredView:
    def test_is_zero_copy(self, rng):
        x = numpy_array_to_live_points(rng.normal(size=(4, 2)), ["a", "b"])
        v = unstructured_view(x)
        v[0, 0] = 123.0
        assert x["a"][0] == 123.0

    def test_names_subset(self, rng):
        x = numpy_array_to_live_points(rng.normal(size=(4, 3)), ["a", "b", "c"])
        v = unstructured_view(x, names=["a", "b"])
        assert v.shape == (4, 2)

    def test_shape(self, rng):
        x = numpy_array_to_live_points(rng.normal(size=(4, 2)), ["a", "b"])
        assert unstructured_view(x).shape == (4, 2)


class TestRound3LivepointEdges:
    @pytest.mark.parametrize(
        "converter",
        ["dict", "dataframe", "array"],
    )
    def test_roundtrip_converters(self, rng, converter):
        from nessai_tpu.livepoint import (
            dataframe_to_live_points,
            dict_to_live_points,
            live_points_to_array,
            live_points_to_dataframe,
            live_points_to_dict,
            numpy_array_to_live_points,
        )

        x = numpy_array_to_live_points(
            rng.normal(size=(7, 2)), ["a", "b"]
        )
        if converter == "dict":
            d = live_points_to_dict(x)
            y = dict_to_live_points(d)
            np.testing.assert_allclose(y["a"], x["a"])
        elif converter == "dataframe":
            df = live_points_to_dataframe(x)
            y = dataframe_to_live_points(df)
            np.testing.assert_allclose(y["b"], x["b"])
        else:
            arr = live_points_to_array(x, ["a", "b"])
            y = numpy_array_to_live_points(arr, ["a", "b"])
            np.testing.assert_allclose(y["a"], x["a"])

    def test_empty_structured_array_zero_rows(self):
        from nessai_tpu.livepoint import empty_structured_array

        x = empty_structured_array(0, names=["a"])
        assert len(x) == 0
        assert "logL" in x.dtype.names

    def test_unstructured_view_is_zero_copy(self, rng):
        from nessai_tpu.livepoint import (
            numpy_array_to_live_points,
            unstructured_view,
        )

        x = numpy_array_to_live_points(rng.normal(size=(4, 2)), ["a", "b"])
        v = unstructured_view(x, names=["a", "b"])
        v[0, 0] = 123.0
        assert x["a"][0] == 123.0


def test_dict_to_live_points_non_sampling_parameters_false():
    from nessai_tpu.livepoint import dict_to_live_points

    d = {"x": np.arange(3.0), "y": np.ones(3)}
    out = dict_to_live_points(d, non_sampling_parameters=False)
    assert set(out.dtype.names) == {"x", "y"}
    out2 = dict_to_live_points(d)
    assert "logL" in out2.dtype.names


def test_dataframe_to_live_points_non_sampling_parameters_false():
    import pandas as pd
    from nessai_tpu.livepoint import dataframe_to_live_points

    df = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0]})
    out = dataframe_to_live_points(df, non_sampling_parameters=False)
    assert set(out.dtype.names) == {"x", "y"}
    assert np.allclose(out["x"], [1.0, 2.0])
