"""Reference-parity behaviour tests for ``utils.{io,sampling,structures}``.

Behaviours mirrored from ``/root/reference/tests/test_utils/
{test_io_utils,test_sampling_utils,test_structures_utils}.py``, written
fresh against this package's API (integration-style, no mocks).
"""

import json
import os
import pickle

import numpy as np
import pytest
from scipy import special, stats

from nessai_tpu import config
from nessai_tpu.livepoint import numpy_array_to_live_points
from nessai_tpu.utils.io import (
    NessaiJSONEncoder,
    add_dict_to_hdf5_file,
    is_jsonable,
    safe_file_dump,
    save_dict_to_hdf5,
    save_live_points,
    save_to_json,
)
from nessai_tpu.utils.sampling import (
    NDimensionalTruncatedGaussian,
    compute_radius,
    draw_gaussian,
    draw_nsphere,
    draw_surface_nsphere,
    draw_truncated_gaussian,
    draw_uniform,
)
from nessai_tpu.utils.structures import (
    array_split_chunksize,
    get_inverse_indices,
    get_subset_arrays,
    isfinite_struct,
    replace_in_list,
)


@pytest.fixture
def data_dict():
    return dict(
        a=np.array([1, 2, 3]),
        b=np.array([(1, 2)], dtype=[("x", "f4"), ("y", "f4")]),
        l=[1, 2, 3],
        dict1={"a": None, "b": 2},
        dict2={"c": [1, 2, 3], "array": np.array([3, 4, 5])},
        s="A string",
        nan=None,
    )


# ----------------------------------------------------------------------
# io
# ----------------------------------------------------------------------
def test_is_jsonable_true():
    assert is_jsonable({"x": 2})


def test_is_jsonable_false():
    assert not is_jsonable({"x": object()})


@pytest.mark.parametrize(
    "value, expected",
    [(np.int32(2), 2), (np.float64(2), 2.0), (np.array([1, 2]), [1, 2])],
)
def test_json_encoder_numpy(value, expected):
    assert json.loads(json.dumps(value, cls=NessaiJSONEncoder)) == expected


def test_json_encoder_object_str_fallback():
    out = json.dumps({"o": object()}, cls=NessaiJSONEncoder)
    assert "object object at" in out


def test_save_to_json_integration(tmp_path, data_dict):
    data_dict["cls"] = object()
    filename = tmp_path / "result.json"
    save_to_json(data_dict, filename)
    assert os.path.exists(filename)
    with open(filename, "r") as fp:
        out = json.load(fp)
    assert list(data_dict.keys()) == list(out.keys())


def test_safe_file_dump_no_save_existing(tmp_path):
    f = tmp_path / "test.pkl"
    f.write_bytes(pickle.dumps("a"))
    safe_file_dump("b", str(f), pickle, save_existing=False)
    assert pickle.loads(f.read_bytes()) == "b"
    assert not os.path.exists(str(f) + ".old")
    assert not os.path.exists(str(f) + ".temp")


def test_safe_file_dump_save_existing(tmp_path):
    f = tmp_path / "test.pkl"
    f.write_bytes(pickle.dumps("a"))
    safe_file_dump("b", str(f), pickle, save_existing=True)
    assert pickle.loads(f.read_bytes()) == "b"
    assert pickle.loads((tmp_path / "test.pkl.old").read_bytes()) == "a"


def test_save_live_points_round_trip(tmp_path):
    d = {"x": [1.0, 2.0], "y": [3.0, 4.0]}
    d.update(
        {
            k: 2 * [v]
            for k, v in zip(
                config.livepoints.non_sampling_parameters,
                config.livepoints.non_sampling_defaults,
            )
        }
    )
    live_points = numpy_array_to_live_points(
        np.array([[1.0, 3.0], [2.0, 4.0]]), ["x", "y"]
    )
    filename = os.path.join(str(tmp_path), "test.json")
    save_live_points(live_points, filename)
    with open(filename, "r") as fp:
        d_out = json.load(fp)
    np.testing.assert_equal(d_out, d)


def test_add_dict_to_hdf5_file(tmp_path, data_dict):
    h5py = pytest.importorskip("h5py")
    with h5py.File(tmp_path / "test.h5", "w") as f:
        add_dict_to_hdf5_file(f, "/", data_dict)
        assert list(f.keys()) == sorted(data_dict.keys())
        assert f["/dict1/a"][()].decode() == "__none__"
        np.testing.assert_array_equal(
            f["dict2/array"][:], data_dict["dict2"]["array"]
        )


def test_save_dict_to_hdf5_integration(tmp_path, data_dict):
    h5py = pytest.importorskip("h5py")
    filename = tmp_path / "result.hdf5"
    save_dict_to_hdf5(data_dict, filename)
    with h5py.File(filename, "r") as f:
        keys = list(f.keys())
    assert keys == sorted(list(data_dict.keys()))


# ----------------------------------------------------------------------
# sampling
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "d, q, r",
    [
        [1, 0.6827, 1.0],
        [1, 0.9545, 2.0],
        [2, 0.3935, 1.0],
        [5, 0.8909, 3.0],
        [10, 0.9004, 4.0],
    ],
)
def test_compute_radius_reference_values(d, q, r):
    np.testing.assert_almost_equal(compute_radius(d, q), r, decimal=4)


@pytest.mark.parametrize("ndims, radius", [(2, 1), (10, 2), (10, 10), (1, 1)])
def test_draw_surface_nsphere_on_surface(ndims, radius):
    out = draw_surface_nsphere(ndims, r=radius, N=1000)
    assert out.shape == (1000, ndims)
    np.testing.assert_allclose(np.sqrt(np.sum(out**2.0, axis=1)), radius)


@pytest.mark.parametrize("ndims, radius", [(2, 1), (10, 2), (10, 10), (1, 1)])
def test_draw_nsphere_within_ball(ndims, radius):
    out = draw_nsphere(ndims, r=radius, N=1000)
    assert out.shape == (1000, ndims)
    np.testing.assert_array_less(np.sqrt(np.sum(out**2, axis=-1)), radius)


def test_draw_uniform_shape_and_range():
    out = draw_uniform(2, r=1, N=100, fuzz=2)
    assert out.shape == (100, 2)
    assert np.all(out >= 0) and np.all(out <= 1)


def test_draw_gaussian_shape():
    out = draw_gaussian(2, r=1, N=100, fuzz=2)
    assert out.shape == (100, 2)


@pytest.mark.parametrize(
    "r, var, fuzz",
    [
        (1.0, 1.0, 1.0),
        (2.0, 1.0, 1.0),
        (2.0, 2.0, 1.0),
        (4.0, 2.0, 1.5),
        (7.0, 4.0, 2.0),
    ],
)
def test_draw_truncated_gaussian_1d_distribution(r, var, fuzz):
    rng = np.random.default_rng(2024)
    s = draw_truncated_gaussian(1, r, var=var, N=2000, fuzz=fuzz, rng=rng)
    sigma = np.sqrt(var)
    d = stats.truncnorm(
        -r * fuzz / sigma, r * fuzz / sigma, loc=0, scale=sigma
    )
    _, p = stats.kstest(np.squeeze(s), d.cdf)
    assert p >= 0.01


@pytest.mark.parametrize(
    "fn",
    [
        draw_gaussian,
        draw_nsphere,
        draw_surface_nsphere,
        draw_truncated_gaussian,
        draw_uniform,
    ],
)
def test_draw_functions_use_rng(fn):
    # same seed -> same draws
    a = fn(2, r=1, N=16, rng=np.random.default_rng(7))
    b = fn(2, r=1, N=16, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("dims", [1, 2, 4, 8, 16, 32, 64])
@pytest.mark.parametrize("radius", [1.0, 2.0, 4.0])
@pytest.mark.parametrize("fuzz", [1.0, 1.1, 1.5])
def test_ndimensional_truncated_gaussian_u_max(dims, radius, fuzz):
    expected_u_max = special.gammainc(dims / 2, (radius * fuzz) ** 2 / 2)
    dist = NDimensionalTruncatedGaussian(dims, radius, fuzz)
    np.testing.assert_allclose(dist.u_max, expected_u_max, rtol=1e-12)


@pytest.mark.parametrize(
    "r, fuzz",
    [(1.0, 1.0), (2.0, 1.0), (4.0, 1.5), (7.0, 2.0)],
)
def test_ndimensional_truncated_gaussian_sample(r, fuzz):
    dist = NDimensionalTruncatedGaussian(
        1, r, fuzz=fuzz, rng=np.random.default_rng(11)
    )
    s = dist.sample(10_000)
    d = stats.truncnorm(-r * fuzz, r * fuzz, loc=0)
    _, p = stats.kstest(np.squeeze(s), d.cdf)
    assert p >= 0.01


# ----------------------------------------------------------------------
# structures
# ----------------------------------------------------------------------
def test_replace_in_list_pairs():
    x = [1, 2, 3]
    replace_in_list(x, [1, 2], [5, 4])
    assert x == [5, 4, 3]


def test_replace_in_list_item():
    x = [1, 2, 3]
    replace_in_list(x, 3, 4)
    assert x == [1, 2, 4]


def test_replace_in_list_strings():
    x = ["aa", "bb", "cc"]
    replace_in_list(x, ["aa", "bb"], ["dd", "ee"])
    assert x == ["dd", "ee", "cc"]


def test_replace_in_list_single_str():
    x = ["aa", "bb", "cc"]
    replace_in_list(x, "aa", "dd")
    assert x == ["dd", "bb", "cc"]


def test_replace_in_list_different_lengths():
    with pytest.raises(RuntimeError) as excinfo:
        replace_in_list([1, 2], [1, 2], 3)
    assert "Targets and replacements are different lengths!" in str(
        excinfo.value
    )


def test_replace_in_list_missing_targets():
    with pytest.raises(ValueError) as excinfo:
        replace_in_list([1, 2], 4, 3)
    assert "Targets [4] not in list: [1, 2]" in str(excinfo.value)


def test_get_subset_arrays_values():
    a = np.array([1, 2, 3])
    b = np.array([4, 5, 6])
    indices = np.array([1, 2])
    a_out, b_out = get_subset_arrays(indices, a, b)
    np.testing.assert_equal(a_out, a[indices])
    np.testing.assert_equal(b_out, b[indices])


def test_get_subset_arrays_empty():
    assert get_subset_arrays(np.array([1, 2])) == ()


@pytest.mark.parametrize(
    "names, expected",
    [
        (None, [False, True, False]),
        (["x", "y", "z"], [False, True, False]),
        (["x"], [True, True, True]),
        (["y"], [False, True, True]),
        (["z"], [True, True, False]),
    ],
)
def test_isfinite_struct_cases(names, expected):
    x = np.array(
        [(0, np.inf, 0), (1, 1, 1), (2, 2, np.nan)],
        dtype=[("x", "f8"), ("y", "f8"), ("z", "f8")],
    )
    out = isfinite_struct(x, names=names)
    assert len(out) == 3
    np.testing.assert_equal(out, np.array(expected))


def test_isfinite_struct_invalid_name():
    x = np.array([(1,), (2,)], dtype=[("x", "i4")])
    with pytest.raises((ValueError, KeyError)):
        isfinite_struct(x, ["y"])


def test_array_split_chunksize_sizes():
    a = np.array([1, 2, 3, 4, 5])
    out = array_split_chunksize(a, 2)
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], a[:2])
    np.testing.assert_array_equal(out[1], a[2:4])
    np.testing.assert_array_equal(out[2], a[4:])


def test_array_split_chunksize_larger_than_array():
    a = np.array([1, 2, 3, 4, 5])
    out = array_split_chunksize(a, 6)
    assert len(out) == 1
    np.testing.assert_array_equal(out[0], a)


def test_array_split_chunksize_invalid():
    with pytest.raises(ValueError, match="chunksize must be greater than 1"):
        array_split_chunksize(np.array([1, 2]), -1)


def test_get_inverse_indices_values():
    np.testing.assert_array_equal(
        get_inverse_indices(5, np.array([1, 2, 3])), [0, 4]
    )


def test_get_inverse_indices_empty():
    np.testing.assert_array_equal(
        get_inverse_indices(5, np.array([0, 1, 2, 3, 4])), []
    )


def test_get_inverse_indices_out_of_range():
    with pytest.raises(
        ValueError, match="Indices contain values that are out of range for n"
    ):
        get_inverse_indices(4, np.array([0, 1, 4]))
