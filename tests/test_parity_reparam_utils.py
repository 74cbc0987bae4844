"""Reference-parity tests for the reparameterisation spec utilities and
the pre/post rescaling mixin.

Mirrors ``/root/reference/tests/test_reparameterisations/test_utils.py``
and ``test_pre_post_mixin.py`` against this package's API.
"""

import numpy as np
import pytest

from nessai_tpu.reparameterisations import (
    PrePostRescalingMixin,
    build_reparameterisation_spec,
    normalise_reparameterisation_spec,
    parse_reparameterisations,
    resolve_reparameterisation_parameters,
)
from nessai_tpu.utils.rescaling import rescaling_functions


# ----------------------------------------------------------------------
# build_reparameterisation_spec
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "spec_cfg",
    [
        {"reparameterisation": "scale", "parameters": ["y"], "foo": 1},
        {"reparameterisation": "scale", "foo": 1},
    ],
)
def test_build_spec_model_key(spec_cfg):
    spec = build_reparameterisation_spec("y", spec_cfg, 0, ["x", "y", "z"])
    assert spec.source_key == "y"
    assert spec.reparameterisation == "scale"
    assert spec.input_parameters == ["y"]
    assert spec.kwargs == {"foo": 1}
    assert spec.source_is_parameter is True


def test_build_spec_reparam_key():
    spec = build_reparameterisation_spec(
        "scale", {"parameters": ["y"], "foo": 1}, 0, ["x", "y", "z"]
    )
    assert spec.source_key == "scale"
    assert spec.reparameterisation == "scale"
    assert spec.input_parameters == ["y"]
    assert spec.kwargs == {"foo": 1}
    assert spec.source_is_parameter is False


def test_build_spec_model_key_missing_reparameterisation():
    with pytest.raises(
        RuntimeError, match="No reparameterisation found for x"
    ):
        build_reparameterisation_spec("x", {"scale": 2.0}, 0, ["x"])


@pytest.mark.parametrize(
    "key, cfg, expected_kwargs",
    [
        (
            "x",
            {"reparameterisation": "scale", "prime_parameters": ["x_prime"]},
            {"prime_parameters": ["x_prime"]},
        ),
        (
            "scale",
            {"inverse_input_parameters": ["x"]},
            {"inverse_input_parameters": ["x"]},
        ),
        (
            "scale",
            {"persistent_parameters": ["x_prime"]},
            {"persistent_parameters": ["x_prime"]},
        ),
    ],
)
def test_build_spec_preserves_extra_keys(key, cfg, expected_kwargs):
    spec = build_reparameterisation_spec(key, cfg, 0, ["x"])
    assert spec.kwargs == expected_kwargs


@pytest.mark.parametrize(
    "parameters, expected",
    [("y", ["y"]), (None, [])],
)
def test_build_spec_model_key_parameter_variants(parameters, expected):
    spec = build_reparameterisation_spec(
        "x",
        {"reparameterisation": "scale", "parameters": parameters},
        0,
        ["x"],
    )
    assert spec.input_parameters == expected


def test_build_spec_reparam_key_list():
    spec = build_reparameterisation_spec("scale", ["x", "y"], 0, ["x", "y"])
    assert spec.input_parameters == ["x", "y"]


def test_build_spec_reparam_key_invalid():
    with pytest.raises(TypeError, match="Unknown config type for: scale"):
        build_reparameterisation_spec("scale", 1, 0, ["x"])


# ----------------------------------------------------------------------
# normalise_reparameterisation_spec
# ----------------------------------------------------------------------
def test_normalise_spec_str():
    assert normalise_reparameterisation_spec("x", "scale", ["x"]) == ["scale"]


def test_normalise_spec_dict():
    cfg = {"reparameterisation": "scale", "parameters": ["y"], "foo": 1}
    assert normalise_reparameterisation_spec("x", cfg, ["x"]) == [cfg]


def test_normalise_spec_list():
    assert normalise_reparameterisation_spec("x", ["y", "z"], ["x"]) == [
        "y",
        "z",
    ]


def test_normalise_spec_invalid():
    with pytest.raises(
        TypeError,
        match=(
            "Unknown config type for: x. Expected str, dict or list, "
            "received instance of <class 'int'>."
        ),
    ):
        normalise_reparameterisation_spec("x", 1, ["x"])


# ----------------------------------------------------------------------
# parse_reparameterisations
# ----------------------------------------------------------------------
def test_parse_reparameterisations_dict():
    reparameterisations = {
        "scale": {"parameters": ["w"]},
        "x": "scale",
        "y": {
            "reparameterisation": "log",
            "parameters": ["y_prime"],
            "foo": 1,
        },
        "log": "z",
    }
    specs = parse_reparameterisations(
        reparameterisations, ["w", "x", "y", "z"]
    )
    assert len(specs) == 4

    assert specs[0].source_key == "scale"
    assert specs[0].reparameterisation == "scale"
    assert specs[0].input_parameters == ["w"]
    assert specs[0].kwargs == {}

    assert specs[1].source_key == "x"
    assert specs[1].reparameterisation == "scale"
    assert specs[1].input_parameters == ["x"]
    assert specs[1].kwargs == {}

    assert specs[2].source_key == "y"
    assert specs[2].reparameterisation == "log"
    assert specs[2].input_parameters == ["y_prime"]
    assert specs[2].kwargs == {"foo": 1}

    assert specs[3].source_key == "log"
    assert specs[3].reparameterisation == "log"
    assert specs[3].input_parameters == ["z"]
    assert specs[3].kwargs == {}


def test_parse_reparameterisations_dict_reparam_list():
    specs = parse_reparameterisations(
        {"scale": ["x", "y", "z"]}, ["x", "y", "z"]
    )
    assert len(specs) == 1
    assert specs[0].source_key == "scale"
    assert specs[0].reparameterisation == "scale"
    assert specs[0].input_parameters == ["x", "y", "z"]
    assert specs[0].kwargs == {}


def test_parse_reparameterisations_str():
    specs = parse_reparameterisations("scale", ["x", "y", "z"])
    assert len(specs) == 1
    assert specs[0].source_key == "scale"
    assert specs[0].reparameterisation == "scale"
    assert specs[0].input_parameters == ["x", "y", "z"]
    assert specs[0].kwargs == {}


def test_parse_reparameterisations_none():
    assert parse_reparameterisations(None, ["x", "y", "z"]) == []


def test_parse_reparameterisations_invalid_type():
    with pytest.raises(
        TypeError, match="must be a dictionary, string or None"
    ):
        parse_reparameterisations(1, ["x"])


def test_parse_reparameterisations_regex():
    specs = parse_reparameterisations(
        {"scale": {"parameters": ["x.*"]}}, ["x_0", "x_1", "y"]
    )
    assert len(specs) == 1
    assert specs[0].source_key == "scale"
    assert specs[0].reparameterisation == "scale"
    # matching happens later in resolve_reparameterisation_parameters
    assert specs[0].input_parameters == ["x.*"]
    assert specs[0].kwargs == {}


def test_parse_reparameterisations_chained():
    reparameterisations = {
        "x": [
            {
                "reparameterisation": "rescaletobounds",
                "output_parameters": ["x_01"],
            },
            {"reparameterisation": "log", "input_parameters": ["x_01"]},
        ]
    }
    specs = parse_reparameterisations(reparameterisations, ["x"])
    assert len(specs) == 2
    assert specs[0].reparameterisation == "rescaletobounds"
    assert specs[1].reparameterisation == "log"
    assert specs[0].input_parameters == ["x"]
    assert specs[1].input_parameters == ["x_01"]
    assert specs[0].spec_index == 0
    assert specs[1].spec_index == 1


# ----------------------------------------------------------------------
# resolve_reparameterisation_parameters
# ----------------------------------------------------------------------
def test_resolve_parameters_regex():
    assert resolve_reparameterisation_parameters(
        ["x.*"], ["x_0", "x_1", "y"]
    ) == ["x_0", "x_1"]


def test_resolve_parameters_no_match():
    assert (
        resolve_reparameterisation_parameters(["z.*"], ["x_0", "x_1", "y"])
        == []
    )


def test_resolve_parameters_list():
    assert resolve_reparameterisation_parameters(
        ["x_0", "x_1"], ["x_0", "x_1", "y"]
    ) == ["x_0", "x_1"]


def test_resolve_parameters_str():
    assert resolve_reparameterisation_parameters(
        "x_0", ["x_0", "x_1", "y"]
    ) == ["x_0"]


def test_resolve_parameters_none():
    assert resolve_reparameterisation_parameters(None, ["x"]) is None


# ----------------------------------------------------------------------
# PrePostRescalingMixin
# ----------------------------------------------------------------------
def test_default_pre_rescaling_identity():
    m = PrePostRescalingMixin()
    x = np.array([1.0, 2.0, 3.0])
    x_out, log_j = m.pre_rescaling(x)
    x_inv, log_j_inv = m.pre_rescaling_inv(x)
    np.testing.assert_array_equal(x_out, x)
    np.testing.assert_array_equal(x_inv, x)
    np.testing.assert_array_equal(log_j, np.zeros(3))
    np.testing.assert_array_equal(log_j_inv, np.zeros(3))


def test_default_post_rescaling_identity():
    m = PrePostRescalingMixin()
    x = np.array([1.0, 2.0, 3.0])
    x_out, log_j = m.post_rescaling(x)
    x_inv, log_j_inv = m.post_rescaling_inv(x)
    np.testing.assert_array_equal(x_out, x)
    np.testing.assert_array_equal(x_inv, x)
    np.testing.assert_array_equal(log_j, np.zeros(3))
    np.testing.assert_array_equal(log_j_inv, np.zeros(3))


def test_configure_pre_rescaling_none():
    m = PrePostRescalingMixin()
    m.configure_pre_rescaling(None)
    assert m.has_pre_rescaling is False


def test_configure_post_rescaling_none():
    m = PrePostRescalingMixin()
    m.configure_post_rescaling(None)
    assert m.has_post_rescaling is False


def test_pre_rescaling_with_functions():
    m = PrePostRescalingMixin()
    m.configure_pre_rescaling((np.exp, np.log))
    assert m.has_pre_rescaling is True
    assert m.pre_rescaling is np.exp
    assert m.pre_rescaling_inv is np.log


def test_post_rescaling_with_functions():
    m = PrePostRescalingMixin()
    m.configure_post_rescaling((np.exp, np.log))
    assert m.has_post_rescaling is True
    assert m.post_rescaling is np.exp
    assert m.post_rescaling_inv is np.log


@pytest.mark.parametrize("rescaling", ["logit", "inv_gaussian_cdf"])
def test_pre_rescaling_with_str(rescaling):
    m = PrePostRescalingMixin()
    m.configure_pre_rescaling(rescaling)
    assert m.has_pre_rescaling is True
    assert m.pre_rescaling is rescaling_functions[rescaling][0]
    assert m.pre_rescaling_inv is rescaling_functions[rescaling][1]


@pytest.mark.parametrize("rescaling", ["log", "logit"])
def test_post_rescaling_with_str(rescaling):
    m = PrePostRescalingMixin()
    m.configure_post_rescaling(rescaling)
    assert m.has_post_rescaling is True
    assert m.post_rescaling is rescaling_functions[rescaling][0]
    assert m.post_rescaling_inv is rescaling_functions[rescaling][1]


@pytest.mark.parametrize(
    "method", ["configure_pre_rescaling", "configure_post_rescaling"]
)
def test_rescaling_with_invalid_str(method):
    m = PrePostRescalingMixin()
    with pytest.raises(
        RuntimeError, match="Unknown rescaling function: not_a_rescaling"
    ):
        getattr(m, method)("not_a_rescaling")


def test_pre_rescaling_invalid_input():
    m = PrePostRescalingMixin()
    with pytest.raises(
        RuntimeError, match="Pre-rescaling must be a str or tuple"
    ):
        m.configure_pre_rescaling((np.exp,))


def test_post_rescaling_invalid_input():
    m = PrePostRescalingMixin()
    with pytest.raises(
        RuntimeError, match="Post-rescaling must be a str or tuple"
    ):
        m.configure_post_rescaling((np.exp,))
