"""Reference-parity tests for ``nessai_tpu.flows.utils``.

Mirrors ``/root/reference/tests/test_flows/test_flow_utils.py`` against
this package's API. Torch-specific cases (module reset_parameters,
batch-norm running stats, glasflow dispatch, LU cache) have no analogue
here — weight/permutation resets are covered functionally instead.

Note: unlike the reference, ``configure_model`` defaults ``ftype`` to
``'realnvp'`` when the key is omitted (friendlier superset); the
reference's missing-ftype error is only raised for an explicit
``ftype=None``.
"""

import numpy as np
import pytest
from scipy.special import expit

from nessai_tpu.flows.base import Flow
from nessai_tpu.flows.distributions import (
    MultivariateNormal,
    MultivariateUniform,
    ResampledGaussian,
    StandardNormal,
)
from nessai_tpu.flows.utils import (
    configure_model,
    create_linear_transform,
    create_pre_transform,
    get_base_distribution,
    get_flow_class,
    get_n_neurons,
    get_native_flow_class,
    silu,
)

CONFIG = dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1)


def test_silu(rng):
    x = rng.standard_normal(100).astype(np.float32)
    y = np.asarray(silu(x))
    np.testing.assert_array_almost_equal(y, x * expit(x), decimal=6)


# ----------------------------------------------------------------------
# get_base_distribution
# ----------------------------------------------------------------------
def test_get_base_distribution_none_defaults_standard_normal():
    dist = get_base_distribution(2, None)
    assert isinstance(dist, StandardNormal)


def test_get_base_distribution_class_instance():
    dist = MultivariateNormal(2, var=3.0)
    assert get_base_distribution(2, dist) is dist


def test_get_base_distribution_class():
    dist = get_base_distribution(2, MultivariateNormal, var=2)
    assert isinstance(dist, MultivariateNormal)
    assert dist._var == 2


def test_get_base_distribution_str():
    dist = get_base_distribution(2, "mvn", var=2)
    assert isinstance(dist, MultivariateNormal)
    assert dist._var == 2


def test_get_base_distribution_uniform():
    dist = get_base_distribution(2, "uniform")
    assert isinstance(dist, MultivariateUniform)


def test_get_base_distribution_error():
    with pytest.raises(
        ValueError, match="Unknown distribution: not_a_distribution"
    ):
        get_base_distribution(2, "not_a_distribution")


@pytest.mark.parametrize("name", ["lars", "resampled"])
def test_get_base_distribution_lars(name):
    dist = get_base_distribution(2, name)
    assert isinstance(dist, ResampledGaussian)


# ----------------------------------------------------------------------
# get_n_neurons
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "n_neurons, n_inputs, expected",
    [
        (16, 2, 16),
        ("auto", 2, 4),
        ("double", 2, 4),
        (None, 2, 4),
        ("equal", 2, 2),
        ("half", 4, 2),
        (None, None, 8),
    ],
)
def test_get_n_neurons(n_neurons, n_inputs, expected):
    out = get_n_neurons(n_neurons=n_neurons, n_inputs=n_inputs)
    assert isinstance(out, int)
    assert out == expected


@pytest.mark.parametrize(
    "n_neurons, n_inputs",
    [
        ("auto", None),
        ("half", None),
        ("equal", None),
        ("double", None),
        ("invalid", 4),
    ],
)
def test_get_n_neurons_value_error(n_neurons, n_inputs):
    with pytest.raises(
        ValueError, match="Could not get number of neurons"
    ):
        get_n_neurons(n_neurons=n_neurons, n_inputs=n_inputs)


# ----------------------------------------------------------------------
# flow classes
# ----------------------------------------------------------------------
@pytest.mark.parametrize(
    "name", ["realnvp", "frealnvp", "spline", "nsf", "maf"]
)
def test_get_native_flow_class(name):
    assert callable(get_native_flow_class(name))


def test_get_native_flow_class_error():
    with pytest.raises(ValueError, match=r"Unknown flow: invalid"):
        get_native_flow_class("invalid")


def test_get_flow_class_alias():
    assert get_flow_class("realnvp") is get_native_flow_class("realnvp")


# ----------------------------------------------------------------------
# configure_model
# ----------------------------------------------------------------------
def test_configure_model_basic():
    flow, params, key = configure_model(dict(CONFIG))
    assert isinstance(flow, Flow)
    x = np.zeros((3, 2), np.float32)
    lp = np.asarray(flow.log_prob(params, x))
    assert lp.shape == (3,)


@pytest.mark.parametrize("ftype", ["realnvp", "nsf", "maf"])
def test_configure_model_ftype(ftype):
    cfg = dict(CONFIG)
    cfg["ftype"] = ftype
    flow, params, _ = configure_model(cfg)
    assert isinstance(flow, Flow)


def test_configure_model_flow_class():
    seen = {}

    def builder(dim, n_blocks, n_neurons, n_layers, **kwargs):
        seen.update(
            dim=dim,
            n_blocks=n_blocks,
            n_neurons=n_neurons,
            n_layers=n_layers,
        )
        from nessai_tpu.flows.realnvp import build_realnvp_bijector

        return build_realnvp_bijector(
            dim, n_blocks=n_blocks, n_neurons=n_neurons, n_layers=n_layers
        )

    cfg = dict(CONFIG)
    cfg["flow"] = builder
    flow, params, _ = configure_model(cfg)
    assert seen == dict(dim=2, n_blocks=2, n_neurons=4, n_layers=1)
    assert isinstance(flow, Flow)


@pytest.mark.parametrize("act", ["relu", "tanh", "silu", "swish"])
def test_configure_model_activation_functions(act):
    cfg = dict(CONFIG)
    cfg["activation"] = act
    flow, params, _ = configure_model(cfg)
    x = np.random.default_rng(0).standard_normal((3, 2)).astype(np.float32)
    assert np.isfinite(np.asarray(flow.log_prob(params, x))).all()


def test_configure_model_distribution():
    cfg = dict(CONFIG)
    cfg["distribution"] = "mvn"
    cfg["distribution_kwargs"] = {"var": 4.0}
    flow, params, _ = configure_model(cfg)
    assert isinstance(flow.base, MultivariateNormal)
    assert flow.base._var == 4.0


def test_configure_model_ftype_none_error():
    cfg = dict(CONFIG)
    cfg["ftype"] = None
    with pytest.raises(
        RuntimeError, match="Must specify either 'flow' or 'ftype'."
    ):
        configure_model(cfg)


def test_configure_model_input_type_error():
    cfg = dict(CONFIG)
    cfg["n_inputs"] = "10"
    with pytest.raises(
        TypeError, match=r"Number of inputs \(n_inputs\) must be an int"
    ):
        configure_model(cfg)


def test_configure_model_unknown_activation():
    cfg = dict(CONFIG)
    cfg["activation"] = "test"
    with pytest.raises(ValueError, match="Unknown activation: test"):
        configure_model(cfg)


# ----------------------------------------------------------------------
# linear / pre transforms
# ----------------------------------------------------------------------
@pytest.mark.parametrize("linear_transform", ["lu", "permutation", "svd"])
def test_create_linear_transform(linear_transform):
    assert create_linear_transform(linear_transform, 2) is not None


def test_create_linear_transform_unknown():
    with pytest.raises(
        ValueError, match="Unknown linear transform: not_a_transform"
    ):
        create_linear_transform("not_a_transform", 2)


@pytest.mark.parametrize("pre_transform", ["logit", "batch_norm"])
def test_create_pre_transform(pre_transform):
    assert create_pre_transform(pre_transform, 2) is not None


def test_create_pre_transform_unknown():
    with pytest.raises(
        ValueError, match="Unknown pre-transform: not_a_transform"
    ):
        create_pre_transform("not_a_transform", 2)
