"""Tests for IO helpers, config, and result saving."""

import json
import os
import pickle

import numpy as np
import pytest

from nessai_tpu.utils.io import (
    NessaiJSONEncoder,
    safe_file_dump,
    save_dict_to_hdf5,
    save_to_json,
)


def test_json_encoder_numpy():
    d = {
        "a": np.float64(1.5),
        "b": np.int32(2),
        "c": np.arange(3),
        "d": lambda x: x,
    }
    s = json.dumps(d, cls=NessaiJSONEncoder)
    out = json.loads(s)
    assert out["a"] == 1.5
    assert out["b"] == 2
    assert out["c"] == [0, 1, 2]


def test_safe_file_dump_rotation(tmp_path):
    f = str(tmp_path / "x.pkl")
    safe_file_dump({"v": 1}, f, save_existing=True)
    safe_file_dump({"v": 2}, f, save_existing=True)
    with open(f, "rb") as fh:
        assert pickle.load(fh)["v"] == 2
    with open(f + ".old", "rb") as fh:
        assert pickle.load(fh)["v"] == 1


def test_save_to_json(tmp_path):
    f = str(tmp_path / "d.json")
    save_to_json({"x": np.float32(2.0)}, f)
    assert json.load(open(f))["x"] == 2.0


def test_save_dict_to_hdf5(tmp_path):
    import h5py

    f = str(tmp_path / "d.h5")
    save_dict_to_hdf5(
        {"a": 1, "nested": {"b": np.arange(4), "s": "text", "none": None}},
        f,
    )
    with h5py.File(f) as h:
        assert h["a"][()] == 1
        np.testing.assert_array_equal(h["nested/b"][()], np.arange(4))
        assert h["nested/none"][()] == b"__none__"


def test_settings_get_all_kwargs():
    from nessai_tpu.utils.settings import get_all_kwargs, get_run_kwargs_list

    kwargs = get_all_kwargs()
    assert "nlive" in kwargs
    assert "poolsize" in kwargs
    assert kwargs["nlive"] == 2000
    run_kwargs = get_run_kwargs_list()
    assert "plot" in run_kwargs

    ins_kwargs = get_all_kwargs(importance_nested_sampler=True)
    assert "min_samples" in ins_kwargs


def test_flowsampler_save_results(model, tmp_path, flow_config, training_config):
    from nessai_tpu.flowsampler import FlowSampler

    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=100,
        seed=11,
        resume=False,
        plot=False,
        max_iteration=30,
        maximum_uninformed=10000,
        flow_config=flow_config,
        training_config=training_config,
    )
    fs.run(plot=False, save=False)
    fs.save_results(str(tmp_path / "res"), extension="json")
    out = json.load(open(tmp_path / "res.json"))
    assert "log_evidence" in out
    fs.save_results(str(tmp_path / "res2.hdf5"))
    assert os.path.exists(tmp_path / "res2.hdf5")
    with pytest.raises(RuntimeError):
        fs.save_results(str(tmp_path / "res3"))


def test_config_asdict():
    """Config dataclasses expose asdict() (reference config.py:13-18)."""
    from nessai_tpu import config

    for cfg in (
        config.livepoints,
        config.plotting,
        config.general,
        config.compute,
    ):
        d = cfg.asdict()
        assert isinstance(d, dict) and d


def test_flows_silu():
    import numpy as np

    from nessai_tpu.flows.utils import silu

    x = np.linspace(-3, 3, 7).astype("float32")
    out = np.asarray(silu(x))
    expected = x / (1 + np.exp(-x))
    assert np.allclose(out, expected, atol=1e-6)


def test_flowmodel_get_optimiser():
    from nessai_tpu.flowmodel import FlowModel

    fm = FlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1)
    )
    opt = fm.get_optimiser()
    assert hasattr(opt, "init") and hasattr(opt, "update")
    opt2 = fm.get_optimiser("adamw")
    assert hasattr(opt2, "init")


def test_livepoint_config_reset_properties():
    """Reference test_config.py: cached derived lists recompute after
    reset_properties (``nessai/config.py:46-115``)."""
    import numpy as np

    from nessai_tpu.config import LivepointsConfig

    conf = LivepointsConfig()
    assert conf.core_parameters == ["logP", "logL", "it"]
    assert conf.core_parameters_dtype == ["f8", "f8", "i4"]
    assert conf.core_parameters_defaults == (np.nan, np.nan, 0)
    assert conf.extra_parameters == []
    assert conf.non_sampling_dtype == ["f8", "f8", "i4"]
    assert conf.non_sampling_defaults == (np.nan, np.nan, 0)

    conf.default_float_value = -np.inf
    conf.extra_parameters = ["a"]
    conf.extra_parameters_defaults = (0.0,)
    conf.extra_parameters_dtype = ["f4"]
    # cached values persist until reset_properties
    assert conf.non_sampling_defaults == (np.nan, np.nan, 0)

    conf.reset_properties()
    assert conf.core_parameters_defaults == (-np.inf, -np.inf, 0)
    assert conf.non_sampling_parameters == ["logP", "logL", "it", "a"]
    assert conf.non_sampling_dtype == ["f8", "f8", "i4", "f4"]
    assert conf.non_sampling_defaults == (-np.inf, -np.inf, 0, 0.0)


def test_livepoint_config_reset_clears_extras():
    from nessai_tpu.config import LivepointsConfig

    conf = LivepointsConfig(
        extra_parameters=["a", "b"],
        extra_parameters_dtype=["f4", "i4"],
        extra_parameters_defaults=(0.0, 0),
    )
    assert conf.non_sampling_parameters == ["logP", "logL", "it", "a", "b"]
    conf.reset()
    assert conf.extra_parameters == []
    assert conf.non_sampling_parameters == ["logP", "logL", "it"]


def test_add_extra_parameters_invalidates_cache():
    """add_extra_parameters_to_live_points must refresh the cached
    non_sampling_parameters (reference ``livepoint.py:65``)."""
    from nessai_tpu import config
    from nessai_tpu.livepoint import (
        add_extra_parameters_to_live_points,
        reset_extra_live_points_parameters,
    )

    before = list(config.livepoints.non_sampling_parameters)
    add_extra_parameters_to_live_points(["zzz"])
    assert "zzz" in config.livepoints.non_sampling_parameters
    reset_extra_live_points_parameters()
    assert config.livepoints.non_sampling_parameters == before


def test_rescaled_dims_deprecated(model, flow_config):
    import warnings

    from nessai_tpu.proposal import FlowProposal

    p = FlowProposal(model, flow_config=flow_config, poolsize=10)
    p.prime_parameters = ["x", "y"]
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        import pytest as _pytest

        with _pytest.raises(DeprecationWarning):
            p.rescaled_dims
    assert p.prime_dims == 2


def test_compute_evidence_ratio_deprecated():
    import pytest as _pytest

    from nessai_tpu.evidence import _INSIntegralState

    import numpy as np

    from nessai_tpu.livepoint import numpy_array_to_live_points
    from nessai_tpu.samplers.importancesampler import (
        ImportanceNestedSampler,
    )

    ImportanceNestedSampler.add_fields()
    x = numpy_array_to_live_points(np.zeros((10, 1)), ["x"])
    x["logL"] = np.arange(10.0)
    x["logW"] = -1.0
    state = _INSIntegralState()
    state.update_evidence(x[:5], live_points=x[5:])
    with _pytest.deprecated_call():
        state.compute_evidence_ratio()
