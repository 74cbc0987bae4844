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
