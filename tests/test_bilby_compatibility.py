"""Bilby plugin-compatibility surface.

bilby is not installable in this environment, so this mirrors exactly
what bilby's ``Nessai`` sampler class does with the package (reference
``tests/test_bilby_compatibility.py`` + the bilby plugin contract):
build a scalar-likelihood Model from a parameter dict, introspect the
accepted kwargs via ``utils.settings``, run ``FlowSampler`` and read the
posterior through the livepoint converters.
"""

import os

import numpy as np
import pytest

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.livepoint import (
    dict_to_live_points,
    live_points_to_array,
    live_points_to_dict,
)
from nessai_tpu.model import Model
from nessai_tpu.utils.settings import get_all_kwargs, get_run_kwargs_list


class BilbyStyleModel(Model):
    """What bilby's plugin builds: names/bounds from the prior dict and a
    *scalar* likelihood evaluated via a parameter dictionary."""

    def __init__(self):
        self.names = ["x", "y"]
        self.bounds = {"x": [-5.0, 5.0], "y": [-5.0, 5.0]}

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float64")
        for n in self.names:
            log_p -= np.log(self.bounds[n][1] - self.bounds[n][0])
        return log_p

    def log_likelihood(self, x):
        # scalar, dict-style access, as bilby does
        params = {n: float(x[n]) for n in self.names}
        return -0.5 * (params["x"] ** 2 + params["y"] ** 2) - np.log(
            2 * np.pi
        )


def test_kwargs_introspection_surface():
    """bilby reads the full kwargs dict to expose sampler settings."""
    kwargs = get_all_kwargs()
    for key in (
        "nlive",
        "poolsize",
        "flow_config",
        "reparameterisations",
        "stopping_criterion",
    ):
        assert key in kwargs, key
    ins_kwargs = get_all_kwargs(importance_nested_sampler=True)
    assert "min_samples" in ins_kwargs
    split = get_all_kwargs(split_kwargs=True)
    assert isinstance(split, (tuple, list, dict))


def test_run_kwargs_list_surface():
    run_kwargs = get_run_kwargs_list()
    assert "save" in run_kwargs or "plot" in run_kwargs
    ins_run_kwargs = get_run_kwargs_list(importance_nested_sampler=True)
    assert isinstance(ins_run_kwargs, list)


def test_livepoint_converters_roundtrip():
    d = {"x": np.arange(4.0), "y": np.arange(4.0) * 2}
    lp = dict_to_live_points(d)
    assert lp.size == 4
    arr = live_points_to_array(lp, ["x", "y"])
    np.testing.assert_array_equal(arr[:, 1], d["y"])
    back = live_points_to_dict(lp, names=["x", "y"])
    np.testing.assert_array_equal(back["x"], d["x"])


@pytest.mark.integration_test
def test_bilby_style_run(tmp_path):
    """End-to-end run with a bilby-style scalar likelihood (the reference
    compatibility test's config, capped for CI)."""
    model = BilbyStyleModel()
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        resume=False,
        plot=False,
        seed=1234,
        nlive=100,
        max_iteration=150,
        maximum_uninformed=50,
        poolsize=100,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64, patience=3),
    )
    fs.run(plot=False, save=True)
    assert np.isfinite(fs.logZ)
    # bilby reads the posterior samples and the result file
    assert fs.posterior_samples is not None
    assert len(fs.posterior_samples) > 0
    assert os.path.exists(tmp_path / "result.hdf5") or os.path.exists(
        tmp_path / "result.json"
    )
    # scalar likelihoods run through the non-vectorised path
    assert not model.vectorised_likelihood
