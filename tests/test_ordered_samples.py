"""Unit tests for OrderedSamples + INS threshold machinery."""

import numpy as np
import pytest

from nessai_tpu import config
from nessai_tpu.livepoint import (
    add_extra_parameters_to_live_points,
    numpy_array_to_live_points,
)
from nessai_tpu.samplers.importancesampler import OrderedSamples


@pytest.fixture(autouse=True)
def ins_fields():
    add_extra_parameters_to_live_points(["logW", "logQ", "logU"])
    yield
    config.livepoints.reset()


def make_samples(rng, n=20, it=-1):
    x = numpy_array_to_live_points(rng.uniform(size=(n, 2)), ["a", "b"])
    x["logL"] = rng.normal(size=n)
    x["logW"] = 0.0
    x["it"] = it
    return x


def test_initial_samples_sorted(rng):
    os_ = OrderedSamples()
    x = make_samples(rng)
    os_.add_initial_samples(x, np.zeros((len(x), 1)))
    assert np.all(np.diff(os_.samples["logL"]) >= 0)
    assert len(os_.live_points) == len(x)
    assert len(os_.nested_samples) == 0


def test_remove_samples_moves_to_nested(rng):
    os_ = OrderedSamples()
    x = make_samples(rng)
    os_.add_initial_samples(x, np.zeros((len(x), 1)))
    threshold = float(np.median(os_.samples["logL"]))
    os_.update_log_likelihood_threshold(threshold)
    n = os_.remove_samples()
    assert n == int(np.sum(x["logL"] < threshold))
    assert np.all(os_.nested_samples["logL"] < threshold)
    assert np.all(os_.live_points["logL"] >= threshold)


def test_add_samples_merges_sorted(rng):
    os_ = OrderedSamples()
    x = make_samples(rng)
    os_.add_initial_samples(x, np.zeros((len(x), 1)))
    new = make_samples(rng, n=10, it=0)
    os_.add_samples(new, np.zeros((10, 1)))
    assert len(os_.samples) == 30
    assert np.all(np.diff(os_.samples["logL"]) >= 0)
    # non-strict: all new samples are live
    assert len(os_.live_points) == 30


def test_add_samples_strict_threshold(rng):
    os_ = OrderedSamples(strict_threshold=True)
    x = make_samples(rng)
    os_.add_initial_samples(x, np.zeros((len(x), 1)))
    threshold = float(np.median(os_.samples["logL"]))
    os_.update_log_likelihood_threshold(threshold)
    os_.remove_samples()
    new = make_samples(rng, n=10, it=0)
    os_.add_samples(new, np.zeros((10, 1)))
    below = int(np.sum(new["logL"] < threshold))
    assert len(os_.nested_samples) == int(np.sum(x["logL"] < threshold)) + below


def test_finalise_consumes_all(rng):
    os_ = OrderedSamples()
    x = make_samples(rng)
    x["logL"] = np.abs(x["logL"])
    os_.add_initial_samples(x, np.zeros((len(x), 1)))
    os_.finalise()
    # reference contract: live points are None once finalised
    # (importancesampler.py:72-83) and every sample is nested
    assert os_.live_points is None
    assert len(os_.nested_samples) == len(x)
    assert np.isfinite(os_.state.log_evidence)


def test_live_points_setter_contract(rng):
    """Setting live_points only accepts None (reference
    ``importancesampler.py:79-83``); adding samples revives them."""
    os_ = OrderedSamples()
    x = make_samples(rng)
    os_.add_initial_samples(x, np.zeros((len(x), 1)))
    with pytest.raises(ValueError, match="None"):
        os_.live_points = x
    os_.live_points = None
    assert os_.live_points is None
    assert len(os_.nested_samples) == len(x)
    more = make_samples(rng)
    os_.add_samples(more, np.zeros((len(more), 1)))
    assert os_.live_points is not None
    assert len(os_.live_points) == len(more)


def test_compute_importance(rng):
    os_ = OrderedSamples()
    x = make_samples(rng, it=-1)
    x["it"][:10] = 0
    os_.add_initial_samples(x, np.zeros((len(x), 1)))
    imp = os_.compute_importance()
    assert set(imp) == {-1, 0}
    assert all(v >= 0 for v in imp.values())


def test_threshold_entropy_and_quantile(model, tmp_path, rng, flow_config, training_config):
    from nessai_tpu.samplers.importancesampler import ImportanceNestedSampler

    ins = ImportanceNestedSampler(
        model,
        nlive=100,
        min_samples=20,
        output=str(tmp_path),
        seed=3,
        plot=False,
        checkpointing=False,
        flow_config=flow_config,
        training_config=training_config,
        draw_iid_live=False,
    )
    ins.populate_live_points()
    lp = ins.live_points_unit
    t_e = ins.determine_log_likelihood_threshold(lp, method="entropy", q=0.5)
    t_q = ins.determine_log_likelihood_threshold(lp, method="quantile", q=0.8)
    assert np.isfinite(t_e)
    assert np.isfinite(t_q)
    assert t_q >= lp["logL"].min()
    with pytest.raises(ValueError):
        ins.determine_log_likelihood_threshold(lp, method="bogus")
