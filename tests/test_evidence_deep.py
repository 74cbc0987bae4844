"""Deep coverage for the evidence integrators and livepoint codec
branches. Reference: ``nessai/evidence.py`` tests and
``tests/test_livepoint.py``."""

import numpy as np
import pytest
from scipy.special import logsumexp

from nessai_tpu.evidence import (
    _INSIntegralState,
    _NSIntegralState,
    log_evidence_from_ins_samples,
    log_integrate_log_trap,
    logsubexp,
)
from nessai_tpu import config
from nessai_tpu.livepoint import (
    add_extra_parameters_to_live_points,
    empty_structured_array,
    get_dtype,
    live_points_to_array,
    numpy_array_to_live_points,
    parameters_to_live_point,
)


@pytest.fixture()
def ins_fields():
    add_extra_parameters_to_live_points(["logW", "logQ", "logU"])
    yield
    config.livepoints.reset()


def test_logsubexp_error():
    with pytest.raises(RuntimeError, match="negative"):
        logsubexp(np.array([0.0]), np.array([1.0]))


def test_log_integrate_log_trap_constant():
    # integral of f=1 over [0, 1] = 1
    log_f = np.zeros(2)
    log_x = np.array([0.0, -np.inf])
    assert np.isclose(log_integrate_log_trap(log_f, log_x), 0.0)


def test_ns_state_increment_and_gradients():
    state = _NSIntegralState(100, track_gradients=True)
    for ll in np.linspace(-10, -1, 50):
        state.increment(ll)
    assert len(state.logLs) == 51
    assert len(state.gradients) == 51
    assert state.log_evidence < 0
    assert state.log_evidence_error > 0
    # log volumes shrink by -1/nlive per iteration
    np.testing.assert_allclose(np.diff(state.log_vols), -1.0 / 100)


def test_ns_state_variable_nlive():
    state = _NSIntegralState(100)
    state.increment(-5.0, nlive=50)
    assert np.isclose(state.log_vols[-1], -1.0 / 50)


def test_ns_state_non_monotonic_warning(caplog):
    state = _NSIntegralState(10)
    state.increment(-1.0)
    with caplog.at_level("WARNING"):
        state.increment(-2.0)
    assert "non-monotonic" in caplog.text


def test_ns_state_finalise_exceeds_running():
    """Finalise adds the X=0 closing term, so logZ can only increase
    relative to the truncated rectangle estimate for increasing L."""
    state = _NSIntegralState(50)
    rng = np.random.default_rng(0)
    for ll in np.sort(rng.normal(size=300)):
        state.increment(ll)
    running = state.logZ
    final = state.finalise()
    assert np.isfinite(final)
    assert abs(final - running) < 0.5


def test_ns_state_reset():
    state = _NSIntegralState(50)
    state.increment(-1.0)
    state.reset()
    assert state.logZ == -np.inf
    assert state.logLs == [-np.inf]


def test_ins_state_empty():
    s = _INSIntegralState()
    assert s.n == 0
    assert s.log_evidence == -np.inf
    assert s.compute_uncertainty() == np.inf


def test_ins_state_nested_and_live_parts(rng, ins_fields):
    s = _INSIntegralState()
    ns = empty_structured_array(100, names=["x"])
    ns["logL"] = rng.normal(size=100)
    ns["logW"] = -np.log(100) * np.ones(100)
    live = empty_structured_array(50, names=["x"])
    live["logL"] = rng.normal(size=50)
    live["logW"] = -np.log(50) * np.ones(50)
    s.update_evidence(ns, live)
    assert s.n == 150
    # total is the weighted combination of the parts
    all_w = np.concatenate(
        [ns["logL"] + ns["logW"], live["logL"] + live["logW"]]
    )
    expected = logsumexp(all_w) - np.log(150)
    assert np.isclose(s.log_evidence, expected, atol=1e-10)
    assert np.isfinite(s.log_evidence_nested_samples)
    assert np.isfinite(s.log_evidence_live_points)
    # ratio consistency
    assert np.isclose(
        s.log_evidence_ratio,
        s.log_evidence_live_points - s.log_evidence,
    )
    assert s.effective_n_posterior_samples > 0
    assert s.fractional_error > 0


def test_ins_state_previous_logz_tracking(rng, ins_fields):
    s = _INSIntegralState()
    ns = empty_structured_array(50, names=["x"])
    ns["logL"] = rng.normal(size=50)
    ns["logW"] = 0.0
    s.update_evidence(ns)
    first = s.log_evidence
    ns2 = empty_structured_array(100, names=["x"])
    ns2["logL"] = rng.normal(size=100) + 1.0
    ns2["logW"] = 0.0
    s.update_evidence(ns2)
    assert np.isclose(
        s.difference_log_evidence, abs(s.log_evidence - first)
    )


def test_log_evidence_from_ins_samples(rng, ins_fields):
    samples = empty_structured_array(1000, names=["x"])
    samples["logL"] = -0.5 * rng.normal(size=1000) ** 2
    samples["logW"] = 0.0
    out = log_evidence_from_ins_samples(samples)
    direct = logsumexp(samples["logL"]) - np.log(1000)
    assert np.isclose(out, direct)


# ----------------------------------------------------------------------
# livepoint codec extras
# ----------------------------------------------------------------------
def test_get_dtype_fields():
    dt = get_dtype(["a", "b"])
    names = dt.names
    assert "a" in names and "b" in names
    assert "logL" in names and "logP" in names
    assert "it" in names


def test_empty_structured_array_defaults():
    x = empty_structured_array(4, names=["a"])
    assert np.isnan(x["a"]).all()
    assert np.isnan(x["logL"]).all()
    assert (x["it"] == 0).all()


def test_array_roundtrip_order_preserved():
    arr = np.arange(12, dtype=float).reshape(4, 3)
    lp = numpy_array_to_live_points(arr, ["c", "a", "b"])
    back = live_points_to_array(lp, ["c", "a", "b"])
    np.testing.assert_array_equal(back, arr)
    # subset/reorder
    sub = live_points_to_array(lp, ["b", "c"])
    np.testing.assert_array_equal(sub[:, 0], arr[:, 2])


def test_parameters_to_live_point():
    lp = parameters_to_live_point([1.0, 2.0], ["a", "b"])
    assert lp["a"] == 1.0
    assert lp["b"] == 2.0


def test_empty_input_array():
    lp = numpy_array_to_live_points(np.empty((0, 2)), ["a", "b"])
    assert lp.size == 0
