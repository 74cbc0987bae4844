"""Tests for the evidence integrators."""

import numpy as np
import pytest
from scipy.special import logsumexp

from nessai_tpu.evidence import (
    _INSIntegralState,
    _NSIntegralState,
    log_integrate_log_trap,
    logsubexp,
)


def test_logsubexp():
    assert np.isclose(logsubexp(np.log(5), np.log(3)), np.log(2))
    with pytest.raises(RuntimeError):
        logsubexp(np.log(2), np.log(3))


def test_log_integrate_log_trap_constant():
    # integral of f(x)=c over [0,1] = c
    log_support = np.log(np.linspace(1e-10, 1, 100))[::-1].copy()
    log_func = np.zeros(100)
    result = log_integrate_log_trap(log_func, log_support)
    assert np.isclose(result, 0.0, atol=1e-4)


def test_ns_integral_state_uniform():
    """With constant likelihood L, Z should equal L."""
    nlive = 100
    state = _NSIntegralState(nlive)
    for _ in range(500):
        state.increment(np.log(7.0) + 1e-12 * np.random.rand())
    state.finalise()
    # Z ~= L * (1 - X_final); X_final = e^-5, plus trapezoid start error
    assert np.isclose(state.logZ, np.log(7.0), atol=0.02)


def test_ns_integral_state_shrinkage():
    state = _NSIntegralState(100)
    state.increment(0.0)
    assert np.isclose(state.logw, -1 / 100)
    state.increment(0.1)
    assert np.isclose(state.logw, -2 / 100)


def test_ns_posterior_weights_sum_to_one():
    rng = np.random.default_rng(0)
    state = _NSIntegralState(50)
    logls = np.sort(rng.normal(size=200))
    for ll in logls:
        state.increment(ll)
    state.finalise()
    log_w = state.log_posterior_weights()
    # reference-exact weights (rectangle widths over trapezoid logZ):
    # must agree with the standalone posterior.compute_weights given the
    # same constant-nlive history, and be normalised up to the
    # trapezoid/rectangle mismatch
    from nessai_tpu.posterior import compute_weights

    log_z, log_w_ref = compute_weights(logls, np.full(len(logls), 50.0))
    assert np.isclose(log_z, state.logZ, atol=1e-10)
    np.testing.assert_allclose(log_w, log_w_ref, atol=1e-10)
    assert np.isclose(logsumexp(log_w), 0.0, atol=0.5)


def test_ins_integral_state():
    from nessai_tpu import config
    from nessai_tpu.livepoint import (
        add_extra_parameters_to_live_points,
        numpy_array_to_live_points,
    )

    add_extra_parameters_to_live_points(["logW", "logQ", "logU"])
    rng = np.random.default_rng(1)
    n = 1000
    x = numpy_array_to_live_points(rng.uniform(size=(n, 2)), ["a", "b"])
    # uniform samples on the unit square, likelihood = 2D gaussian pdf
    x["logL"] = (
        -0.5 * (x["a"] ** 2 + x["b"] ** 2) - np.log(2 * np.pi)
    )
    x["logW"] = 0.0
    state = _INSIntegralState()
    state.update_evidence(x)
    # Z = integral of L over unit square ~ 0.116
    expected = np.log(0.1165)
    assert abs(state.log_evidence - expected) < 0.1
    assert state.log_evidence_error < 0.1
    assert state.effective_n_posterior_samples > 100
    config.livepoints.reset()


def test_ins_evidence_ratio():
    from nessai_tpu import config
    from nessai_tpu.livepoint import (
        add_extra_parameters_to_live_points,
        numpy_array_to_live_points,
    )

    add_extra_parameters_to_live_points(["logW", "logQ", "logU"])
    x = numpy_array_to_live_points(np.random.rand(100, 2), ["a", "b"])
    x["logL"] = 1.0
    x["logW"] = 0.0
    live = numpy_array_to_live_points(np.random.rand(50, 2), ["a", "b"])
    live["logL"] = 1.0
    live["logW"] = 0.0
    state = _INSIntegralState()
    state.update_evidence(x, live)
    # per-part evidences are normalised by their own counts (reference
    # semantics): identical weights => both ratios are zero
    assert np.isclose(state.log_evidence_ratio, 0.0)
    assert np.isclose(state.log_evidence_ratio_nested_samples, 0.0)
    # boost the live-point weights: ratios become positive
    live["logW"] = 1.0
    state.update_evidence(x, live)
    assert state.log_evidence_ratio > 0
    assert state.log_evidence_ratio_nested_samples > state.log_evidence_ratio
    # difference_log_evidence tracks the update
    assert state.difference_log_evidence > 0
    assert np.isfinite(state.fractional_error)
    config.livepoints.reset()


def test_shrinkage_expectation_t_vs_logt():
    """'t' uses <t> = N/(N+1), 'logt' uses <log t> = -1/N (reference
    evidence.py:160-171); both must be accepted and differ slightly."""
    import numpy as np

    from nessai_tpu.evidence import _NSIntegralState

    s_logt = _NSIntegralState(100, expectation="logt")
    s_t = _NSIntegralState(100, expectation="t")
    rng = np.random.default_rng(1)
    logls = np.sort(rng.normal(size=50))
    for ll in logls:
        s_logt.increment(ll)
        s_t.increment(ll)
    assert s_logt.logZ != s_t.logZ
    np.testing.assert_allclose(s_logt.logZ, s_t.logZ, atol=0.05)
    # log_vols shrink faster with logt (-1/N < -log1p(1/N))
    assert s_logt.log_vols[-1] < s_t.log_vols[-1]
    with pytest.raises(ValueError, match="Expectation"):
        _NSIntegralState(100, expectation="bad")


def test_sampler_threads_shrinkage_expectation(model, tmp_path):
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    ns = NestedSampler(
        model, nlive=50, output=str(tmp_path), seed=1, plot=False
    )
    assert ns.state.expectation == "logt"  # reference default
    ns2 = NestedSampler(
        model,
        nlive=50,
        output=str(tmp_path),
        seed=1,
        plot=False,
        shrinkage_expectation="t",
    )
    assert ns2.state.expectation == "t"
