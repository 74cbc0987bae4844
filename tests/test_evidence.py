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


def test_simulate_log_evidence_analytic():
    """Simulated-volume logZ draws: mean matches the deterministic
    integral and the spread matches sqrt(H/nlive) on a well-behaved
    (exponential-shell) likelihood."""
    nlive = 100
    sigma2 = 0.01
    state = _NSIntegralState(nlive)
    # logL(X) = -X / (2 sigma^2): Z = 2 sigma^2 (1 - exp(-1/(2 sigma^2)))
    for k in range(1, 1401):
        x_k = np.exp(-k / nlive)
        state.increment(-x_k / (2 * sigma2))
    state.finalise()
    truth = np.log(2 * sigma2 * (1 - np.exp(-1 / (2 * sigma2))))
    assert abs(state.logZ - truth) < 3 * state.log_evidence_error

    rng = np.random.default_rng(42)
    draws = state.simulate_log_evidence(500, rng=rng)
    assert draws.shape == (500,)
    assert np.all(np.isfinite(draws))
    # unbiased vs the deterministic value
    assert abs(np.mean(draws) - state.logZ) < 5 * np.std(draws) / np.sqrt(500)
    # spread consistent with the first-order Skilling estimate
    det_err = state.log_evidence_error
    sim_err = np.std(draws)
    assert 0.6 * det_err < sim_err < 1.7 * det_err
    # the deterministic state is untouched
    assert state.log_evidence_error_simulated(200, rng=rng) > 0
    assert np.isclose(state.logZ, truth, atol=3 * det_err)


def test_simulate_log_evidence_rng_deterministic():
    state = _NSIntegralState(50)
    for k in range(1, 200):
        state.increment(-np.exp(-k / 50) * 10)
    a = state.simulate_log_evidence(64, rng=np.random.default_rng(7))
    b = state.simulate_log_evidence(64, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)


def test_simulate_log_evidence_empty_state():
    state = _NSIntegralState(100)
    draws = state.simulate_log_evidence(10, rng=np.random.default_rng(0))
    assert draws.shape == (10,)
    assert np.all(draws == -np.inf)


def test_nlive_schedule_tracks_finalise_tail():
    """The schedule records the decreasing finalise nlive and the
    simulation consumes it."""
    state = _NSIntegralState(10)
    for k in range(1, 30):
        state.increment(-np.exp(-k / 10) * 5)
    # finalise-style tail with decreasing nlive
    for i in range(10):
        state.increment(-np.exp(-3.0) * 5 + 0.01 * i, nlive=10 - i)
    sched = state._nlive_schedule()
    assert len(sched) == len(state.logLs) - 1
    assert sched[-1] == 1 and sched[-10] == 10 and sched[0] == 10
    draws = state.simulate_log_evidence(32, rng=np.random.default_rng(1))
    assert np.all(np.isfinite(draws))


def test_nlive_schedule_pre043_pickle_padding():
    """States resumed from pickles that predate the nlives attribute
    pad the head of the schedule with base_nlive (exact: only the
    finalise tail deviates) and keep incrementing."""
    state = _NSIntegralState(20)
    for k in range(1, 11):
        state.increment(-float(np.exp(-k / 20)))
    del state.nlives  # simulate the old pickle layout
    state.increment(-0.1)  # re-creates the list
    assert state.nlives == [20]
    sched = state._nlive_schedule()
    assert len(sched) == 11
    assert np.all(sched == 20)
    draws = state.simulate_log_evidence(16, rng=np.random.default_rng(3))
    assert np.all(np.isfinite(draws))


def test_sampler_simulate_evidence_uncertainty(model, tmp_path):
    """NestedSampler.simulate_evidence_uncertainty delegates to the
    state with the sampler rng and returns sane draws on a real state."""
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    ns = NestedSampler(
        model, nlive=50, output=str(tmp_path), seed=1, plot=False
    )
    for k in range(1, 150):
        ns.state.increment(-float(np.exp(-k / 50)) * 8)
    draws = ns.simulate_evidence_uncertainty(n_simulations=64)
    assert draws.shape == (64,)
    assert np.all(np.isfinite(draws))
    assert np.std(draws) > 0
    explicit = ns.simulate_evidence_uncertainty(
        n_simulations=64, rng=np.random.default_rng(5)
    )
    again = ns.state.simulate_log_evidence(
        64, rng=np.random.default_rng(5)
    )
    np.testing.assert_array_equal(explicit, again)


def test_simulated_evidence_error_in_result(model, tmp_path):
    """The simulated-volumes logZ error is computed at finalisation by
    default, reported in the result dict, and chunked draws match the
    unchunked formula for the same rng."""
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    ns = NestedSampler(
        model, nlive=50, output=str(tmp_path), seed=1, plot=False
    )
    for k in range(1, 150):
        ns.state.increment(-float(np.exp(-k / 50)) * 8)
    ns.final_p_value = None
    ns.compute_simulated_evidence_error()
    assert ns.log_evidence_error_simulated is not None
    assert ns.log_evidence_error_simulated > 0
    d_key = "log_evidence_error_simulated"
    ns.nested_samples = list(
        np.zeros(3, dtype=[("x", float), ("logL", float), ("it", int)])
    )
    res = ns.get_result_dictionary()
    assert res[d_key] == ns.log_evidence_error_simulated

    # disabled -> stays None
    ns2 = NestedSampler(
        model,
        nlive=50,
        output=str(tmp_path),
        seed=1,
        plot=False,
        simulated_evidence_error=False,
    )
    for k in range(1, 150):
        ns2.state.increment(-float(np.exp(-k / 50)) * 8)
    ns2.compute_simulated_evidence_error()
    assert ns2.log_evidence_error_simulated is None

    # integer knob sets the number of draws
    ns3 = NestedSampler(
        model,
        nlive=50,
        output=str(tmp_path),
        seed=1,
        plot=False,
        simulated_evidence_error=64,
    )
    for k in range(1, 150):
        ns3.state.increment(-float(np.exp(-k / 50)) * 8)
    ns3.compute_simulated_evidence_error()
    assert ns3.log_evidence_error_simulated is not None


def test_simulated_error_lower_bound_warnings(tmp_path, caplog, rng):
    """At dims >= 16 (or failed final KS) the sampler states that BOTH
    error estimates only capture prior-volume statistics — the 8-seed
    16-D study measured simulated/first-order ratios ~0.94-1.05 while
    across-seed scatter exceeded both (VALIDATION.md)."""
    import logging

    from nessai_tpu.samplers.nestedsampler import NestedSampler
    from nessai_tpu.utils.testing import IntegrationTestModel

    model16 = IntegrationTestModel(16)
    model16.set_rng(rng)
    ns = NestedSampler(
        model16, nlive=50, output=str(tmp_path), seed=1, plot=False
    )
    for k in range(1, 150):
        ns.state.increment(-float(np.exp(-k / 50)) * 8)
    ns.final_p_value = None
    with caplog.at_level(logging.WARNING, logger="nessai_tpu"):
        ns.compute_simulated_evidence_error()
    assert any("lower bounds" in r.message for r in caplog.records)
    assert any("dims=16" in r.message for r in caplog.records)

    # low-D run with a failed final KS test also triggers it
    caplog.clear()
    model2 = IntegrationTestModel(2)
    model2.set_rng(rng)
    ns2 = NestedSampler(
        model2, nlive=50, output=str(tmp_path), seed=1, plot=False
    )
    for k in range(1, 150):
        ns2.state.increment(-float(np.exp(-k / 50)) * 8)
    ns2.final_p_value = 0.01
    with caplog.at_level(logging.WARNING, logger="nessai_tpu"):
        ns2.compute_simulated_evidence_error()
    assert any(
        "insertion-index KS test failed" in r.message
        for r in caplog.records
    )

    # low-D, healthy KS: no lower-bound warning
    caplog.clear()
    ns3 = NestedSampler(
        model2, nlive=50, output=str(tmp_path), seed=2, plot=False
    )
    for k in range(1, 150):
        ns3.state.increment(-float(np.exp(-k / 50)) * 8)
    ns3.final_p_value = 0.5
    with caplog.at_level(logging.WARNING, logger="nessai_tpu"):
        ns3.compute_simulated_evidence_error()
    assert not any("lower bounds" in r.message for r in caplog.records)


def test_simulate_log_evidence_chunking_deterministic():
    """Chunked and single-block paths give identical draws for the same
    rng stream (chunk boundaries must not change the exponential
    draw order)."""
    state = _NSIntegralState(10)
    for k in range(1, 60):
        state.increment(-float(np.exp(-k / 10)) * 4)
    a = state.simulate_log_evidence(32, rng=np.random.default_rng(9))
    # force tiny chunks: the rng stream fills row-major so the draws are
    # identical; results match to BLAS reduction-order noise (the
    # per-row trapezoid is a matvec whose blocking depends on the
    # chunk's leading dimension)
    state._sim_chunk_elems = 5 * (len(state.logLs) - 1)
    b = state.simulate_log_evidence(32, rng=np.random.default_rng(9))
    del state._sim_chunk_elems
    # tolerance covers float32-scratch BLAS reduction-order noise (the
    # simulation passes run in f32 since round 5; the draws themselves
    # are identical)
    np.testing.assert_allclose(a, b, rtol=1e-5)
    assert np.std(a) > 0
