"""Reference-parity behaviour tests for ``evidence.py`` and
``posterior.py``.

Mirrors ``/root/reference/tests/test_evidence/`` and
``/root/reference/tests/test_posterior.py``.
"""

import logging

import numpy as np
import pytest
from scipy.special import logsumexp

from nessai_tpu.evidence import (
    _INSIntegralState,
    _NSIntegralState,
    log_evidence_from_ins_samples,
    logsubexp,
)
from nessai_tpu.livepoint import numpy_array_to_live_points
from nessai_tpu.posterior import compute_weights, draw_posterior_samples

NLIVE = 100

RESAMPLING_METHODS = [
    "rejection_sampling",
    "importance_sampling",
    "multinomial_resampling",
]


# ----------------------------------------------------------------------
# standard NS evidence state
# ----------------------------------------------------------------------
def test_logsubexp_negative():
    with pytest.raises(Exception):
        logsubexp(1, 2)


def test_invalid_expectation():
    with pytest.raises(
        ValueError, match=r"Expectation must be t or logt, got: a"
    ):
        _NSIntegralState(100, expectation="a")


@pytest.mark.parametrize("expectation", ["logt", "t"])
def test_increment_targets(expectation):
    state = _NSIntegralState(NLIVE, expectation=expectation)
    state.increment(-10)
    if expectation == "logt":
        target = -1 / NLIVE
    else:
        target = -np.log1p(1 / NLIVE)
    assert state.logw == target
    assert state.logZ != -np.inf
    np.testing.assert_equal(state.logLs, [-np.inf, -10])


def test_increment_monotonic_warning(caplog):
    state = _NSIntegralState(10)
    state.increment(1.0)
    state.increment(3.0)
    with caplog.at_level(logging.WARNING, logger="nessai_tpu"):
        state.increment(2.5)
    assert "non-monotonic logL" in caplog.text


def test_log_evidence_error_uses_last_info():
    state = _NSIntegralState(NLIVE)
    state.info = [1, 5, 10]
    assert state.log_evidence_error == np.sqrt(10 / NLIVE)


@pytest.mark.parametrize("nlive", [10, 20])
@pytest.mark.parametrize("expectation", ["t", "logt"])
def test_get_logx_live_points_values(nlive, expectation):
    nit = 100
    state = _NSIntegralState(nlive, expectation=expectation)
    nlive_per_iteration = np.arange(nlive, 0, -1, dtype=float)
    if expectation == "logt":
        logt = -1.0 / nlive
        logt_final = -1.0 / nlive_per_iteration
    else:
        logt = -np.log1p(1.0 / nlive)
        logt_final = -np.log1p(1.0 / nlive_per_iteration)
    state.logw = nit * logt
    expected = nit * logt + np.cumsum(logt_final)
    np.testing.assert_allclose(
        state.get_logx_live_points(nlive), expected, rtol=1e-12
    )


def test_finalise_changes_logz():
    state = _NSIntegralState(NLIVE)
    state.increment(-10)
    pre = state.logZ
    state.finalise()
    assert state.logZ != -np.inf
    assert pre != state.logZ


def test_info_increases():
    state = _NSIntegralState(NLIVE)
    state.increment(-10)
    assert state.info[-1] == 0.0
    state.increment(-5)
    assert state.info[-1] > 0


def test_track_gradients_disabled():
    state = _NSIntegralState(NLIVE, track_gradients=False)
    state.increment(-10)
    state.increment(-5)
    assert len(state.gradients) == 1


@pytest.mark.parametrize(
    "expectation, value", [("logt", -1 / 50), ("t", -np.log1p(1 / 50))]
)
def test_variable_nlive(expectation, value):
    state = _NSIntegralState(NLIVE, expectation=expectation)
    state.increment(-10, nlive=50)
    assert state.logw == value


def test_state_plot():
    state = _NSIntegralState(NLIVE)
    state.increment(-10)
    state.increment(-5)
    fig = state.plot()
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_state_plot_with_filename(tmp_path):
    state = _NSIntegralState(NLIVE)
    state.increment(-10)
    state.increment(-5)
    out = state.plot(filename=str(tmp_path / "logx.png"))
    assert out is None


def test_log_posterior_weights_length():
    state = _NSIntegralState(NLIVE)
    for logl in [-10.0, -5.0, -2.0]:
        state.increment(logl)
    log_w = state.log_posterior_weights()
    assert len(log_w) == 3
    assert np.all(np.isfinite(log_w))


# ----------------------------------------------------------------------
# INS evidence state
# ----------------------------------------------------------------------
def _ins_samples(rng, n):
    x = numpy_array_to_live_points(rng.standard_normal((n, 2)), ["x", "y"])
    import numpy.lib.recfunctions as rfn

    x = rfn.append_fields(
        x,
        ["logW", "logQ"],
        [rng.standard_normal(n), rng.standard_normal(n)],
        usemask=False,
    )
    x["logL"] = rng.standard_normal(n)
    return x


def test_ins_update_evidence_ns_only(rng):
    state = _INSIntegralState()
    ns = _ins_samples(rng, 4)
    expected = logsumexp(ns["logL"] + ns["logW"]) - np.log(4)
    state.update_evidence(ns, live_points=None)
    np.testing.assert_allclose(state.log_evidence, expected, rtol=1e-12)
    assert state.n == 4
    with pytest.raises(RuntimeError, match="Live points are not set"):
        state.log_evidence_live_points


def test_ins_update_evidence_both(rng):
    state = _INSIntegralState()
    ns = _ins_samples(rng, 4)
    lp = _ins_samples(rng, 2)
    x = np.concatenate([ns, lp])
    expected = logsumexp(x["logL"] + x["logW"]) - np.log(6)
    state.update_evidence(ns, live_points=lp)
    np.testing.assert_allclose(state.log_evidence, expected, rtol=1e-12)
    assert state.n == 6
    assert np.isfinite(state.log_evidence_live_points)


def test_ins_evidence_linear(rng):
    state = _INSIntegralState()
    state.update_evidence(_ins_samples(rng, 8))
    np.testing.assert_allclose(
        state.evidence, np.exp(state.log_evidence), rtol=1e-12
    )


def test_ins_fractional_error(rng):
    state = _INSIntegralState()
    state.update_evidence(_ins_samples(rng, 16))
    np.testing.assert_allclose(
        state.fractional_error,
        state.evidence_error / state.evidence,
        rtol=1e-10,
    )


def test_ins_difference_log_evidence(rng):
    state = _INSIntegralState()
    state.update_evidence(_ins_samples(rng, 8))
    first = state.log_evidence
    state.update_evidence(_ins_samples(rng, 8))
    np.testing.assert_allclose(
        state.difference_log_evidence,
        abs(state.log_evidence - first),
        rtol=1e-12,
    )


def test_ins_compute_log_evidence_ratio(rng):
    state = _INSIntegralState()
    ns = _ins_samples(rng, 8)
    lp = _ins_samples(rng, 4)
    state.update_evidence(ns, live_points=lp)
    np.testing.assert_allclose(
        state.compute_log_evidence_ratio(ns_only=True),
        state.log_evidence_live_points - state.log_evidence_nested_samples,
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        state.compute_log_evidence_ratio(ns_only=False),
        state.log_evidence_live_points - state.log_evidence,
        rtol=1e-12,
    )


def test_ins_compute_uncertainty_log_linear_equivalence(rng):
    state = _INSIntegralState()
    state.update_evidence(_ins_samples(rng, 32))
    out_ln = state.compute_uncertainty(log_evidence=True)
    out = state.compute_uncertainty(log_evidence=False)
    np.testing.assert_allclose(
        out_ln, out / np.exp(state.logZ), rtol=1e-8
    )


def test_log_evidence_from_ins_samples(rng):
    n = 10
    log_l = np.log(rng.random(n))
    log_w = np.log(rng.random(n))
    samples = np.array(
        [*zip(log_l, log_w)], dtype=[("logL", "f8"), ("logW", "f8")]
    )
    expected = np.log(np.mean(np.exp(log_l + log_w)))
    np.testing.assert_almost_equal(
        log_evidence_from_ins_samples(samples), expected, decimal=12
    )


# ----------------------------------------------------------------------
# posterior
# ----------------------------------------------------------------------
@pytest.fixture()
def ns(rng):
    x = numpy_array_to_live_points(rng.standard_normal((20, 1)), ["x"])
    x["logL"] = np.log(rng.random(x.size))
    x["logP"] = np.zeros(x.size)
    return x


@pytest.mark.parametrize("nlive", [10, 10 * np.ones(20)])
@pytest.mark.parametrize("expectation", ["logt", "t"])
def test_compute_weights_basic(rng, nlive, expectation):
    log_l = rng.standard_normal(20)
    log_z, log_w = compute_weights(log_l, nlive, expectation=expectation)
    assert len(log_w) == len(log_l)
    assert np.isfinite(log_z)


def test_compute_weights_invalid_nlive():
    with pytest.raises(
        ValueError, match=r"nlive and samples are different lengths"
    ):
        compute_weights([1, 2, 3], [4, 5])


def test_compute_weights_invalid_expectation(rng):
    with pytest.raises(
        ValueError, match=r"Expectation must be t or logt, got: a"
    ):
        compute_weights(rng.standard_normal(10), 10, expectation="a")


@pytest.mark.parametrize("method", RESAMPLING_METHODS)
def test_draw_posterior_samples_methods(ns, method, rng):
    p = draw_posterior_samples(ns, nlive=10, method=method, rng=rng)
    assert np.isin(p, ns).all()


@pytest.mark.parametrize("method", RESAMPLING_METHODS)
def test_draw_posterior_samples_with_weights(ns, method, rng):
    log_w = np.log(rng.random(len(ns)))
    p = draw_posterior_samples(ns, log_w=log_w, method=method, rng=rng)
    assert len(p) > 0


@pytest.mark.parametrize("method", RESAMPLING_METHODS)
def test_draw_posterior_samples_with_n(caplog, ns, method, rng):
    n = 10
    log_w = np.log(rng.random(len(ns)))
    with caplog.at_level(logging.WARNING, logger="nessai_tpu"):
        post = draw_posterior_samples(
            ns, log_w=log_w, method=method, n=n, rng=rng
        )
    if method == "rejection_sampling":
        assert "Number of samples cannot be specified" in caplog.text
    else:
        assert len(post) == n


@pytest.mark.parametrize("method", RESAMPLING_METHODS)
def test_draw_posterior_samples_indices(ns, method, rng):
    from nessai_tpu.utils.testing import assert_structured_arrays_equal

    log_w = np.log(rng.random(len(ns)))
    post, indices = draw_posterior_samples(
        ns, log_w=log_w, method=method, return_indices=True, rng=rng
    )
    assert_structured_arrays_equal(post, ns[indices])


def test_draw_posterior_unknown_method(ns, rng):
    with pytest.raises(ValueError):
        draw_posterior_samples(ns, nlive=10, method="not_a_method", rng=rng)
