"""Tests for posterior weight computation and sample drawing."""

import numpy as np
from scipy.special import logsumexp

from nessai_tpu.livepoint import numpy_array_to_live_points
from nessai_tpu.posterior import compute_weights, draw_posterior_samples


def _fake_chain(rng, n=500, nlive=100):
    # increasing logL chain, like NS output
    logls = np.sort(rng.normal(size=n))
    x = numpy_array_to_live_points(rng.normal(size=(n, 2)), ["a", "b"])
    x["logL"] = logls
    return x


def test_compute_weights_normalised(rng):
    x = _fake_chain(rng)
    log_z, log_w = compute_weights(x["logL"], 100)
    assert np.isfinite(log_z)
    # reference-exact: normalised by the trapezoid logZ, so the rectangle
    # weights sum to 1 only up to O(1/nlive)
    assert np.isclose(logsumexp(log_w), 0.0, atol=0.02)


def test_compute_weights_variable_nlive(rng):
    x = _fake_chain(rng, n=200)
    nlive = np.concatenate([np.full(100, 100.0), np.arange(100, 0, -1)])
    log_z, log_w = compute_weights(x["logL"], nlive)
    assert np.isfinite(log_z)
    assert len(log_w) == 200


def test_draw_posterior_rejection(rng):
    x = _fake_chain(rng)
    post = draw_posterior_samples(x, nlive=100, rng=rng)
    assert 0 < len(post) <= len(x)


def test_draw_posterior_importance(rng):
    x = _fake_chain(rng)
    post = draw_posterior_samples(
        x, nlive=100, method="importance_sampling", n=200, rng=rng
    )
    assert len(post) == 200


def test_draw_posterior_indices(rng):
    x = _fake_chain(rng)
    post, idx = draw_posterior_samples(
        x, nlive=100, return_indices=True, rng=rng
    )
    np.testing.assert_array_equal(x[idx]["logL"], post["logL"])
