"""Tests for posterior weight computation and sample drawing."""

import numpy as np
import pytest
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


class TestRound3PosteriorBranches:
    def test_compute_weights_nlive_array_and_t_expectation(self, rng):
        from nessai_tpu.posterior import compute_weights

        logl = np.sort(rng.normal(size=50))
        # int nlive consumes the final live points one by one; the
        # equivalent explicit array must include that decreasing tail
        nlive = np.full(50, 25.0)
        nlive[-25:] = np.arange(25, 0, -1)
        lv1, lw1 = compute_weights(logl, nlive)
        lv2, lw2 = compute_weights(logl, 25)
        np.testing.assert_allclose(lw1, lw2, atol=1e-12)
        lv3, lw3 = compute_weights(logl, 25, expectation="t")
        assert not np.allclose(lw2, lw3)
        with pytest.raises(
            ValueError, match="nlive and samples are different lengths"
        ):
            compute_weights(logl, np.full(10, 25.0))
        with pytest.raises(ValueError, match="Expectation must be t or logt"):
            compute_weights(logl, 25, expectation="bad")

    def test_draw_posterior_rejection_n_ignored(self, rng, caplog):
        # reference-exact: n cannot be specified with rejection sampling;
        # a warning is logged and n is ignored
        import logging

        from nessai_tpu.livepoint import empty_structured_array
        from nessai_tpu.posterior import draw_posterior_samples

        ns = empty_structured_array(200, names=["x"])
        ns["x"] = np.linspace(0, 1, 200)
        ns["logL"] = np.sort(rng.normal(size=200))
        with caplog.at_level(logging.WARNING, logger="nessai_tpu"):
            out = draw_posterior_samples(
                ns, nlive=50, n=5, method="rejection_sampling", rng=rng
            )
        assert "cannot be specified" in caplog.text
        assert len(out) > 0

    def test_draw_posterior_unknown_method(self, rng):
        from nessai_tpu.livepoint import empty_structured_array
        from nessai_tpu.posterior import draw_posterior_samples

        ns = empty_structured_array(20, names=["x"])
        ns["logL"] = np.sort(rng.normal(size=20))
        with pytest.raises(ValueError, match="method"):
            draw_posterior_samples(
                ns, nlive=10, method="not-a-method", rng=rng
            )
