"""Unit tests for nessai_tpu.utils."""

import numpy as np
import pytest
from scipy import stats as scipy_stats

from nessai_tpu.utils import (
    auto_bins,
    compute_indices_ks_test,
    compute_radius,
    effective_sample_size,
    logit,
    rescale_minus_one_to_one,
    rescale_zero_to_one,
    inverse_rescale_minus_one_to_one,
    inverse_rescale_zero_to_one,
    rolling_mean,
    sigmoid,
    weighted_quantile,
    array_split_chunksize,
    get_inverse_indices,
    isfinite_struct,
)
from nessai_tpu.utils.sampling import (
    NDimensionalTruncatedGaussian,
    draw_nsphere,
    draw_truncated_gaussian,
)
from nessai_tpu.utils.rescaling import detect_edge
from nessai_tpu.utils.stats import weighted_quantile


def test_rescale_roundtrip():
    x = np.linspace(-3, 7, 50)
    y, log_j = rescale_zero_to_one(x, -3, 7)
    assert y.min() >= 0 and y.max() <= 1
    x2, log_j_inv = inverse_rescale_zero_to_one(y, -3, 7)
    np.testing.assert_allclose(x, x2, atol=1e-12)
    np.testing.assert_allclose(log_j + log_j_inv, 0, atol=1e-12)

    y, log_j = rescale_minus_one_to_one(x, -3, 7)
    x2, log_j_inv = inverse_rescale_minus_one_to_one(y, -3, 7)
    np.testing.assert_allclose(x, x2, atol=1e-12)
    np.testing.assert_allclose(log_j + log_j_inv, 0, atol=1e-12)


def test_logit_sigmoid_roundtrip():
    x = np.linspace(0.01, 0.99, 20)
    y, log_j = logit(x)
    x2, log_j_inv = sigmoid(y)
    np.testing.assert_allclose(x, x2, atol=1e-10)
    np.testing.assert_allclose(log_j, -log_j_inv, atol=1e-8)


def test_compute_radius_matches_chi():
    assert np.isclose(compute_radius(2, 0.95), scipy_stats.chi.ppf(0.95, 2))


def test_nsphere_radius():
    rng = np.random.default_rng(0)
    x = draw_nsphere(3, r=2.0, N=500, rng=rng)
    assert np.all(np.linalg.norm(x, axis=1) <= 2.0)


def test_truncated_gaussian():
    rng = np.random.default_rng(0)
    x = draw_truncated_gaussian(4, r=2.0, N=300, rng=rng)
    assert x.shape == (300, 4)
    assert np.all(np.linalg.norm(x, axis=1) < 2.0)


def test_ndim_truncated_gaussian_exact():
    rng = np.random.default_rng(1)
    dist = NDimensionalTruncatedGaussian(3, 2.5, rng=rng)
    x = dist.sample(2000)
    r = np.linalg.norm(x, axis=1)
    assert r.max() < 2.5
    # radial CDF should match truncated chi
    from scipy.special import gammainc

    u = gammainc(1.5, r**2 / 2) / gammainc(1.5, 2.5**2 / 2)
    ks = scipy_stats.kstest(u, "uniform")
    assert ks.pvalue > 1e-4


def test_effective_sample_size():
    assert np.isclose(effective_sample_size(np.zeros(100)), 100.0)
    # Half the weight on one point reduces ESS
    lw = np.log(np.array([0.5] + [0.5 / 99] * 99))
    assert effective_sample_size(lw) < 100


def test_rolling_mean_constant():
    x = np.ones(20)
    out = rolling_mean(x, 5)
    assert out.shape == (20,)
    np.testing.assert_allclose(out, 1.0)


def test_weighted_quantile_median():
    rng = np.random.default_rng(2)
    x = rng.normal(size=5000)
    q = weighted_quantile(x, 0.5)
    assert abs(q) < 0.1


def test_ks_test_uniform_indices():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 100, 5000)
    D, p = compute_indices_ks_test(idx, 100)
    assert p > 0.01
    # strongly biased indices should fail
    D2, p2 = compute_indices_ks_test(np.zeros(5000, dtype=int), 100, mode="D-")
    assert p2 < 1e-6


def test_auto_bins():
    rng = np.random.default_rng(4)
    assert 1 <= auto_bins(rng.normal(size=100)) <= 50
    assert auto_bins(np.array([1.0])) == 1
    with pytest.raises(RuntimeError):
        auto_bins(np.array([]))


def test_structures():
    x = np.arange(10)
    chunks = array_split_chunksize(x, 3)
    assert [len(c) for c in chunks] == [3, 3, 3, 1]
    inv = get_inverse_indices(5, np.array([0, 2]))
    np.testing.assert_array_equal(inv, [1, 3, 4])
    with pytest.raises(ValueError, match="out of range"):
        get_inverse_indices(3, np.array([5]))


def test_isfinite_struct():
    from nessai_tpu.livepoint import numpy_array_to_live_points

    x = numpy_array_to_live_points(np.array([[1.0, 2.0], [np.inf, 0.0]]), ["a", "b"])
    out = isfinite_struct(x, ["a", "b"])
    np.testing.assert_array_equal(out, [True, False])


def test_detect_edge_uniform_none():
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, 5000)
    out = detect_edge(x, allow_none=True, cutoff=1.5)
    assert out is False


def test_detect_edge_lower():
    rng = np.random.default_rng(6)
    x = rng.exponential(0.1, 5000)
    x = x[x < 1]
    out = detect_edge(x, allow_none=True)
    assert out == "lower"
