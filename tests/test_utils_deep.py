"""Deep coverage of the utility modules: rescaling function pairs and
Jacobians, edge detection branches, indices/stats/information/
structures/hist/distance/distributions helpers.

Reference: ``tests/test_utils/`` in the reference repo.
"""

import numpy as np
import pytest
from scipy import stats as scipy_stats

from nessai_tpu.utils.rescaling import (
    configure_edge_detection,
    detect_edge,
    determine_rescaled_bounds,
    gaussian_cdf,
    inverse_gaussian_cdf,
    inverse_rescale_minus_one_to_one,
    inverse_rescale_zero_to_one,
    log_inverse_rescale,
    log_rescale,
    logit,
    rescale_minus_one_to_one,
    rescale_zero_to_one,
    rescaling_functions,
    sigmoid,
)


# ----------------------------------------------------------------------
# rescaling function pairs: roundtrip + Jacobian consistency
# ----------------------------------------------------------------------
def _check_pair(fwd, inv, x, **kwargs):
    y, log_j = fwd(x, **kwargs)
    x2, log_j_inv = inv(y, **kwargs)
    np.testing.assert_allclose(x2, x, atol=1e-10)
    np.testing.assert_allclose(log_j + log_j_inv, 0.0, atol=1e-10)
    # numerical Jacobian check on interior points
    eps = 1e-6
    y_hi, _ = fwd(x + eps, **kwargs)
    num = np.log(np.abs((y_hi - y) / eps))
    np.testing.assert_allclose(log_j, num, atol=1e-3)


def test_zero_to_one_pair():
    x = np.linspace(2.0, 6.0, 11)[1:-1]
    _check_pair(
        rescale_zero_to_one, inverse_rescale_zero_to_one, x, xmin=2.0, xmax=6.0
    )


def test_minus_one_to_one_pair():
    x = np.linspace(-3.0, 5.0, 11)[1:-1]
    _check_pair(
        rescale_minus_one_to_one,
        inverse_rescale_minus_one_to_one,
        x,
        xmin=-3.0,
        xmax=5.0,
    )


def test_logit_sigmoid_pair():
    x = np.linspace(0.05, 0.95, 9)
    _check_pair(logit, sigmoid, x)


def test_log_rescale_pair():
    x = np.linspace(0.5, 4.0, 9)
    _check_pair(log_rescale, log_inverse_rescale, x)


def test_gaussian_cdf_pair():
    x = np.linspace(-2.0, 2.0, 9)
    _check_pair(gaussian_cdf, inverse_gaussian_cdf, x)


def test_rescaling_functions_registry():
    for name in ("logit", "log", "gaussian_cdf", "inv_gaussian_cdf"):
        fwd, inv = rescaling_functions[name]
        assert callable(fwd) and callable(inv)


def test_logit_clips_extremes():
    y, log_j = logit(np.array([0.0, 1.0]), eps=1e-6)
    assert np.isfinite(y).all()
    assert np.isfinite(log_j).all()


# ----------------------------------------------------------------------
# edge detection
# ----------------------------------------------------------------------
def test_detect_edge_upper():
    rng = np.random.default_rng(0)
    x = rng.beta(8, 1, 5000)
    assert detect_edge(x, allow_none=True) == "upper"


def test_detect_edge_both():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.beta(1, 8, 2500), rng.beta(8, 1, 2500)])
    out = detect_edge(x, allow_both=True, allow_none=True)
    assert out == "both"


def test_detect_edge_both_not_allowed():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.beta(1, 8, 2500), rng.beta(8, 1, 2500)])
    out = detect_edge(x, allow_both=False, allow_none=False)
    assert out in ("lower", "upper")


def test_detect_edge_allowed_bounds():
    rng = np.random.default_rng(0)
    x = rng.beta(1, 8, 5000)  # lower edge
    out = detect_edge(x, allowed_bounds=["upper"], allow_none=True)
    assert out in (False, "upper")


def test_detect_edge_test_override():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=100)
    # forced edge via the test argument
    assert detect_edge(x, test="lower") == "lower"


def test_configure_edge_detection_defaults():
    d = configure_edge_detection(None, detect_edges=True)
    assert d["allow_none"] is True
    d2 = configure_edge_detection(None, detect_edges=False)
    assert d2["allow_none"] is False
    d3 = configure_edge_detection({"cutoff": 0.2}, detect_edges=True)
    assert d3["cutoff"] == 0.2


def test_determine_rescaled_bounds():
    # no inversion: [-1, 1]
    lo, hi = determine_rescaled_bounds(0.0, 1.0, 0.0, 1.0, invert=None)
    assert (lo, hi) == (-1, 1)


# ----------------------------------------------------------------------
# indices / stats / information
# ----------------------------------------------------------------------
def test_indices_ks_uniform():
    from nessai_tpu.utils.indices import (
        bonferroni_correction,
        compute_indices_ks_test,
    )

    rng = np.random.default_rng(1)
    idx = rng.integers(0, 1000, 5000)
    d, p = compute_indices_ks_test(idx, 1000)
    assert p > 0.01
    # indices biased high: the one-sided D+ statistic catches them
    d2, p2 = compute_indices_ks_test(
        rng.integers(500, 1000, 5000), 1000
    )
    assert p2 < 1e-6
    # indices biased low are caught by D-
    d3, p3 = compute_indices_ks_test(
        rng.integers(0, 500, 5000), 1000, mode="D-"
    )
    assert p3 < 1e-6
    with pytest.raises(RuntimeError, match="Invalid mode"):
        compute_indices_ks_test(idx, 1000, mode="bogus")
    rejected, corrected_p, alpha = bonferroni_correction([0.01, 0.5, 0.9])
    assert len(rejected) == 3
    assert np.isclose(alpha, 0.05 / 3)
    assert rejected[0] and not rejected[1]


def test_indices_ks_empty():
    from nessai_tpu.utils.indices import compute_indices_ks_test

    out = compute_indices_ks_test(np.array([]), 100)
    assert out[0] is None or np.isnan(out[0])


def test_effective_sample_size():
    from nessai_tpu.utils.stats import effective_sample_size

    log_w = np.zeros(100)
    assert np.isclose(effective_sample_size(log_w), 100.0)
    # one dominant weight -> ESS ~ 1
    log_w2 = np.full(100, -1e3)
    log_w2[0] = 0.0
    assert effective_sample_size(log_w2) < 1.5


def test_rolling_mean():
    from nessai_tpu.utils.stats import rolling_mean

    x = np.arange(10, dtype=float)
    out = rolling_mean(x, N=3)
    assert len(out) == 10
    assert np.isclose(out[5], 5.0)


def test_weighted_quantile_matches_numpy_for_equal_weights():
    from nessai_tpu.utils.stats import weighted_quantile

    rng = np.random.default_rng(2)
    x = rng.normal(size=5000)
    q = weighted_quantile(x, 0.5, log_weights=np.zeros(x.size))
    assert np.isclose(q, np.median(x), atol=0.05)


def test_differential_entropy():
    from nessai_tpu.utils.information import differential_entropy

    rng = np.random.default_rng(3)
    samples = rng.normal(size=20000)
    log_p = scipy_stats.norm.logpdf(samples)
    h = differential_entropy(log_p)
    expected = 0.5 * np.log(2 * np.pi * np.e)
    assert np.isclose(h, expected, atol=0.05)


# ----------------------------------------------------------------------
# structures / hist / distance / sorting
# ----------------------------------------------------------------------
def test_get_subset_arrays():
    from nessai_tpu.utils.structures import get_subset_arrays

    a = np.arange(5)
    b = np.arange(5) * 2
    keep = np.array([True, False, True, False, True])
    a2, b2 = get_subset_arrays(keep, a, b)
    np.testing.assert_array_equal(a2, [0, 2, 4])
    np.testing.assert_array_equal(b2, [0, 4, 8])


def test_isfinite_struct():
    from nessai_tpu.livepoint import empty_structured_array
    from nessai_tpu.utils.structures import isfinite_struct

    x = empty_structured_array(3, names=["a", "b"])
    x["a"] = [1.0, np.inf, 2.0]
    x["b"] = [0.0, 1.0, np.nan]
    out = isfinite_struct(x, names=["a", "b"])
    np.testing.assert_array_equal(out, [True, False, False])


def test_array_split_chunksize():
    from nessai_tpu.utils.structures import array_split_chunksize

    x = np.arange(10)
    chunks = array_split_chunksize(x, 4)
    assert [len(c) for c in chunks] == [4, 4, 2]
    with pytest.raises(ValueError):
        array_split_chunksize(x, 0)


def test_get_inverse_indices():
    from nessai_tpu.utils.structures import get_inverse_indices

    out = get_inverse_indices(6, np.array([1, 3]))
    np.testing.assert_array_equal(out, [0, 2, 4, 5])


def test_auto_bins():
    from nessai_tpu.utils.hist import auto_bins

    rng = np.random.default_rng(4)
    x = rng.normal(size=1000)
    n = auto_bins(x)
    assert isinstance(n, (int, np.integer))
    assert n > 1
    with pytest.raises(RuntimeError):
        auto_bins(np.array([]))


def test_compute_minimum_distances():
    from nessai_tpu.utils.distance import compute_minimum_distances

    x = np.array([[0.0, 0.0], [1.0, 0.0], [5.0, 0.0]])
    d = compute_minimum_distances(x)
    np.testing.assert_allclose(d, [1.0, 1.0, 4.0])


def test_sort_reparameterisations_dependencies():
    from nessai_tpu.utils.sorting import sort_reparameterisations

    class R:
        def __init__(self, name, requires):
            self.name = name
            self.requires = requires
            self.parameters = [name]
            self.prime_parameters = [name + "_prime"]

    a = R("a", [])
    b = R("b", ["a"])
    c = R("c", ["b"])
    order = sort_reparameterisations([c, b, a])
    names = [r.name for r in order]
    assert names.index("a") < names.index("b") < names.index("c")


# ----------------------------------------------------------------------
# distributions
# ----------------------------------------------------------------------
def test_box_uniform():
    from nessai_tpu.utils.distributions import get_uniform_distribution

    import jax

    dist = get_uniform_distribution(2, 3.0)
    s = np.asarray(dist.sample(jax.random.PRNGKey(0), 100))
    assert s.shape == (100, 2)
    assert (np.abs(s) <= 3.0).all()
    lp = np.asarray(dist.log_prob(s))
    np.testing.assert_allclose(lp, -2 * np.log(6.0), rtol=1e-6)
    outside = np.asarray(dist.log_prob(np.array([[10.0, 0.0]])))
    assert outside[0] == -np.inf


def test_diagonal_normal():
    from nessai_tpu.utils.distributions import get_multivariate_normal

    import jax

    dist = get_multivariate_normal(2, var=4.0)
    s = np.asarray(dist.sample(jax.random.PRNGKey(1), 50000))
    assert np.isclose(np.std(s), 2.0, atol=0.05)
    lp = np.asarray(dist.log_prob(np.zeros((1, 2))))
    expected = scipy_stats.multivariate_normal(
        np.zeros(2), 4.0 * np.eye(2)
    ).logpdf(np.zeros(2))
    assert np.isclose(lp[0], expected, atol=1e-6)
