"""Reference-parity behaviour tests for
``utils.{stats,hist,indices,information,distance,sorting,optimise}``.

Behaviours mirrored from the matching reference suites under
``/root/reference/tests/test_utils/``, written fresh against this
package's API.
"""

import numpy as np
import pytest

from nessai_tpu.utils.distance import compute_minimum_distances
from nessai_tpu.utils.hist import auto_bins
from nessai_tpu.utils.indices import (
    bonferroni_correction,
    compute_indices_ks_test,
)
from nessai_tpu.utils.information import differential_entropy
from nessai_tpu.utils.sorting import sort_reparameterisations
from nessai_tpu.utils.stats import (
    effective_sample_size,
    rolling_mean,
    weighted_quantile,
)


# ----------------------------------------------------------------------
# stats
# ----------------------------------------------------------------------
def test_ess_equal_weights():
    log_w = np.zeros(10)
    np.testing.assert_almost_equal(effective_sample_size(log_w), 10)
    assert (log_w == 0.0).all()  # input unchanged


def test_rolling_mean_values():
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    expected = np.array([4.0 / 3.0, 2.0, 3.0, 4.0, 5.0, 17.0 / 3.0])
    np.testing.assert_array_almost_equal(
        rolling_mean(x, N=3), expected, decimal=15
    )


def test_weighted_quantile_equal_weights():
    np.testing.assert_almost_equal(
        weighted_quantile([1, 2, 3, 4, 5], 0.5), 3.0, decimal=12
    )


def test_weighted_quantile_different_weights():
    # example 8 from https://aakinshin.net/posts/weighted-quantiles/
    x = [1, 2, 3, 4, 5]
    w = [0.4, 0.4, 0.05, 0.05, 0.1]
    out = weighted_quantile(x, 0.5, log_weights=np.log(w))
    np.testing.assert_almost_equal(out, 1.8416, decimal=4)


def test_weighted_quantile_invalid_quantile():
    with pytest.raises(ValueError, match=r"Quantiles should be in \[0, 1\]"):
        weighted_quantile([1, 2, 3], quantiles=1.5)


def test_weighted_quantile_non_finite_ess():
    with pytest.raises(
        ValueError, match=r"Effective sample size is not finite"
    ):
        with np.errstate(invalid="ignore"):
            weighted_quantile(
                [1, 2], 0.5, log_weights=np.array([-np.inf, -np.inf])
            )


# ----------------------------------------------------------------------
# hist
# ----------------------------------------------------------------------
def test_auto_bins_max_bins():
    assert auto_bins(np.random.default_rng(0).random(100), max_bins=2) <= 2


def test_auto_bins_single_point():
    assert auto_bins(np.random.default_rng(1).random()) >= 1


def test_auto_bins_no_samples():
    with pytest.raises(RuntimeError) as excinfo:
        auto_bins([])
    assert "Input array is empty!" in str(excinfo.value)


# ----------------------------------------------------------------------
# indices
# ----------------------------------------------------------------------
@pytest.mark.parametrize("mode", ["D+", "D-"])
def test_indices_ks_test_modes(mode):
    indices = np.random.default_rng(2).integers(0, 1000, 1000)
    out = compute_indices_ks_test(indices, 1000, mode=mode)
    assert all(o > 0.0 for o in out)


def test_indices_ks_test_undefined_mode():
    indices = np.random.default_rng(3).integers(0, 1000, 1000)
    with pytest.raises(RuntimeError):
        compute_indices_ks_test(indices, 1000, mode="two-sided")


def test_indices_ks_test_empty():
    out = compute_indices_ks_test([], 1000, mode="D+")
    assert all(o is None for o in out)


def test_bonferroni_correction_values():
    p_values = np.linspace(0, 0.5, 4)
    rejected, corrected, alpha = bonferroni_correction(p_values)
    np.testing.assert_array_equal(corrected, np.array([0, 2 / 3, 1, 1]))
    assert rejected.tolist() == [True, False, False, False]
    assert alpha == 0.0125


# ----------------------------------------------------------------------
# information
# ----------------------------------------------------------------------
def test_differential_entropy():
    x = np.random.default_rng(4).standard_normal(10)
    np.testing.assert_almost_equal(differential_entropy(x), -np.mean(x))


# ----------------------------------------------------------------------
# distance
# ----------------------------------------------------------------------
@pytest.mark.parametrize("metric", ["euclidean", "minkowski"])
def test_minimum_distance(metric):
    samples = np.array([[1], [2], [4]])
    dmin = compute_minimum_distances(samples, metric=metric)
    np.testing.assert_array_equal(dmin, np.array([1, 1, 2]))


# ----------------------------------------------------------------------
# sorting (scenarios via this package's requires/parameters contract)
# ----------------------------------------------------------------------
class _Reparam:
    def __init__(self, name, parameters, prime_parameters, requires=None):
        self.name = name
        self.parameters = parameters
        self.prime_parameters = prime_parameters
        self.requires = requires or []

    def __repr__(self):
        return self.name


def test_sorting_with_prime_requirements():
    r0 = _Reparam("1", ["a"], ["a_p"])
    r1 = _Reparam("2", ["b"], ["b_p"], requires=["a_p"])
    out = sort_reparameterisations([r1, r0], existing_parameters=["a", "b"])
    assert [r.name for r in out] == ["1", "2"]


def test_sorting_no_requirements_keeps_order():
    r0 = _Reparam("1", ["a"], ["a_p"])
    r1 = _Reparam("2", ["b"], ["b_p"])
    out = sort_reparameterisations([r0, r1], existing_parameters=["a", "b"])
    assert [r.name for r in out] == ["1", "2"]


def test_sorting_chain():
    r0 = _Reparam("1", ["a"], ["a_p"], requires=["b_p"])
    r1 = _Reparam("2", ["b"], ["b_p"], requires=["c_p"])
    r2 = _Reparam("3", ["c"], ["c_p"])
    out = sort_reparameterisations(
        [r0, r1, r2], existing_parameters=["a", "b", "c"]
    )
    assert [r.name for r in out] == ["3", "2", "1"]


def test_sorting_unsatisfiable_requirement_raises():
    r0 = _Reparam("1", ["a"], ["a_p"], requires=["zz_p"])
    with pytest.raises(
        ValueError, match="Could not sort reparameterisations"
    ):
        sort_reparameterisations([r0], existing_parameters=["a"])


def test_sorting_circular_requirements_raise():
    r0 = _Reparam("1", ["a"], ["a_p"], requires=["b_p"])
    r1 = _Reparam("2", ["b"], ["b_p"], requires=["a_p"])
    with pytest.raises(
        ValueError, match="Could not sort reparameterisations"
    ):
        sort_reparameterisations([r0, r1], existing_parameters=["a", "b"])


# ----------------------------------------------------------------------
# optimise
# ----------------------------------------------------------------------
def test_optimise_meta_proposal_weights_simplex():
    from nessai_tpu.utils.optimise import optimise_meta_proposal_weights

    rng = np.random.default_rng(5)
    n, k = 200, 4
    logL = rng.standard_normal(n)
    log_q = rng.standard_normal((n, k))
    w0 = np.ones(k) / k
    out = optimise_meta_proposal_weights(logL, log_q, w0)
    assert out.shape == (k,)
    np.testing.assert_allclose(out.sum(), 1.0, atol=1e-6)
    assert np.all(out >= -1e-9)
