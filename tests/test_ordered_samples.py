"""Parity suite for :class:`OrderedSamples`, ported from the reference
``tests/test_samplers/test_importance_nested_sampler/test_ordered_samples.py``
(19 tests) but driven through real objects rather than autospec mocks:
our implementation stores an ``is_nested`` mask and derives the
``live_points_indices`` / ``nested_samples_indices`` views the reference
stores directly (``nessai/samplers/importancesampler.py:39-277``).
"""

import numpy as np
import pickle
import pytest
from scipy.special import logsumexp

from nessai_tpu.evidence import (
    _INSIntegralState,
    log_evidence_from_ins_samples,
)
from nessai_tpu.livepoint import numpy_array_to_live_points
from nessai_tpu.samplers.importancesampler import (
    ImportanceNestedSampler,
    OrderedSamples,
)
from nessai_tpu.utils.testing import assert_structured_arrays_equal

N_PROPOSALS = 4


@pytest.fixture(autouse=True)
def ins_fields():
    # register the INS live-point fields (logW/logQ/logU) after the
    # conftest's per-test livepoint-config reset
    ImportanceNestedSampler.add_fields()


@pytest.fixture()
def rng():
    return np.random.default_rng(170817)


@pytest.fixture()
def samples(rng):
    x = numpy_array_to_live_points(
        rng.standard_normal((20, 2)), ["x_0", "x_1"]
    )
    x["logL"] = rng.standard_normal(20)
    x["logW"] = -np.abs(rng.standard_normal(20))
    x["it"] = rng.integers(-1, N_PROPOSALS - 1, size=20)
    return np.sort(x, order="logL")


@pytest.fixture()
def log_q(rng, samples):
    return rng.standard_normal((samples.size, N_PROPOSALS))


@pytest.fixture()
def ordered(samples, log_q):
    os_ = OrderedSamples()
    os_.add_initial_samples(samples.copy(), log_q.copy())
    return os_


def test_live_points_view(ordered, samples):
    ordered.is_nested[:] = False
    ordered.is_nested[[0, 1]] = True
    assert_structured_arrays_equal(ordered.live_points, samples[2:])
    np.testing.assert_array_equal(
        ordered.live_points_indices, np.arange(2, samples.size)
    )
    np.testing.assert_array_equal(
        ordered.nested_samples_indices, np.array([0, 1])
    )


def test_live_points_none_before_samples():
    os_ = OrderedSamples()
    assert os_.live_points is None
    assert os_.nested_samples is None
    assert os_.live_points_indices is None
    assert os_.nested_samples_indices.size == 0


def test_live_points_setter_error(ordered):
    with pytest.raises(ValueError, match=r"Can only set live points to None"):
        ordered.live_points = 1.0


def test_live_points_setter_none(ordered):
    ordered.live_points = None
    assert ordered.live_points is None
    assert ordered.live_points_indices is None
    assert ordered.is_nested.all()


def test_nested_samples_view(ordered, samples):
    ordered.is_nested[:] = False
    ordered.is_nested[[2, 3]] = True
    assert_structured_arrays_equal(ordered.nested_samples, samples[[2, 3]])


def test_update_log_likelihood_threshold(ordered):
    ordered.update_log_likelihood_threshold(5.0)
    assert ordered.log_likelihood_threshold == 5.0


def test_sort_samples_only(ordered, rng):
    x = np.array(rng.standard_normal(10), dtype=[("logL", "f8")])
    out = ordered.sort_samples(x)
    assert np.all(np.diff(out["logL"]) > 0)


def test_sort_samples_with_extra(ordered, rng):
    x = np.array(rng.standard_normal(10), dtype=[("logL", "f8")])
    order = np.argsort(x["logL"])
    extra = np.arange(x.size)
    sorted_x, sorted_extra = ordered.sort_samples(x, extra)
    assert_structured_arrays_equal(sorted_x, x[order])
    np.testing.assert_array_equal(sorted_extra, extra[order])


def test_add_initial_samples(samples, log_q, rng):
    os_ = OrderedSamples()
    perm = rng.permutation(samples.size)
    os_.add_initial_samples(samples[perm], log_q[perm])
    assert np.all(np.diff(os_.samples["logL"]) >= 0)
    assert_structured_arrays_equal(os_.samples, samples)
    np.testing.assert_array_equal(os_.log_q, log_q)
    # everything starts live
    np.testing.assert_array_equal(
        os_.live_points_indices, np.arange(samples.size)
    )


@pytest.mark.parametrize("has_live_points", [True, False])
def test_add_samples_soft(samples, log_q, rng, has_live_points):
    """strict_threshold=False: all new samples become live and global
    logL order is preserved (reference test_add_samples_soft)."""
    n = int(0.8 * samples.size)
    os_ = OrderedSamples(strict_threshold=False)
    os_.add_initial_samples(samples[:n].copy(), log_q[:n].copy())
    if has_live_points:
        n_ns = int(0.8 * n)
        ns_indices = np.sort(rng.choice(n, size=n_ns, replace=False))
        os_.add_to_nested_samples(ns_indices)
    else:
        n_ns = n
        os_.live_points = None

    os_.add_samples(samples[n:].copy(), log_q[n:].copy())

    assert len(os_.live_points_indices) == (n - n_ns + samples.size - n)
    assert np.all(np.diff(os_.samples["logL"]) >= 0)
    assert np.all(np.diff(os_.live_points["logL"]) >= 0)
    assert np.all(np.diff(os_.nested_samples["logL"]) >= 0)
    # log_q rows stay aligned with their samples
    full = np.concatenate([samples[:n], samples[n:]])
    full_q = np.concatenate([log_q[:n], log_q[n:]], axis=0)
    order = np.argsort(full, order="logL")
    np.testing.assert_allclose(os_.log_q, full_q[order])


def test_add_samples_strict(samples, log_q, rng):
    """strict_threshold=True: the live/nested split is recomputed from
    the threshold (reference test_add_samples)."""
    expected = samples.copy()
    expected_log_q = log_q.copy()

    perm = rng.permutation(samples.size)
    shuffled = samples[perm]
    shuffled_q = log_q[perm]
    n = int(0.8 * samples.size)

    os_ = OrderedSamples(strict_threshold=True)
    os_.add_initial_samples(shuffled[:n].copy(), shuffled_q[:n].copy())

    new = shuffled[n:]
    threshold = np.sort(new, order="logL")[new.size // 2]["logL"].item()
    os_.update_log_likelihood_threshold(threshold)
    n_expected = int(np.sum(expected["logL"] >= threshold))

    os_.add_samples(new.copy(), shuffled_q[n:].copy())

    assert_structured_arrays_equal(os_.samples, expected)
    np.testing.assert_allclose(os_.log_q, expected_log_q)
    np.testing.assert_array_equal(
        os_.nested_samples_indices, np.arange(samples.size - n_expected)
    )
    np.testing.assert_array_equal(
        os_.live_points_indices,
        np.arange(samples.size - n_expected, samples.size),
    )


@pytest.mark.parametrize("replace_all", [False, True])
def test_remove_samples(replace_all, rng):
    n = 10
    x = numpy_array_to_live_points(rng.standard_normal((n, 1)), ["x_0"])
    x["logL"] = np.arange(n, dtype=float)
    os_ = OrderedSamples(replace_all=replace_all)
    os_.add_initial_samples(x, rng.standard_normal((n, 1)))
    os_.update_log_likelihood_threshold(5.5)

    expected = n if replace_all else 6
    out = os_.remove_samples()

    assert out == expected
    if replace_all:
        assert os_.live_points is None
        assert os_.is_nested.all()
    else:
        np.testing.assert_array_equal(
            os_.live_points_indices, np.arange(6, n)
        )


def test_add_to_nested_samples(ordered):
    ordered.is_nested[:] = False
    ordered.add_to_nested_samples(np.array([0, 1, 2, 4, 5, 8]))
    ordered.add_to_nested_samples(np.array([3, 6, 7, 9]))
    np.testing.assert_array_equal(
        ordered.nested_samples_indices[:10], np.arange(10)
    )


def test_update_evidence(ordered):
    ordered.add_to_nested_samples(np.arange(10))
    ordered.update_evidence()
    # cross-check against a fresh state fed the same splits
    state = _INSIntegralState()
    state.update_evidence(
        ordered.nested_samples, live_points=ordered.live_points
    )
    assert ordered.state.log_evidence == state.log_evidence


def test_finalise(ordered, samples):
    ordered.add_to_nested_samples(np.arange(4))
    ordered.finalise()
    assert ordered.live_points is None
    assert ordered.live_points_indices is None
    expected = log_evidence_from_ins_samples(samples)
    assert ordered.state.log_evidence == pytest.approx(expected)


@pytest.mark.parametrize("ratio", [0.0, 0.5, 1.0])
def test_compute_importance(ordered, ratio):
    out = ordered.compute_importance(importance_ratio=ratio)
    assert set(out.keys()) == {"total", "posterior", "evidence"}
    for v in out.values():
        assert v.shape == (N_PROPOSALS,)
        assert np.all(np.isfinite(v))
    # each importance vector is a normalised weight over proposals
    np.testing.assert_allclose(out["posterior"].sum(), 1.0)
    np.testing.assert_allclose(out["evidence"].sum(), 1.0)
    np.testing.assert_allclose(
        out["total"],
        ratio * out["posterior"] + (1 - ratio) * out["evidence"],
    )


def test_compute_importance_values(ordered, samples):
    """Exact parity with the reference formula
    (``importancesampler.py:215-253``)."""
    out = ordered.compute_importance(importance_ratio=0.5)
    log_w = samples["logL"] + samples["logW"]
    expected_post = np.full(N_PROPOSALS, -np.inf)
    for i, it in enumerate(range(-1, N_PROPOSALS - 1)):
        m = samples["it"] == it
        if m.any():
            expected_post[i] = logsumexp(log_w[m]) - np.log(m.sum())
    expected_post = np.exp(expected_post - logsumexp(expected_post))
    np.testing.assert_allclose(out["posterior"], expected_post)


@pytest.mark.parametrize("threshold", [None, -10.0])
def test_compute_evidence_ratio(ordered, samples, threshold):
    ordered.update_log_likelihood_threshold(
        np.median(samples["logL"]).item()
    )
    ordered.update_evidence()
    out = ordered.compute_evidence_ratio(threshold)
    actual_threshold = (
        ordered.log_likelihood_threshold if threshold is None else threshold
    )
    above = samples["logL"] >= actual_threshold
    expected = (
        log_evidence_from_ins_samples(samples[above])
        - ordered.state.log_evidence
    )
    assert out == pytest.approx(expected)
    # with the threshold below every sample the ratio covers everything
    if threshold == -10.0:
        assert out == pytest.approx(
            log_evidence_from_ins_samples(samples)
            - ordered.state.log_evidence
        )


@pytest.mark.parametrize("save_log_q", [False, True])
def test_getstate_save_log_q(ordered, save_log_q):
    ordered.save_log_q = save_log_q
    state = ordered.__getstate__()
    if save_log_q:
        assert state["log_q"] is ordered.log_q
    else:
        assert state["log_q"] is None
    # full pickle round-trip keeps everything else
    restored = pickle.loads(pickle.dumps(ordered))
    assert_structured_arrays_equal(restored.samples, ordered.samples)
    np.testing.assert_array_equal(restored.is_nested, ordered.is_nested)
    if save_log_q:
        np.testing.assert_allclose(restored.log_q, ordered.log_q)
    else:
        assert restored.log_q is None
