"""Reference-parity tests for ``NestedSampler`` properties.

Mirrors ``/root/reference/tests/test_samplers/test_nested_sampler/
test_properties.py`` against this package's API.
"""

import datetime
import time
from collections import deque

import numpy as np
import pytest

from nessai_tpu.samplers.nestedsampler import NestedSampler


@pytest.fixture
def sampler(model, tmp_path):
    return NestedSampler(
        model,
        nlive=100,
        output=str(tmp_path),
        seed=3,
        plot=False,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=2, patience=2, batch_size=50),
    )


def test_log_evidence(sampler):
    sampler.state.logZ = -2
    assert sampler.log_evidence == -2


def test_log_evidence_error(sampler):
    # the state's error is a computed property here; the sampler must
    # simply expose it
    assert sampler.log_evidence_error == sampler.state.log_evidence_error


def test_information(sampler):
    sampler.state.info = [1, 2, 3]
    assert sampler.information == 3


def test_population_time(sampler):
    t1 = datetime.timedelta(seconds=1)
    t2 = datetime.timedelta(seconds=2)
    sampler._uninformed_proposal.population_time = t1
    sampler._flow_proposal.population_time = t2
    assert sampler.proposal_population_time == t1 + t2


def test_acceptance(sampler):
    sampler.iteration = 10
    sampler.model.likelihood_evaluations = 100
    assert sampler.acceptance == 0.1


def test_current_sampling_time(sampler):
    sampler.finalised = False
    sampler.sampling_time = datetime.timedelta(seconds=10)
    sampler.sampling_start_time = datetime.datetime.now()
    time.sleep(0.01)
    assert sampler.current_sampling_time.total_seconds() > 10.0


def test_current_sampling_time_finalised(sampler):
    sampler.finalised = True
    sampler.sampling_time = datetime.timedelta(seconds=10)
    assert sampler.current_sampling_time == datetime.timedelta(seconds=10)


def test_last_updated(sampler):
    sampler.last_updated = 20
    assert sampler.last_updated == 20


def test_mean_acceptance(sampler):
    sampler.acceptance_history = deque([1.0, 2.0, 3.0], maxlen=10)
    assert sampler.mean_acceptance == 2.0


def test_mean_acceptance_empty(sampler):
    sampler.acceptance_history = deque(maxlen=10)
    assert np.isnan(sampler.mean_acceptance)


def test_acceptance_history_is_bounded(sampler):
    assert isinstance(sampler.acceptance_history, deque)
    assert sampler.acceptance_history.maxlen == 10


def test_posterior_effective_sample_size(sampler):
    # before any samples it should not crash catastrophically; with a
    # couple of fake samples the ESS is finite and positive
    sampler.state.logLs = [-np.inf, 1.0, 2.0]
    sampler.state.log_vols = [0.0, -0.5, -1.0]
    out = sampler.posterior_effective_sample_size
    assert np.isfinite(out) or np.isnan(out)


def test_birth_log_likelihoods(sampler):
    sampler.state.logLs = [-np.inf, 1, 2, 3, 4]
    dtype = [("it", "i4")]
    sampler.nested_samples = [
        np.array([0], dtype=dtype),
        np.array([1], dtype=dtype),
        np.array([2], dtype=dtype),
        np.array([0], dtype=dtype),
        np.array([0], dtype=dtype),
        np.array([4], dtype=dtype),
        np.array([3], dtype=dtype),
    ]
    expected = np.array([-np.inf, 1, 2, -np.inf, -np.inf, 4, 3])
    np.testing.assert_array_equal(sampler.birth_log_likelihoods, expected)


def test_tolerance(sampler):
    assert sampler.tolerance == sampler.stopping_criterion.tolerance


def test_likelihood_calls_tracks_model(sampler):
    sampler.model.likelihood_evaluations = 123
    assert sampler.likelihood_calls == 123
