"""Reference-parity behaviour tests for ``BaseNestedSampler``.

Mirrors ``/root/reference/tests/test_samplers/test_base_sampler.py``
against this package's API (behaviour level, no mocking of internals).
"""

import datetime
import os
import time

import numpy as np
import pytest

from nessai_tpu.samplers.base import BaseNestedSampler


class MinimalSampler(BaseNestedSampler):
    def nested_sampling_loop(self):
        return None

    def log_state(self):
        import logging

        logging.getLogger("nessai_tpu.samplers.base").info(
            "it: %s", self.iteration
        )


@pytest.fixture
def sampler(model, tmp_path):
    return MinimalSampler(model, nlive=100, output=str(tmp_path), seed=7)


def test_init_attributes(sampler, tmp_path):
    assert sampler.nlive == 100
    assert sampler.seed == 7
    assert sampler.iteration == 0
    assert sampler.finalised is False
    assert sampler.history is None
    assert sampler.resume_file == os.path.join(
        str(tmp_path), "nested_sampler_resume.pkl"
    )


def test_likelihood_evaluation_time(sampler):
    t = datetime.timedelta(seconds=4)
    sampler.model.likelihood_evaluation_time = t
    assert sampler.likelihood_evaluation_time is t


def test_total_likelihood_evaluations_and_calls(sampler):
    sampler.model.likelihood_evaluations = 10
    assert sampler.total_likelihood_evaluations == 10
    assert sampler.likelihood_calls == 10


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


def test_posterior_effective_sample_size(sampler):
    with pytest.raises(NotImplementedError):
        sampler.posterior_effective_sample_size


# ----------------------------------------------------------------------
# configure_rng
# ----------------------------------------------------------------------
def test_configure_rng_seed(sampler):
    sampler.configure_rng(150914, None)
    assert sampler.seed == 150914
    assert isinstance(sampler.rng, np.random.Generator)


def test_configure_rng_no_seed_or_rng(sampler):
    sampler.configure_rng(None, None)
    assert sampler.seed is not None
    assert isinstance(sampler.rng, np.random.Generator)


def test_configure_rng_rng_only(sampler):
    """A seed is derived from the rng so the run is reproducible."""
    rng = np.random.default_rng(42)
    sampler.configure_rng(rng=rng)
    assert sampler.seed is not None
    assert sampler.rng is rng


def test_configure_rng_rng_integration(sampler):
    """Same rng state gives the same derived seed."""
    sampler.configure_rng(rng=np.random.default_rng(42))
    seed1 = sampler.seed
    sampler.configure_rng(rng=np.random.default_rng(42))
    assert sampler.seed == seed1


def test_configure_rng_reproducible_without_seed(sampler):
    """A run without a seed can be reproduced from the generated seed."""
    sampler.configure_rng()
    seed = sampler.seed
    x = sampler.rng.integers(0, 100)
    sampler.configure_rng(seed=seed)
    assert sampler.rng.integers(0, 100) == x


# ----------------------------------------------------------------------
# configure_output
# ----------------------------------------------------------------------
def test_configure_output(sampler, tmp_path):
    path = str(tmp_path / "tests")
    out = sampler.configure_output(path)
    assert os.path.exists(path)
    assert out == path
    assert sampler.resume_file == os.path.join(
        path, "nested_sampler_resume.pkl"
    )


def test_configure_output_none(sampler, tmp_path, monkeypatch):
    path = tmp_path / "test_cwd"
    path.mkdir()
    monkeypatch.chdir(path)
    out = sampler.configure_output(None)
    assert out == str(path)


def test_configure_output_w_resume(sampler, tmp_path):
    path = str(tmp_path / "tests")
    sampler.configure_output(path, "resume.pkl")
    assert sampler.resume_file == os.path.join(path, "resume.pkl")


def test_update_output(sampler, tmp_path):
    new = str(tmp_path / "new")
    sampler.update_output(new)
    assert sampler.output == new
    assert os.path.exists(new)
    assert sampler.resume_file == os.path.join(
        new, "nested_sampler_resume.pkl"
    )


# ----------------------------------------------------------------------
# periodic logging
# ----------------------------------------------------------------------
def test_configure_periodic_logging_time(sampler):
    sampler.configure_periodic_logging(20, False)
    assert sampler.logging_interval == 20
    assert sampler.log_on_iteration is False
    assert sampler._last_log == pytest.approx(time.time(), abs=5)


@pytest.mark.parametrize("interval, expected", [(50, 50), (None, 100)])
def test_configure_periodic_logging_interval(sampler, interval, expected):
    sampler.configure_periodic_logging(interval, True)
    assert sampler._last_log == 0
    assert sampler.logging_interval == expected
    assert sampler.log_on_iteration is True


def test_configure_periodic_logging_all_false(sampler, caplog):
    sampler.configure_periodic_logging(None, False)
    assert sampler.log_on_iteration is True
    assert sampler._last_log == 0
    assert sampler.logging_interval == 100


def test_periodically_log_state_iteration(sampler, caplog):
    import logging

    caplog.set_level(logging.INFO, logger="nessai_tpu.samplers.base")
    sampler.configure_periodic_logging(10, True)
    sampler.iteration = 5
    sampler.periodically_log_state()
    assert "it:" not in caplog.text
    sampler.iteration = 10
    sampler.periodically_log_state()
    assert "it:" in caplog.text
    assert sampler._last_log == 10


# ----------------------------------------------------------------------
# history / results
# ----------------------------------------------------------------------
def test_initialise_history_skip(sampler):
    sampler.initialise_history()
    sampler.history["sampling_time"].append(1.0)
    sampler.initialise_history()
    # not re-initialised
    assert sampler.history["sampling_time"] == [1.0]


def test_update_history(sampler):
    sampler.initialise_history()
    sampler.update_history()
    assert len(sampler.history["sampling_time"]) == 1
    assert len(sampler.history["likelihood_evaluations"]) == 1


def test_get_result_dictionary(sampler):
    d = sampler.get_result_dictionary()
    assert d["seed"] == 7
    assert "version" in d
    assert "sampling_time" in d
    assert "history" in d


def test_getstate_excludes_model(sampler):
    state = sampler.__getstate__()
    assert "model" not in state
    assert "_previous_likelihood_evaluations" in state
    assert "_previous_likelihood_evaluation_time" in state
