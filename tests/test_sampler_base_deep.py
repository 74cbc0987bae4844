"""Deep coverage of the base sampler, stopping criteria and the nested
sampler loop controls. Reference: ``nessai/samplers/base.py`` and
``nessai/stopping_criteria.py`` tests."""

import os
import pickle

import numpy as np
import pytest

from nessai_tpu.stopping_criteria import (
    CriterionGroup,
    StoppingCriterionRegistry,
)


# ----------------------------------------------------------------------
# stopping criteria
# ----------------------------------------------------------------------
def test_registry_case_insensitive():
    a = StoppingCriterionRegistry.get("dlogz")
    b = StoppingCriterionRegistry.get("dlogZ")
    assert type(a) is type(b)


def test_registry_with_tolerance():
    c = StoppingCriterionRegistry.get("ess", tolerance=500)
    assert c.tolerance == 500


def test_criterion_comparison_directions():
    dlogz = StoppingCriterionRegistry.get("dlogZ", tolerance=0.1)
    # dlogZ stops when the value drops BELOW tolerance
    assert dlogz.is_met(0.05)
    assert not dlogz.is_met(0.5)
    ess = StoppingCriterionRegistry.get("ess", tolerance=100)
    # ESS stops when the value rises ABOVE tolerance
    assert ess.is_met(200)
    assert not ess.is_met(50)


def test_group_and_or_combinations():
    dlogz = StoppingCriterionRegistry.get("dlogZ", tolerance=0.1)
    ess = StoppingCriterionRegistry.get("ess", tolerance=100)
    both = dlogz & ess
    either = dlogz | ess
    assert isinstance(both, CriterionGroup)
    assert both.is_met({"difference_log_evidence": 0.05, "ess": 200})
    assert not both.is_met({"difference_log_evidence": 0.05, "ess": 50})
    assert either.is_met({"difference_log_evidence": 0.5, "ess": 200})
    assert not either.is_met({"difference_log_evidence": 0.5, "ess": 50})


def test_group_nesting():
    a = StoppingCriterionRegistry.get("dlogZ", tolerance=0.1)
    b = StoppingCriterionRegistry.get("ess", tolerance=100)
    c = StoppingCriterionRegistry.get("ratio", tolerance=0.0)
    g = (a & b) | c
    assert g.is_met(
        {
            "difference_log_evidence": 1.0,
            "ess": 1.0,
            "log_evidence_ratio": -1.0,
        }
    )


def test_registry_names_property():
    names = StoppingCriterionRegistry.known()
    for n in ("difference_log_evidence", "log_evidence_ratio", "ess"):
        assert any(n.lower() == m.lower() for m in names)


# ----------------------------------------------------------------------
# base sampler: output config, checkpoint periodicity, resume errors
# ----------------------------------------------------------------------
def _sampler(tmp_path, model, **kw):
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    kw.setdefault("nlive", 50)
    kw.setdefault("plot", False)
    kw.setdefault("flow_config", dict(n_blocks=2, n_neurons=4, n_layers=1))
    kw.setdefault(
        "training_config", dict(max_epochs=3, batch_size=32, patience=2)
    )
    return NestedSampler(model, output=str(tmp_path), **kw)


def test_output_directories_created(tmp_path, model):
    out = tmp_path / "nested" / "deeper"
    ns = _sampler(out, model)
    assert os.path.isdir(out)
    assert ns.output == str(out)


def test_seed_reproducibility(tmp_path):
    from nessai_tpu.utils.testing import IntegrationTestModel

    # the sampler seeds the model rng from its own seed
    ns1 = _sampler(tmp_path / "a", IntegrationTestModel(2), seed=99)
    ns2 = _sampler(tmp_path / "b", IntegrationTestModel(2), seed=99)
    ns1.populate_live_points()
    ns2.populate_live_points()
    np.testing.assert_array_equal(
        ns1.live_points["logL"], ns2.live_points["logL"]
    )


def test_checkpoint_and_resume_file(tmp_path, model):
    ns = _sampler(tmp_path, model, checkpointing=True)
    ns.populate_live_points()
    ns.checkpoint(force=True)
    assert os.path.exists(tmp_path / "nested_sampler_resume.pkl")
    # second checkpoint rotates
    ns.checkpoint(force=True)
    assert os.path.exists(tmp_path / "nested_sampler_resume.pkl.old")


def test_resume_missing_file_raises(tmp_path, model):
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    with pytest.raises(FileNotFoundError):
        NestedSampler.resume(str(tmp_path / "nope.pkl"), model)


def test_result_dictionary_contents(tmp_path, model):
    ns = _sampler(
        tmp_path,
        model,
        max_iteration=40,
        maximum_uninformed=20,
        poolsize=50,
        checkpointing=False,
    )
    ns.nested_sampling_loop()
    result = ns.get_result_dictionary()
    for key in (
        "log_evidence",
        "log_evidence_error",
        "nested_samples",
        "seed",
        "sampling_time",
        "total_likelihood_evaluations",
    ):
        assert key in result, key


def test_history_updated(tmp_path, model):
    ns = _sampler(
        tmp_path,
        model,
        max_iteration=30,
        maximum_uninformed=10,
        poolsize=50,
        checkpointing=False,
    )
    ns.nested_sampling_loop()
    assert ns.history is not None
    assert len(ns.history["dlogZ"]) > 0
    assert len(ns.history["logZ"]) == len(ns.history["dlogZ"])


def test_pickle_excludes_model_and_restores(tmp_path, model):
    ns = _sampler(
        tmp_path,
        model,
        max_iteration=25,
        maximum_uninformed=10,
        poolsize=50,
        checkpointing=False,
    )
    ns.nested_sampling_loop()
    data = pickle.dumps(ns)
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    ns2 = NestedSampler.resume_from_pickled_sampler(
        pickle.loads(data), model
    )
    assert ns2.iteration == ns.iteration
    assert np.isclose(ns2.state.logZ, ns.state.logZ)
    np.testing.assert_array_equal(
        ns2.live_points["logL"], ns.live_points["logL"]
    )
    # the restored sampler can continue (in a real mid-run checkpoint
    # `condition` is still live; here the first loop finalised, so reset)
    ns2.max_iteration = ns.iteration + 10
    ns2.finalised = False
    ns2.condition = np.inf
    ns2.nested_sampling_loop()
    assert ns2.iteration > ns.iteration


# ---------------------------------------------------------------------
# Checkpoint cadence and callbacks
# (reference tests/test_samplers/test_base_sampler.py:325-458)
# ---------------------------------------------------------------------


def _make_ns(tmp_path, model, **kwargs):
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    return NestedSampler(
        model,
        nlive=100,
        output=str(tmp_path),
        seed=1,
        plot=False,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        poolsize=100,
        **kwargs,
    )


def test_checkpoint_on_iteration_interval(tmp_path, model):
    import os

    ns = _make_ns(
        tmp_path,
        model,
        checkpointing=True,
        checkpoint_on_iteration=True,
        checkpoint_interval=10,
    )
    ns.iteration = 5
    ns.checkpoint(periodic=True)
    assert not os.path.exists(ns.resume_file)
    ns.iteration = 11
    ns.checkpoint(periodic=True)
    assert os.path.exists(ns.resume_file)
    # interval resets after a checkpoint
    mtime = os.path.getmtime(ns.resume_file)
    ns.iteration = 15
    ns.checkpoint(periodic=True)
    assert os.path.getmtime(ns.resume_file) == mtime


def test_checkpoint_time_interval_not_due(tmp_path, model):
    import os

    ns = _make_ns(
        tmp_path,
        model,
        checkpointing=True,
        checkpoint_on_iteration=False,
        checkpoint_interval=10_000,
    )
    ns.checkpoint(periodic=True)
    assert not os.path.exists(ns.resume_file)
    # force overrides the interval
    ns.checkpoint(force=True)
    assert os.path.exists(ns.resume_file)


def test_checkpoint_disabled_but_forced(tmp_path, model):
    import os

    ns = _make_ns(tmp_path, model, checkpointing=False)
    ns.checkpoint(periodic=True)
    assert not os.path.exists(ns.resume_file)
    ns.checkpoint(force=True)
    assert os.path.exists(ns.resume_file)


def test_checkpoint_callback_used_instead_of_file(tmp_path, model):
    import os

    calls = []
    ns = _make_ns(
        tmp_path,
        model,
        checkpointing=True,
        checkpoint_callback=lambda s: calls.append(s.iteration),
    )
    ns.iteration = 7
    ns.checkpoint(force=True)
    assert calls == [7]
    assert not os.path.exists(ns.resume_file)


def test_periodic_logging_by_time(tmp_path, model, caplog):
    import logging
    import time as _time

    caplog.set_level(logging.INFO, logger="nessai_tpu.samplers.nestedsampler")
    caplog.set_level(logging.INFO, logger="nessai_tpu.samplers.base")
    ns = _make_ns(
        tmp_path, model, log_on_iteration=False, logging_interval=10_000
    )
    ns._last_log = _time.time()
    ns.periodically_log_state()
    # not due yet: nothing logged from log_state
    assert "it:" not in caplog.text
    ns._last_log = _time.time() - 20_000
    ns.periodically_log_state()
    assert "it:" in caplog.text


def test_close_pool_delegates(tmp_path, model):
    ns = _make_ns(tmp_path, model)
    ns.close_pool()  # no pool configured: no-op


def test_likelihood_counters_restored_on_resume(tmp_path, model):
    import pickle

    ns = _make_ns(tmp_path, model, checkpointing=False)
    ns.model.likelihood_evaluations = 123
    ns.checkpoint(force=True)
    from nessai_tpu.samplers.nestedsampler import NestedSampler
    from nessai_tpu.utils.testing import IntegrationTestModel

    fresh = IntegrationTestModel(2)
    ns2 = NestedSampler.resume(ns.resume_file, fresh)
    assert ns2.model.likelihood_evaluations == 123


def test_resume_with_new_output_and_callback(tmp_path, model):
    """resume_from_pickled_sampler(output=..., checkpoint_callback=...)
    relocates the run and replaces the checkpoint hook (reference
    samplers/base.py:351-396)."""
    ns = _sampler(
        tmp_path,
        model,
        max_iteration=15,
        maximum_uninformed=10,
        poolsize=50,
        checkpointing=False,
    )
    ns.nested_sampling_loop()
    data = pickle.dumps(ns)
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    new_out = str(tmp_path / "moved")
    calls = []
    ns2 = NestedSampler.resume_from_pickled_sampler(
        pickle.loads(data),
        model,
        output=new_out,
        checkpoint_callback=lambda s: calls.append(s.iteration),
    )
    assert ns2.output == new_out
    assert ns2.resume_file.startswith(new_out)
    assert ns2._flow_proposal.output.startswith(new_out)
    ns2.checkpoint(force=True)
    assert calls
