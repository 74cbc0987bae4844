"""Coverage for the round-5 dispatch-reduction paths.

Pins two behaviours: ``FlowModel.train(save=False)`` keeps the
per-train weights pickle (resume-only data) off disk and off the
device→host transfer path, and the per-program dispatch census in
``utils.programs`` tallies calls by program family.
"""

import os

import numpy as np
import pytest

from nessai_tpu.flowmodel.base import FlowModel
from nessai_tpu.utils import programs


@pytest.fixture()
def fm(tmp_path):
    m = FlowModel(
        output=str(tmp_path),
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=3, patience=2, batch_size=32),
        rng=np.random.default_rng(3),
    )
    m.initialise()
    return m


def _data(n=64, seed=0):
    return (
        np.random.default_rng(seed).normal(size=(n, 2)).astype(np.float32)
    )


@pytest.mark.parametrize("sync", [True, False])
def test_train_save_false_skips_weights_pickle(fm, tmp_path, sync):
    fm.train(_data(seed=1), plot=False, sync=sync, save=False)
    fm._join_pending_save()
    assert not os.path.exists(os.path.join(str(tmp_path), "model.pkl"))
    # history still accumulates (flush any async backlog first)
    fm._flush_pending_history()
    assert len(fm.history["loss"]) >= 1


@pytest.mark.parametrize("sync", [True, False])
def test_train_save_default_writes_weights_pickle(fm, tmp_path, sync):
    fm.train(_data(seed=1), plot=False, sync=sync)
    fm._join_pending_save()
    assert os.path.exists(os.path.join(str(tmp_path), "model.pkl"))


def test_sampler_disables_weight_saves_without_checkpointing(model_2d):
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    ns = NestedSampler(
        model_2d,
        nlive=20,
        output=None,
        checkpointing=False,
        plot=False,
    )
    assert ns._flow_proposal.save_flow_weights is False
    ns2 = NestedSampler(
        model_2d,
        nlive=20,
        output=None,
        checkpointing=True,
        plot=False,
    )
    assert ns2._flow_proposal.save_flow_weights is True


@pytest.fixture()
def model_2d():
    from nessai_tpu.utils.testing import IntegrationTestModel

    return IntegrationTestModel(dims=2)


def test_dispatch_census_tallies_per_program_family():
    programs.reset_dispatch_count()
    base = programs.n_dispatches()
    assert base == 0 and programs.dispatch_census() == {}

    calls = {"a": 0, "b": 0}
    fa = programs.get_program(
        ("famA", 2, 32), lambda: (lambda: calls.__setitem__("a", 1))
    )
    fb = programs.get_program(
        ("famB",), lambda: (lambda: calls.__setitem__("b", 1))
    )
    fa()
    fa()
    fb()
    census = programs.dispatch_census()
    # shape-bucketed variants aggregate on the string parts of the key
    assert census.get("famA") == 2
    assert census.get("famB") == 1
    assert programs.n_dispatches() == 3
    programs.reset_dispatch_count()
    assert programs.dispatch_census() == {}


def test_dispatch_census_groups_shape_buckets():
    programs.reset_dispatch_count()
    f1 = programs.get_program(("fam", "sub", 128), lambda: (lambda: None))
    f2 = programs.get_program(("fam", "sub", 256), lambda: (lambda: None))
    f1()
    f2()
    assert programs.dispatch_census() == {"fam:sub": 2}
    programs.reset_dispatch_count()


def test_nested_samples_array_matches_np_array():
    """The fast bytes-join conversion must be exactly np.array(rows),
    and the cache must invalidate when the list grows."""
    import numpy as np

    from nessai_tpu.livepoint import empty_structured_array
    from nessai_tpu.samplers.nestedsampler import NestedSampler
    from nessai_tpu.utils.testing import assert_structured_arrays_equal

    ns = NestedSampler.__new__(NestedSampler)
    x = empty_structured_array(7, names=["x_0", "x_1"])
    x["x_0"] = np.arange(7.0)
    x["logL"] = -np.arange(7.0)
    x["it"] = np.arange(7)
    ns.nested_samples = [r for r in x[:5]]
    a = ns.nested_samples_array
    assert_structured_arrays_equal(a, np.array(ns.nested_samples))
    assert ns.nested_samples_array is a  # cached
    ns.nested_samples.extend(x[5:])
    b = ns.nested_samples_array
    assert b.shape[0] == 7
    assert_structured_arrays_equal(b, np.array(ns.nested_samples))
    # empty + pickling exclusion
    ns.nested_samples = []
    assert ns.nested_samples_array.shape[0] == 0
