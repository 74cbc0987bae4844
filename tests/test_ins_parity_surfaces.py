"""Reference-parity surfaces on the importance sampler and livepoint
codec: model-space ``live_points``/``final_samples`` properties with
their unit-hypercube twins and read-only setters
(``nessai/samplers/importancesampler.py:579-630``), the
``final_state``/``final_log_evidence`` family (``:497-510, 624-630``)
and the ``non_sampling_parameters`` switch in the livepoint codec
(``nessai/livepoint.py:74-254``).
"""

import os

import numpy as np
import pickle
import pytest

from nessai_tpu import config
from nessai_tpu.livepoint import (
    empty_structured_array,
    get_dtype,
    numpy_array_to_live_points,
    parameters_to_live_point,
)
from nessai_tpu.samplers.importancesampler import ImportanceNestedSampler
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def ins(tmp_path, rng):
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    s = ImportanceNestedSampler(
        model,
        output=str(tmp_path),
        rng=rng,
        nlive=100,
        min_samples=10,
        plot=False,
        checkpointing=False,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64),
    )
    return s


# ---------------------------------------------------------------------------
# livepoint non_sampling_parameters
# ---------------------------------------------------------------------------


def test_get_dtype_without_non_sampling_parameters():
    dt = get_dtype(["a", "b"], non_sampling_parameters=False)
    assert dt.names == ("a", "b")
    dt_full = get_dtype(["a", "b"])
    assert set(dt_full.names) == {"a", "b"} | set(
        config.livepoints.non_sampling_parameters
    )


def test_empty_structured_array_without_non_sampling_parameters():
    out = empty_structured_array(
        3, names=["a"], non_sampling_parameters=False
    )
    assert out.dtype.names == ("a",)
    assert len(out) == 3
    # defaults still filled when enabled
    full = empty_structured_array(3, names=["a"])
    assert np.all(full["it"] == config.livepoints.non_sampling_defaults[
        config.livepoints.non_sampling_parameters.index("it")
    ])


def test_empty_structured_array_dtype_missing_fields_raises():
    dt = np.dtype([("a", "f8")])
    with pytest.raises(ValueError, match="non-sampling"):
        empty_structured_array(2, dtype=dt)


def test_parameters_to_live_point_without_non_sampling_parameters():
    lp = parameters_to_live_point(
        [1.0, 2.0], ["a", "b"], non_sampling_parameters=False
    )
    assert lp.dtype.names == ("a", "b")
    assert lp["a"][0] == 1.0
    empty = parameters_to_live_point(
        [], ["a"], non_sampling_parameters=False
    )
    assert empty.size == 0
    assert empty.dtype.names == ("a",)


def test_numpy_array_to_live_points_without_non_sampling_parameters():
    arr = np.arange(6, dtype=float).reshape(3, 2)
    lp = numpy_array_to_live_points(
        arr, ["a", "b"], non_sampling_parameters=False
    )
    assert lp.dtype.names == ("a", "b")
    np.testing.assert_array_equal(lp["b"], [1.0, 3.0, 5.0])


# ---------------------------------------------------------------------------
# INS live-point / final-sample properties
# ---------------------------------------------------------------------------


def test_live_points_model_space(ins):
    ins.populate_live_points()
    lp_unit = ins.live_points_unit
    lp = ins.live_points
    assert len(lp) == len(lp_unit)
    # unit samples live in [0, 1]; model space is wider for this model
    for name in ins.model.names:
        assert lp_unit[name].min() >= 0.0 and lp_unit[name].max() <= 1.0
    expected = ins.model.from_unit_hypercube(lp_unit)
    for name in ins.model.names:
        np.testing.assert_allclose(lp[name], expected[name])


def test_live_points_setters_raise(ins):
    ins.populate_live_points()
    with pytest.raises(RuntimeError, match="Cannot set live points"):
        ins.live_points = ins.live_points_unit
    with pytest.raises(RuntimeError, match="Cannot set live points"):
        ins.live_points_unit = ins.live_points_unit
    # None is a no-op at sampler level
    ins.live_points = None
    ins.live_points_unit = None
    assert ins.live_points_unit is not None


def test_final_properties_before_redraw(ins):
    assert ins.final_state is None
    assert ins.final_log_evidence is None
    assert ins.final_log_evidence_error is None
    assert ins.final_samples is None
    assert ins.final_samples_unit is None


def test_final_properties_after_run(tmp_path, rng):
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    s = ImportanceNestedSampler(
        model,
        output=str(tmp_path),
        rng=rng,
        nlive=100,
        min_samples=10,
        max_iteration=2,
        plot=False,
        checkpointing=False,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64),
    )
    s.nested_sampling_loop()
    s.draw_final_samples(n_draw=200)
    assert s.final_state is not None
    assert np.isfinite(s.final_log_evidence)
    assert s.final_log_evidence == s.final_state.log_evidence
    assert s.final_log_evidence_error > 0
    unit = s.final_samples_unit
    full = s.final_samples
    assert len(unit) == len(full)
    for name in model.names:
        assert unit[name].min() >= 0.0 and unit[name].max() <= 1.0
    expected = model.from_unit_hypercube(unit)
    for name in model.names:
        np.testing.assert_allclose(full[name], expected[name])
    # result dictionary keeps the unit-space snapshot + final logZ
    d = s.get_result_dictionary()
    assert "final_samples" in d and "final_log_evidence" in d


def test_plot_trace_enable_colours(ins, tmp_path):
    """INS trace plot: per-parameter scatter vs logW, iteration colour
    axis toggled by enable_colours (reference
    ``importancesampler.py:2105-2157``)."""
    ins.populate_live_points()
    fig = ins.plot_trace(enable_colours=True)
    assert fig is not None
    fig2 = ins.plot_trace(enable_colours=False)
    assert fig2 is not None
    out = tmp_path / "trace.png"
    assert ins.plot_trace(filename=str(out)) is None
    assert out.exists()


def test_setstate_migrates_legacy_final_samples(ins):
    """Checkpoints from builds where final_samples/final_log_evidence
    were attributes must unpickle into the new property-backed form."""
    ins.populate_live_points()
    state = ins.__getstate__()
    # forge a legacy state
    legacy = dict(state)
    legacy.pop("_final_samples_unit", None)
    legacy.pop("_final_state", None)
    samples = ins.samples_unit[:50].copy()
    legacy["final_samples"] = samples
    legacy["final_log_evidence"] = -1.23
    restored = object.__new__(ImportanceNestedSampler)
    restored.__setstate__(pickle.loads(pickle.dumps(legacy)))
    assert restored.final_samples_unit is not None
    assert len(restored.final_samples_unit) == 50
    assert restored.final_state is not None
    assert np.isfinite(restored.final_log_evidence)


# ---------------------------------------------------------------------------
# sample bookkeeping parity (reference test_samples.py / test_config.py)
# ---------------------------------------------------------------------------
def test_configure_iterations_defaults(ins):
    ins.configure_iterations()
    assert ins.min_iteration == -1
    assert ins.max_iteration == np.inf
    ins.configure_iterations(min_iteration=5, max_iteration=100)
    assert ins.min_iteration == 5
    assert ins.max_iteration == 100


def test_update_sample_counts_parity(ins, rng):
    x = numpy_array_to_live_points(
        rng.standard_normal((5, 2)), ["x_0", "x_1"]
    )
    x["it"] = np.array([-1, 0, 2, 2, 2])
    ins.draw_iid_live = False
    ins.training_samples.samples = x

    class P:
        n_proposals = 5

    ins.proposal = P()
    ins.update_sample_counts()
    assert ins.sample_counts == {-1: 1, 0: 1, 1: 0, 2: 3, 3: 0}


def test_remove_samples_updates_history(ins, rng):
    x = numpy_array_to_live_points(
        rng.standard_normal((10, 2)), ["x_0", "x_1"]
    )
    x["logL"] = np.arange(10.0)
    ins.training_samples.samples = x
    ins.training_samples.is_nested = np.zeros(10, dtype=bool)
    ins.training_samples.log_likelihood_threshold = 5.0
    ins.draw_iid_live = False
    ins.initialise_history()
    out = ins.remove_samples()
    assert out == 5
    assert ins.history["n_removed"][-1] == 5


def test_compute_importance_delegates(ins):
    sentinel = {"evidence": 0.4, "posterior": 0.8}

    class Fake:
        def compute_importance(self, ratio=0.5):
            return sentinel

    ins.training_samples = Fake()
    ins.draw_iid_live = False
    assert ins.compute_importance() is sentinel

    class Other:
        def compute_importance(self, ratio=0.5):
            return {"evidence": 0.0}

    ins.iid_samples = Fake()
    ins.training_samples = Other()
    ins.draw_iid_live = True
    assert ins.compute_importance() is sentinel


def test_update_evidence_delegates(ins):
    calls = []

    class Fake:
        def __init__(self, name):
            self.name = name

        def update_evidence(self):
            calls.append(self.name)

    ins.training_samples = Fake("train")
    ins.draw_iid_live = True
    ins.iid_samples = Fake("iid")
    ins.update_evidence()
    assert calls == ["train", "iid"]


# ---------------------------------------------------------------------------
# threshold determination (reference test_threshold.py)
# ---------------------------------------------------------------------------
def _threshold_samples(n):
    samples = np.empty(n, dtype=[("x", "f8"), ("logL", "f8"), ("logW", "f8")])
    samples["logL"] = 10.0 * np.arange(n)
    samples["logW"] = -0.1 * np.arange(n)
    samples["x"] = 0.0
    return samples


@pytest.mark.parametrize("include_likelihood", [False, True])
@pytest.mark.parametrize("use_log_weights", [False, True])
def test_determine_threshold_entropy_bounds(
    ins, include_likelihood, use_log_weights
):
    samples = _threshold_samples(50)
    ins.plot = False
    n = ins.determine_threshold_entropy(
        samples,
        q=0.5,
        use_log_weights=use_log_weights,
        include_likelihood=include_likelihood,
    )
    assert 0 < n < samples.size


@pytest.mark.parametrize("include_likelihood", [False, True])
def test_determine_threshold_quantile_bounds(ins, include_likelihood):
    samples = _threshold_samples(50)
    ins.plot = False
    n = ins.determine_threshold_quantile(
        samples, q=0.8, include_likelihood=include_likelihood
    )
    assert 0 < n < samples.size


@pytest.mark.parametrize(
    "n, min_remove, min_samples, n_live, expected",
    [
        [10, 5, 8, 20, 10],
        [4, 5, 8, 20, 5],
        [15, 5, 10, 20, 10],
    ],
)
@pytest.mark.parametrize("method", ["entropy", "quantile"])
def test_determine_threshold_clamps(
    ins, monkeypatch, n, min_remove, min_samples, n_live, expected, method
):
    """Reference test_determine_threshold: min_remove/min_samples clamp
    the raw index."""
    ins.min_samples = min_samples
    ins.min_remove = min_remove
    ins.max_samples = None
    ins.draw_constant = True
    ins.nlive = n_live
    samples = _threshold_samples(n_live)
    monkeypatch.setattr(
        ins, "determine_threshold_quantile", lambda s, **k: n
    )
    monkeypatch.setattr(
        ins, "determine_threshold_entropy", lambda s, **k: n
    )
    out = ins.determine_log_likelihood_threshold(
        samples, method=method, q=0.8
    )
    assert out == samples["logL"][expected]


@pytest.mark.parametrize(
    "n_samples, n_remove, min_remove, min_samples, max_samples, n_live, "
    "expected",
    [
        [50, 10, 5, 10, 55, 30, 25],
        [56, 10, 5, 10, 55, 30, 31],
        [50, 20, 5, 10, 100, 30, 20],
        [1601, 100, 50, 50, 1600, 200, 201],
    ],
)
def test_determine_threshold_max_samples(
    ins,
    monkeypatch,
    caplog,
    n_samples,
    n_remove,
    min_remove,
    min_samples,
    max_samples,
    n_live,
    expected,
):
    ins.min_samples = min_samples
    ins.min_remove = min_remove
    ins.max_samples = max_samples
    ins.draw_constant = True
    ins.nlive = n_live
    samples = _threshold_samples(n_samples)
    monkeypatch.setattr(
        ins, "determine_threshold_entropy", lambda s, **k: n_remove
    )
    with caplog.at_level("WARNING"):
        out = ins.determine_log_likelihood_threshold(
            samples, method="entropy", q=0.8
        )
    assert out == samples["logL"][expected]
    if expected != n_remove:
        assert "Next level would have more than max samples" in caplog.text


def test_determine_threshold_invalid_method(ins):
    with pytest.raises(ValueError):
        ins.determine_log_likelihood_threshold(
            _threshold_samples(10), method="invalid"
        )


def test_update_log_likelihood_threshold_delegates(ins):
    calls = []

    class Fake:
        def __init__(self, name):
            self.name = name

        def update_log_likelihood_threshold(self, threshold):
            calls.append((self.name, threshold))

    ins.training_samples = Fake("train")
    ins.iid_samples = Fake("iid")
    ins.update_log_likelihood_threshold(10.0)
    assert ins.log_likelihood_threshold == 10.0
    assert calls == [("train", 10.0), ("iid", 10.0)]


# ---------------------------------------------------------------------------
# main-sample-set routing (reference test_samples.py)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("iid", [False, True])
def test_ordered_samples_property(ins, iid):
    ins.draw_iid_live = iid
    ins.training_samples = object()
    ins.iid_samples = object()
    expected = ins.iid_samples if iid else ins.training_samples
    assert ins._ordered_samples is expected


def test_unit_views_follow_ordered_samples(ins):
    class Fake:
        samples = "samples"
        live_points = "live"
        nested_samples = "nested"
        log_q = "log_q"

    ins.draw_iid_live = False
    ins.training_samples = Fake()
    assert ins.samples_unit == "samples"
    assert ins.live_points_unit == "live"
    assert ins.nested_samples_unit == "nested"
    assert ins.log_q == "log_q"


def test_populate_live_points_iid(ins):
    """With draw_iid_live both sets get n_initial finite samples
    (reference test_populate_live_points_iid)."""
    ins.draw_iid_live = True
    ins.n_initial = 50
    ins.populate_live_points()
    for os_ in (ins.training_samples, ins.iid_samples):
        assert len(os_.samples) == 50
        assert os_.log_q.shape == (50, 1)
        assert np.isfinite(os_.samples["logL"]).all()
        assert np.isfinite(os_.samples["logP"]).all()
    assert not np.shares_memory(
        ins.training_samples.samples, ins.iid_samples.samples
    )


# ---------------------------------------------------------------------------
# configuration surfaces (reference test_config.py / test_stopping_criteria.py)
# ---------------------------------------------------------------------------
def test_add_fields_registers_non_sampling_parameters():
    ImportanceNestedSampler.add_fields()
    for field in ("logW", "logQ", "logU"):
        assert field in config.livepoints.non_sampling_parameters


@pytest.mark.parametrize("save_log_q", [False, True])
def test_init_save_log_q_propagates(tmp_path, rng, save_log_q):
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    s = ImportanceNestedSampler(
        model,
        output=str(tmp_path),
        rng=rng,
        nlive=100,
        min_samples=10,
        save_log_q=save_log_q,
        draw_iid_live=True,
    )
    assert s.training_samples.save_log_q is save_log_q
    assert s.iid_samples.save_log_q is save_log_q


def test_check_configuration_messages(ins):
    ins.min_samples = 200
    ins.nlive = 100
    ins.min_remove = 1
    with pytest.raises(
        ValueError, match=r"`min_samples` must be less than `nlive`"
    ):
        ins.check_configuration()
    ins.min_samples = 50
    ins.min_remove = 200
    with pytest.raises(
        ValueError, match=r"`min_remove` must be less than `nlive`"
    ):
        ins.check_configuration()
    ins.min_remove = 1
    assert ins.check_configuration() is True


def test_update_output_delegates_to_proposal(ins, tmp_path):
    new = str(tmp_path / "moved")
    ins.update_output(new)
    assert ins.output == new
    assert os.path.dirname(ins.resume_file) == new
    assert ins.proposal.output == os.path.join(new, "levels", "")
    assert os.path.isdir(ins.proposal.output)


@pytest.mark.parametrize(
    "stopping_criterion, tolerance, check_criteria, mode",
    [
        ("ess", 1000, "all", "and"),
        (["ess", "log_evidence_ratio"], [1000, 0], "all", "and"),
        (["ess", "log_evidence_ratio"], [1000, 0], "any", "or"),
    ],
)
def test_configure_stopping_criterion_parity(
    ins, stopping_criterion, tolerance, check_criteria, mode
):
    ins.configure_stopping_criterion(
        stopping_criterion, tolerance, check_criteria
    )
    names = (
        [stopping_criterion]
        if isinstance(stopping_criterion, str)
        else stopping_criterion
    )
    assert ins.stopping_criteria == names
    assert ins.combined_criterion.mode == mode


@pytest.mark.parametrize("met", [False, True])
def test_reached_tolerance_delegates(ins, met):
    class Fake:
        def is_met(self, criterion):
            return met

    ins.combined_criterion = Fake()
    ins.criterion = {"ess": 1000}
    assert ins.reached_tolerance is met


# ---------------------------------------------------------------------------
# proposal management (reference test_proposal.py)
# ---------------------------------------------------------------------------
def test_get_proposal_subdir(ins, tmp_path):
    p = ins.get_proposal(
        "custom", flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1)
    )
    assert p.output == os.path.join(ins.output, "custom", "")


def test_update_proposal_weights_from_counts(ins):
    calls = []

    class P:
        def update_proposal_weights(self, weights):
            calls.append(weights)

    ins.draw_iid_live = False
    x = numpy_array_to_live_points(np.ones((10, 2)), ["x_0", "x_1"])
    ins.training_samples.samples = x
    ins.sample_counts = {-1: 2, 0: 4, 1: 4}
    ins.proposal = P()
    ins.update_proposal_weights()
    assert calls == [{-1: 0.2, 0: 0.4, 1: 0.4}]


def test_add_new_proposal_weight_table(ins):
    calls = []

    class P:
        def update_proposal_weights(self, weights):
            calls.append(weights)

    ins.draw_iid_live = False
    x = numpy_array_to_live_points(np.ones((8, 2)), ["x_0", "x_1"])
    ins.training_samples.samples = x
    ins.sample_counts = {-1: 2, 0: 3, 1: 3}
    ins.proposal = P()
    ins.add_new_proposal_weight(2, 2)
    assert ins.sample_counts[2] == 2
    assert calls == [{-1: 0.2, 0: 0.3, 1: 0.3, 2: 0.2}]


def test_add_new_proposal_weight_error(ins):
    ins.sample_counts = {-1: 2, 0: 3, 1: 3, 2: 2}
    with pytest.raises(
        RuntimeError, match="Samples already drawn from proposal 2"
    ):
        ins.add_new_proposal_weight(2, 2)


def test_result_dictionary_reference_fields(tmp_path, rng):
    """Reference test_result.py: the INS result dictionary carries the
    training/iid/bootstrap/weights fields (``importancesampler.py:2243``)."""
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    s = ImportanceNestedSampler(
        model,
        output=str(tmp_path),
        rng=rng,
        nlive=100,
        min_samples=10,
        max_iteration=2,
        plot=False,
        checkpointing=False,
        draw_iid_live=True,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=5, batch_size=64),
    )
    s.nested_sampling_loop()
    d = s.get_result_dictionary()
    for key in (
        "history",
        "training_samples",
        "training_log_evidence",
        "training_log_evidence_error",
        "training_log_posterior_weights",
        "bootstrap_log_evidence",
        "bootstrap_log_evidence_error",
        "iid_log_evidence",
        "iid_log_evidence_error",
        "log_posterior_weights",
        "proposal_importance",
        "sample_counts",
    ):
        assert key in d, key
    assert d["bootstrap_log_evidence"] is None
    assert np.isfinite(d["training_log_evidence"])
    assert len(d["log_posterior_weights"]) == len(d["nested_samples"])
    # weights are normalised by the evidence (reference evidence.py:336)
    np.testing.assert_allclose(
        d["log_posterior_weights"],
        s.state.log_posterior_weights,
    )


def test_log_posterior_weights_normalisation(ins):
    """state.log_posterior_weights = (logL + logW) - logZ
    (reference evidence.py:330-336)."""
    ins.populate_live_points()
    ins.update_evidence()
    state = ins._ordered_samples.state
    w = ins.log_posterior_weights
    s = ins.samples_unit
    expected = (s["logL"] + s["logW"]) - state.log_evidence
    np.testing.assert_allclose(w, expected)


def test_finalise_low_ess_warning(caplog):
    """A collapsed final ESS triggers the under-fitting warning
    (VALIDATION.md: INS on a curved degenerate target)."""
    from unittest.mock import MagicMock, patch

    import numpy as np

    from nessai_tpu.samplers.importancesampler import (
        ImportanceNestedSampler,
    )

    ins = ImportanceNestedSampler.__new__(ImportanceNestedSampler)
    ins.finalised = False
    ins._train_final_flow = False
    ins.draw_iid_live = False
    ins.bootstrap = False
    ins.checkpointing = False
    ins.training_samples = MagicMock()
    state = MagicMock()
    state.log_evidence = -1.0
    state.log_evidence_error = 0.1
    state.effective_n_posterior_samples = 12.0
    with patch.object(
        ImportanceNestedSampler, "state", property(lambda self: state)
    ), patch.object(
        ImportanceNestedSampler,
        "samples_unit",
        property(lambda self: np.zeros(5000)),
    ), patch.object(
        ImportanceNestedSampler, "kl_divergence", lambda self: 4.0
    ):
        with caplog.at_level("WARNING"):
            ins.finalise()
    assert any(
        "effective sample size is very low" in r.message
        for r in caplog.records
    )
    assert ins.finalised


def test_finalise_healthy_ess_no_warning(caplog):
    from unittest.mock import MagicMock, patch

    import numpy as np

    from nessai_tpu.samplers.importancesampler import (
        ImportanceNestedSampler,
    )

    ins = ImportanceNestedSampler.__new__(ImportanceNestedSampler)
    ins.finalised = False
    ins._train_final_flow = False
    ins.draw_iid_live = False
    ins.bootstrap = False
    ins.checkpointing = False
    ins.training_samples = MagicMock()
    state = MagicMock()
    state.log_evidence = -1.0
    state.log_evidence_error = 0.1
    state.effective_n_posterior_samples = 3000.0
    with patch.object(
        ImportanceNestedSampler, "state", property(lambda self: state)
    ), patch.object(
        ImportanceNestedSampler,
        "samples_unit",
        property(lambda self: np.zeros(5000)),
    ), patch.object(
        ImportanceNestedSampler, "kl_divergence", lambda self: 0.2
    ):
        with caplog.at_level("WARNING"):
            ins.finalise()
    assert not any(
        "effective sample size is very low" in r.message
        for r in caplog.records
    )
