"""Additional per-module unit tests (mirroring the reference's
tests/test_utils/* coverage)."""

import numpy as np
import pytest

from nessai_tpu.utils.multiprocessing import (
    batch_evaluate_function,
    check_vectorised_function,
    get_n_pool,
)
from nessai_tpu.utils.rescaling import (
    configure_edge_detection,
    determine_rescaled_bounds,
    gaussian_cdf,
    inverse_gaussian_cdf,
)
from nessai_tpu.utils.sorting import sort_reparameterisations
from nessai_tpu.utils.hist import auto_bins
from nessai_tpu.utils.distance import compute_minimum_distances
from nessai_tpu.utils.errors import RNGNotSetError, RNGSetError


def test_check_vectorised_function_detects():
    assert check_vectorised_function(lambda x: np.sum(x, axis=-1), np.ones((4, 2)))
    # scalar-only function (returns a scalar for the whole batch)
    assert not check_vectorised_function(
        lambda x: float(np.sum(x)), np.ones((4, 2))
    )
    with pytest.raises(ValueError):
        check_vectorised_function(lambda x: x, np.ones((1, 2)))


def test_batch_evaluate_function_paths():
    f = lambda x: np.sum(np.atleast_2d(x), axis=-1)
    x = np.arange(10, dtype=float).reshape(5, 2)
    out_vec = batch_evaluate_function(f, x, True)
    out_chunked = batch_evaluate_function(f, x, True, chunksize=2)
    out_scalar = batch_evaluate_function(
        lambda xx: np.sum(xx), x, False
    )
    np.testing.assert_allclose(out_vec, out_chunked)
    np.testing.assert_allclose(out_vec, out_scalar)


def test_get_n_pool():
    class FakePool:
        _processes = 3

    class FakeExecutor:
        _max_workers = 5

    assert get_n_pool(FakePool()) == 3
    assert get_n_pool(FakeExecutor()) == 5
    assert get_n_pool(object()) is None
    assert get_n_pool(None) is None


def test_gaussian_cdf_roundtrip():
    x = np.linspace(-3, 3, 20)
    y, lj = gaussian_cdf(x)
    x2, lj_inv = inverse_gaussian_cdf(y)
    np.testing.assert_allclose(x, x2, atol=1e-8)
    np.testing.assert_allclose(lj + lj_inv, 0.0, atol=1e-8)


def test_determine_rescaled_bounds():
    lo, hi = determine_rescaled_bounds(0, 10, 2, 8)
    # prior bounds wider than data bounds -> prime bounds outside [-1,1]
    assert lo < -1 and hi > 1
    with pytest.raises(ValueError):
        determine_rescaled_bounds(0, 10, 5, 5)


def test_configure_edge_detection():
    d = configure_edge_detection(None, True)
    assert d["allow_none"] is True
    d = configure_edge_detection({}, False)
    assert d["allow_none"] is False
    assert d["cutoff"] == 0.0


class _FakeReparam:
    def __init__(self, name, parameters, requires=None, prime=None):
        self.name = name
        self.parameters = parameters
        self.requires = requires or []
        self.prime_parameters = prime or [p + "_prime" for p in parameters]

    def __repr__(self):
        return self.name


def test_sort_reparameterisations_orders_dependencies():
    a = _FakeReparam("a", ["x"])
    b = _FakeReparam("b", ["y"], requires=["x_prime"])
    ordered = sort_reparameterisations([b, a])
    assert [r.name for r in ordered] == ["a", "b"]


def test_sort_reparameterisations_unsatisfiable():
    b = _FakeReparam("b", ["y"], requires=["nope"])
    with pytest.raises(ValueError):
        sort_reparameterisations([b])


def test_auto_bins_max():
    assert auto_bins(np.random.default_rng(0).normal(size=100000), max_bins=50) == 50


def test_compute_minimum_distances():
    x = np.array([[0.0], [1.0], [10.0]])
    d = compute_minimum_distances(x)
    np.testing.assert_allclose(d, [1.0, 1.0, 9.0])


def test_rng_errors():
    with pytest.raises(RNGNotSetError):
        raise RNGNotSetError()
    with pytest.raises(RNGSetError):
        raise RNGSetError()


def test_weighted_quantile_invalid():
    from nessai_tpu.utils.stats import weighted_quantile

    with pytest.raises(ValueError):
        weighted_quantile(np.arange(5.0), 1.5)


def test_bonferroni():
    from nessai_tpu.utils.indices import bonferroni_correction

    rejected, corrected, alpha = bonferroni_correction([0.001, 0.5])
    assert alpha == 0.025
    assert rejected[0] and not rejected[1]


def test_entry_points_loader():
    from nessai_tpu.utils.entry_points import get_entry_points

    eps = get_entry_points("console_scripts")
    assert isinstance(eps, dict)


def test_model_counters_and_chunksize(model):
    x = model.new_point(10)
    before_n = model.likelihood_evaluations
    model.likelihood_chunksize = 3
    out = model.batch_evaluate_log_likelihood(x)
    assert out.shape == (10,)
    assert model.likelihood_evaluations == before_n + 10
    assert model.likelihood_evaluation_time.total_seconds() >= 0


def test_model_new_point_log_prob(model):
    """Constant proposal density: zeros (reference ``model.py:421-439``)."""
    x = model.new_point(5)
    lp = model.new_point_log_prob(x)
    np.testing.assert_allclose(lp, np.zeros(5))


def test_model_sample_unit_hypercube(model):
    u = model.sample_unit_hypercube(7)
    assert model.in_unit_hypercube(u).all()
    lp = model.batch_evaluate_log_prior_unit_hypercube(u)
    np.testing.assert_allclose(lp, 0.0)


def test_combined_check_order_failure(rng):
    from nessai_tpu.reparameterisations import CombinedReparameterisation
    from nessai_tpu.reparameterisations.base import Reparameterisation

    class NeedsMissing(Reparameterisation):
        requires = ["not_there"]

        def reparameterise(self, x, x_prime, log_j, **kw):
            return x, x_prime, log_j

        def inverse_reparameterise(self, x, x_prime, log_j, **kw):
            return x, x_prime, log_j

    r = NeedsMissing(parameters=["a"])
    with pytest.raises(ValueError):
        CombinedReparameterisation([r])


def test_truncation_registry_errors():
    from nessai_tpu.proposal.flowproposal.truncation import (
        TruncationScheme,
        get_truncation_rule,
    )

    with pytest.raises(ValueError):
        get_truncation_rule("nope")
    scheme = TruncationScheme.from_config("min_log_q")
    assert len(scheme.rules) == 1
    scheme2 = TruncationScheme.from_config(["min_log_q", "likelihood_threshold"])
    assert scheme2.requires_log_likelihood


def test_flow_config_validation():
    from nessai_tpu.flowmodel.config import update_training_config

    with pytest.raises(ValueError):
        update_training_config({"noise_type": "bogus", "noise_scale": 0.1})
    with pytest.raises(ValueError):
        update_training_config({"batch_size": "bogus"})
    cfg = update_training_config({"batch_size": "all"})
    assert cfg.batch_size == "all"
    # reference noise semantics (nessai/flowmodel/utils.py:50-66)
    with pytest.raises(TypeError, match="Must pass a dictionary"):
        update_training_config(1.0)
    with pytest.raises(RuntimeError, match="noise_scale"):
        update_training_config({"noise_type": "adaptive"})
    with pytest.raises(TypeError, match="must be a float"):
        update_training_config({"noise_scale": "big"})
    cfg = update_training_config({"noise_scale": 0.1})
    assert cfg.noise_type == "constant"
    assert cfg.noise_scale == 0.1


def test_flow_registry_unknown():
    from nessai_tpu.flows.utils import get_native_flow_class

    with pytest.raises(ValueError):
        get_native_flow_class("not-a-flow")


def test_configure_model_requires_n_inputs():
    from nessai_tpu.flows import configure_model

    with pytest.raises(TypeError):
        configure_model(dict(n_blocks=2))


# ----------------------------------------------------------------------
# Round-3 coverage additions
# ----------------------------------------------------------------------
class TestSamplingHelpers:
    def test_draw_surface_nsphere_norms(self, rng):
        from nessai_tpu.utils.sampling import draw_surface_nsphere

        x = draw_surface_nsphere(3, r=2.0, N=500, rng=rng)
        np.testing.assert_allclose(
            np.linalg.norm(x, axis=1), 2.0, atol=1e-12
        )
        # default rng branch
        y = draw_surface_nsphere(2, N=10)
        assert y.shape == (10, 2)

    def test_draw_nsphere_within_radius(self, rng):
        from nessai_tpu.utils.sampling import draw_nsphere

        x = draw_nsphere(4, r=3.0, N=500, fuzz=1.1, rng=rng)
        assert (np.linalg.norm(x, axis=1) <= 3.3 + 1e-12).all()
        y = draw_nsphere(2, N=5)
        assert y.shape == (5, 2)

    def test_draw_uniform_and_gaussian(self, rng):
        from nessai_tpu.utils.sampling import draw_gaussian, draw_uniform

        u = draw_uniform(3, N=100, rng=rng)
        assert u.shape == (100, 3)
        assert ((u >= 0) & (u <= 1)).all()
        assert draw_uniform(2, N=4).shape == (4, 2)
        g = draw_gaussian(3, N=100, rng=rng)
        assert g.shape == (100, 3)
        assert draw_gaussian(2, N=4).shape == (4, 2)

    def test_draw_truncated_gaussian_radius(self, rng):
        from nessai_tpu.utils.sampling import draw_truncated_gaussian

        x = draw_truncated_gaussian(2, r=1.5, N=300, rng=rng)
        assert (np.linalg.norm(x, axis=1) <= 1.5 + 1e-12).all()
        assert draw_truncated_gaussian(2, r=2.0, N=5).shape == (5, 2)

    def test_compute_radius_monotonic(self):
        from nessai_tpu.utils.sampling import compute_radius

        r1 = compute_radius(2, 0.5)
        r2 = compute_radius(2, 0.95)
        r3 = compute_radius(8, 0.95)
        assert r1 < r2 < r3


class TestIOHelpers:
    def test_is_jsonable(self):
        from nessai_tpu.utils.io import is_jsonable

        assert is_jsonable({"a": 1})
        assert not is_jsonable({"a": object()})

    def test_json_encoder_types(self):
        import json

        from nessai_tpu.utils.io import NessaiJSONEncoder

        payload = {
            "i": np.int64(3),
            "f": np.float32(1.5),
            "arr": np.arange(3),
            "fn": len,
            "cls": dict,
            "obj": object(),
        }
        out = json.loads(json.dumps(payload, cls=NessaiJSONEncoder))
        assert out["i"] == 3
        assert out["f"] == 1.5
        assert out["arr"] == [0, 1, 2]
        assert "len" in out["fn"]
        assert "dict" in out["cls"]
        assert isinstance(out["obj"], str)

    def test_json_encoder_jax_array(self):
        import json

        import jax.numpy as jnp

        from nessai_tpu.utils.io import NessaiJSONEncoder

        out = json.loads(
            json.dumps({"x": jnp.arange(2)}, cls=NessaiJSONEncoder)
        )
        assert out["x"] == [0, 1]


class TestProposalBaseHelpers:
    def test_evaluate_likelihoods_and_reset(self, model, rng):
        from nessai_tpu.proposal.analytic import AnalyticProposal

        p = AnalyticProposal(model, poolsize=20, rng=rng)
        p.initialise()
        p.populate(N=20)
        assert p.populated
        p.evaluate_likelihoods()
        assert np.isfinite(p.samples["logL"]).all()
        p.reset()
        assert not p.populated
        assert len(p.samples) == 0

    def test_train_noop_logs(self, model, rng, caplog):
        import logging

        from nessai_tpu.proposal.analytic import AnalyticProposal

        p = AnalyticProposal(model, poolsize=5, rng=rng)
        # earlier tests may configure the package logger with
        # propagate=False; capture on the specific logger
        caplog.set_level(logging.DEBUG, logger="nessai_tpu.proposal.base")
        logger = logging.getLogger("nessai_tpu.proposal.base")
        old_propagate = logger.propagate
        logger.propagate = True
        try:
            p.train(None)
        finally:
            logger.propagate = old_propagate
        assert "cannot be trained" in caplog.text

    def test_getstate_drops_model_and_resume(self, model, rng):
        import pickle

        from nessai_tpu.proposal.analytic import AnalyticProposal

        p = AnalyticProposal(model, poolsize=5, rng=rng)
        s = pickle.loads(pickle.dumps(p))
        assert s.model is None
        s.resume(model)
        assert s.model is model


class TestMultiprocessingHelpers:
    def test_get_n_pool_variants(self, caplog):
        import logging
        from concurrent.futures import ThreadPoolExecutor

        from nessai_tpu.utils.multiprocessing import get_n_pool

        assert get_n_pool(None) is None
        ex = ThreadPoolExecutor(max_workers=3)
        assert get_n_pool(ex) == 3
        ex.shutdown()

        class Weird:
            pass

        with caplog.at_level(logging.WARNING):
            assert get_n_pool(Weird()) is None
        assert "Could not determine" in caplog.text

    def test_check_start_method_warns_on_spawn(self, caplog, monkeypatch):
        import logging

        import nessai_tpu.utils.multiprocessing as mp_utils

        monkeypatch.setattr(
            mp_utils.multiprocessing,
            "get_start_method",
            lambda allow_none=True: "spawn",
        )
        with caplog.at_level(logging.WARNING):
            mp_utils.check_multiprocessing_start_method()
        assert "fork" in caplog.text

    def test_wrappers_use_global_model(self, model):
        from nessai_tpu.utils.multiprocessing import (
            initialise_pool_variables,
            log_likelihood_wrapper,
            log_prior_unit_hypercube_wrapper,
            log_prior_wrapper,
        )

        initialise_pool_variables(model)
        x = model.new_point(3)
        np.testing.assert_allclose(
            log_likelihood_wrapper(x), model.log_likelihood(x)
        )
        np.testing.assert_allclose(
            log_prior_wrapper(x), model.log_prior(x)
        )
        u = model.to_unit_hypercube(x)
        np.testing.assert_allclose(
            log_prior_unit_hypercube_wrapper(u),
            model.log_prior_unit_hypercube(u),
        )

    def test_batch_evaluate_chunked_vectorised(self):
        from nessai_tpu.utils.multiprocessing import batch_evaluate_function

        calls = []

        def f(x):
            calls.append(len(x))
            return np.asarray(x, float).sum(axis=-1)

        x = np.arange(10.0)[:, None]
        out = batch_evaluate_function(f, x, True, chunksize=4)
        np.testing.assert_allclose(out, x.ravel())
        assert calls == [4, 4, 2]

    def test_batch_evaluate_pooled_scalar_and_vectorised(self):
        from nessai_tpu.utils.multiprocessing import batch_evaluate_function

        class FakePool:
            def map(self, fn, items):
                return [fn(i) for i in items]

        x = np.arange(6.0)[:, None]
        out = batch_evaluate_function(
            lambda r: float(np.sum(r)),
            x,
            False,
            pool=FakePool(),
            n_pool=2,
        )
        np.testing.assert_allclose(out, x.ravel())
        out2 = batch_evaluate_function(
            lambda b: np.sum(b, axis=-1),
            x,
            True,
            pool=FakePool(),
            n_pool=2,
        )
        np.testing.assert_allclose(out2, x.ravel())

    def test_check_vectorised_function_input_validation(self):
        from nessai_tpu.utils.multiprocessing import (
            check_vectorised_function,
        )

        with pytest.raises(ValueError, match="length <= 1"):
            check_vectorised_function(lambda x: x, np.zeros(1))


class TestRescalingBranches:
    def test_determine_rescaled_bounds_inversion_branches(self):
        from nessai_tpu.utils.rescaling import determine_rescaled_bounds

        # reference-exact semantics: under inversion the rescaling maps
        # onto [0, 1] (rescale_bounds ignored) then reflects at the edge
        base = dict(prior_min=0.0, prior_max=1.0, x_min=0.0, x_max=1.0)
        lo, hi = determine_rescaled_bounds(**base)
        assert (lo, hi) == (-1.0, 1.0)
        lo, hi = determine_rescaled_bounds(**base, inversion=True)
        assert (lo, hi) == (-1.0, 1.0)
        lo, hi = determine_rescaled_bounds(
            **base, inversion=True, invert="upper"
        )
        assert (lo, hi) == (-1.0, 1.0)
        lo, hi = determine_rescaled_bounds(
            **base, inversion=True, invert="lower"
        )
        assert (lo, hi) == (-1.0, 1.0)
        lo, hi = determine_rescaled_bounds(
            **base, inversion=True, invert="both"
        )
        assert (lo, hi) == (-0.5, 1.5)
        with pytest.raises(ValueError, match="Invalid value for `invert`"):
            determine_rescaled_bounds(
                **base, inversion=True, invert="sideways"
            )
        with pytest.raises(ValueError, match="equal"):
            determine_rescaled_bounds(0.0, 1.0, 0.5, 0.5)

    def test_get_jax_rescaling_unknown_returns_none(self):
        from nessai_tpu.utils.rescaling import get_jax_rescaling

        assert get_jax_rescaling("nope") is None

    def test_get_jax_rescaling_forward_pairs_roundtrip(self):
        import jax.numpy as jnp

        from nessai_tpu.utils.rescaling import get_jax_rescaling

        x = jnp.linspace(0.05, 0.95, 7)
        for name in ("logit", "log", "gaussian_cdf", "inv_gaussian_cdf"):
            fwd, inv = get_jax_rescaling(name)
            y, lj = fwd(x)
            x2, lj_inv = inv(y)
            np.testing.assert_allclose(
                np.asarray(x2), np.asarray(x), atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(lj + lj_inv), 0.0, atol=2e-4
            )


class TestHistBranches:
    def test_auto_bins_degenerate_iqr(self):
        from nessai_tpu.utils.hist import auto_bins

        x = np.concatenate([np.zeros(50), [1.0]])
        assert auto_bins(x) >= 1
        with pytest.raises(RuntimeError):
            auto_bins(np.array([]))


class TestStructuresBranches:
    def test_get_subset_arrays_and_inverse_indices(self, rng):
        from nessai_tpu.utils.structures import (
            array_split_chunksize,
            get_inverse_indices,
            get_subset_arrays,
            isfinite_struct,
        )

        a = np.arange(10)
        b = np.arange(10) * 2.0
        idx = np.array([1, 3, 5])
        sa, sb = get_subset_arrays(idx, a, b)
        np.testing.assert_array_equal(sa, [1, 3, 5])
        np.testing.assert_array_equal(sb, [2.0, 6.0, 10.0])
        # single array
        (only,) = (get_subset_arrays(idx, a),)
        chunks = array_split_chunksize(np.arange(10), 4)
        assert [len(c) for c in chunks] == [4, 4, 2]
        with pytest.raises(ValueError):
            array_split_chunksize(np.arange(4), 0)
        inv = get_inverse_indices(6, np.array([0, 2, 4]))
        np.testing.assert_array_equal(inv, [1, 3, 5])
        from nessai_tpu.livepoint import empty_structured_array

        x = empty_structured_array(3, names=["a"])
        x["a"] = [1.0, np.inf, 2.0]
        fin = isfinite_struct(x, names=["a"])
        np.testing.assert_array_equal(fin, [True, False, True])


@pytest.mark.parametrize(
    "name", ["logit", "log", "gaussian_cdf", "inv_gaussian_cdf"]
)
@pytest.mark.parametrize("direction", ["forward", "inverse"])
def test_jax_rescaling_matches_host(name, direction):
    """The jnp rescaling pairs must match the host numpy pairs value-
    and Jacobian-wise (the fused populate path depends on it)."""
    import jax.numpy as jnp

    from nessai_tpu.utils.rescaling import (
        get_jax_rescaling,
        rescaling_functions,
    )

    host = rescaling_functions[name][0 if direction == "forward" else 1]
    dev = get_jax_rescaling(name)[0 if direction == "forward" else 1]
    if name in ("logit",) and direction == "forward":
        x = np.linspace(0.05, 0.95, 11)
    elif name == "inv_gaussian_cdf" and direction == "forward":
        x = np.linspace(0.05, 0.95, 11)
    elif name == "log" and direction == "forward":
        x = np.linspace(0.1, 3.0, 11)
    elif name == "gaussian_cdf" and direction == "inverse":
        x = np.linspace(0.05, 0.95, 11)
    else:
        x = np.linspace(-2.0, 2.0, 11)
    y_h, lj_h = host(x)
    y_d, lj_d = dev(jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(np.asarray(y_d), y_h, atol=3e-5)
    np.testing.assert_allclose(np.asarray(lj_d), lj_h, atol=3e-4)


def test_draw_gaussian_temperature():
    from nessai_tpu.utils.sampling import draw_gaussian

    rng = np.random.default_rng(0)
    hot = draw_gaussian(2, N=20000, rng=rng, temperature=4.0)
    assert hot.shape == (20000, 2)
    assert 1.8 < hot.std() < 2.2


def test_configure_threads_pytorch_alias():
    from nessai_tpu.utils.threading import configure_threads

    configure_threads(pytorch_threads=2)
    configure_threads()


def test_reference_entry_point_groups_scanned(monkeypatch):
    """Plugins registered under the REFERENCE group names
    (``nessai.proposals`` / ``nessai.reparameterisations``,
    ``nessai/proposal/utils.py:98``) are discovered, and the native
    group wins on a name clash."""
    from nessai_tpu.proposal import utils as putils
    from nessai_tpu.proposal.flowproposal import FlowProposal

    class _EP:
        def __init__(self, name, obj):
            self.name = name
            self._obj = obj

        def load(self):
            return self._obj

    class RefPluginProposal(FlowProposal):
        pass

    class NativePluginProposal(FlowProposal):
        pass

    def fake_get_entry_points(group):
        if group == "nessai.proposals":
            return {
                "refplugin": _EP("refplugin", RefPluginProposal),
                "clash": _EP("clash", RefPluginProposal),
            }
        if group == "nessai_tpu.proposals":
            return {"clash": _EP("clash", NativePluginProposal)}
        return {}

    import nessai_tpu.utils.entry_points as ep_mod

    monkeypatch.setattr(ep_mod, "get_entry_points", fake_get_entry_points)
    found = putils.available_external_flow_proposal_classes(load=True)
    assert found["refplugin"] is RefPluginProposal
    assert found["clash"] is NativePluginProposal
    assert putils.get_flow_proposal_class("refplugin") is RefPluginProposal
