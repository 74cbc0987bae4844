"""Round-3 parity tail: public surfaces flagged by the API audit.

Covers ``FlowSampler.run``'s explicit signature
(``nessai/flowsampler.py:315``), ``BaseFlowProposal.configure_poolsize``
(``flowproposal/base.py:294``), the internal-prime-space properties
(``flowproposal/base.py:249-267``), ``FlowModel.check_batch_size``'s
reference call form (``flowmodel/base.py:195``) and
``optimiser_kwargs`` (``:138``), the clustering label helpers
(``experimental/flowmodel/clustering.py:91-104``) and the MCMC
``plot_chain``/``plot_history`` diagnostics
(``experimental/proposal/mcmc/proposal.py:63-89``).
"""

import inspect
import os

import numpy as np
import pytest

from nessai_tpu.experimental.flowmodel.clustering import ClusteringFlowModel
from nessai_tpu.experimental.proposal.mcmc import MCMCFlowProposal
from nessai_tpu.flowmodel.base import FlowModel
from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.proposal.flowproposal import FlowProposal


def test_flowsampler_run_signature():
    params = inspect.signature(FlowSampler.run).parameters
    for name in ("plot", "save", "posterior_sampling_method", "close_pool"):
        assert name in params
    assert params["plot"].default is True
    assert params["save"].default is True


def test_configure_poolsize_none_raises(model, rng, tmp_path):
    with pytest.raises(RuntimeError, match="poolsize"):
        FlowProposal(
            model, output=str(tmp_path), rng=rng, plot=False
        ).configure_poolsize(None, True, 10)


def test_configure_poolsize_sets_values(model, rng, tmp_path):
    fp = FlowProposal(model, output=str(tmp_path), rng=rng, plot=False)
    fp.configure_poolsize(123, False, 5)
    assert fp.poolsize == 123
    assert fp.update_poolsize is False
    assert fp.max_poolsize_scale == 5


def test_internal_prime_parameters(model, rng, tmp_path):
    fp = FlowProposal(
        model, output=str(tmp_path), rng=rng, plot=False, poolsize=100
    )
    fp.set_rescaling()
    assert fp.internal_prime_parameters == fp.prime_parameters
    assert fp.x_prime_internal_dtype == fp.x_prime_dtype


@pytest.fixture()
def flow_model(tmp_path, rng):
    return FlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=2, batch_size=64),
        output=str(tmp_path),
        rng=rng,
    )


def test_check_batch_size_reference_form(flow_model):
    x = np.zeros((100, 2))
    # reference contract: batch size of one is always invalid
    with pytest.raises(ValueError, match="batch size of 1"):
        flow_model.check_batch_size(x, 1)
    bs = flow_model.check_batch_size(x, 50)
    assert bs >= 32
    # integer count form still accepted
    assert flow_model.check_batch_size(100) == flow_model.check_batch_size(x)


def test_optimiser_kwargs_property(flow_model):
    assert flow_model.optimiser_kwargs == {}
    flow_model.training_config.optimiser_kwargs = {"b1": 0.8}
    assert flow_model.optimiser_kwargs == {"b1": 0.8}


def test_clustering_label_helpers(tmp_path, rng):
    fm = ClusteringFlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=1, batch_size=64),
        output=str(tmp_path),
        rng=rng,
        max_clusters=4,
    )
    x = np.concatenate(
        [
            rng.normal(-3, 0.3, (64, 2)),
            rng.normal(3, 0.3, (64, 2)),
        ]
    )
    fm.train_clustering(x)
    labels = fm.get_cluster_labels(x)
    assert labels.shape == (128, 1)
    assert labels.max() < fm.n_clusters
    sampled = fm.sample_cluster_labels(16)
    assert sampled.shape == (16, 1)
    assert sampled.max() < fm.n_clusters


def test_mcmc_plot_history(model, rng, tmp_path):
    fp = MCMCFlowProposal(
        model, output=str(tmp_path), rng=rng, plot=False, poolsize=100
    )
    fp.mcmc_history["acceptance"] = [0.5, 0.4]
    fp.mcmc_history["n_steps"] = [10, 12]
    fp.plot_history()
    assert os.path.exists(os.path.join(str(tmp_path), "mcmc_history.png"))


def test_mcmc_plot_chain(model, rng, tmp_path):
    fp = MCMCFlowProposal(
        model, output=str(tmp_path), rng=rng, plot=False, poolsize=100
    )
    chains = rng.normal(size=(6, 8, 2))
    fp.plot_chain(chains)
    assert os.path.exists(
        os.path.join(str(tmp_path), f"chain_{fp.populated_count}.png")
    )


# ---------------------------------------------------------------------------
# Truncation module reference surfaces (``truncation.py:15-152, 169-482``)
# ---------------------------------------------------------------------------

from nessai_tpu.proposal.flowproposal import truncation as trunc


def test_normalise_truncation_methods():
    assert trunc.normalise_truncation_methods() == []
    assert trunc.normalise_truncation_methods("latent_radius") == [
        "latent_radius"
    ]
    assert trunc.normalise_truncation_methods(
        truncation_methods=["a", "b", "a"]
    ) == ["a", "b"]


def test_build_truncation_methods():
    with pytest.raises(ValueError, match="only one"):
        trunc.build_truncation_methods("a", ["b"])
    methods = trunc.build_truncation_methods(
        truncate_log_q=True,
        enforce_likelihood_threshold=True,
        default_latent_radius=True,
    )
    assert methods == ["latent_radius", "min_log_q", "likelihood_threshold"]
    assert trunc.build_truncation_methods(
        latent_radius_kwargs={"fuzz": 1.1}
    ) == ["latent_radius"]
    assert trunc.should_enable_latent_radius({"fuzz": 1.1})
    assert not trunc.should_enable_latent_radius(None)


def test_apply_default_truncation_config():
    methods, kwargs = trunc.apply_default_truncation_config(
        [], default_latent_radius=True
    )
    assert methods == ["latent_radius"]
    assert kwargs["latent_radius"]["mode"] == "constant_volume"
    # user values win over defaults
    _, kwargs = trunc.apply_default_truncation_config(
        ["latent_radius"], {"latent_radius": {"q": 0.9}}
    )
    assert kwargs["latent_radius"]["q"] == 0.9


def test_normalise_truncation_kwargs():
    assert trunc.normalise_truncation_kwargs() == {}
    # flat kwargs nest under the single method
    out = trunc.normalise_truncation_kwargs(
        truncation_method="latent_radius", truncation_kwargs={"fuzz": 1.2}
    )
    assert out == {"latent_radius": {"fuzz": 1.2}}
    # already-nested kwargs pass through
    nested = {"latent_radius": {"fuzz": 1.2}}
    assert trunc.normalise_truncation_kwargs(
        truncation_kwargs=nested
    ) == nested


def test_deprecated_latent_radius_helpers():
    kw = dict.fromkeys(trunc.LEGACY_LATENT_RADIUS_ARGUMENTS)
    kw["fuzz"] = 1.5
    kw["min_radius"] = 2.0
    assert trunc.get_deprecated_latent_radius_arguments(**kw) == [
        "fuzz",
        "min_radius",
    ]
    assert trunc.get_deprecated_latent_radius_kwargs(**kw) == {
        "fuzz": 1.5,
        "min_radius": 2.0,
    }


def test_get_truncation_rule_class():
    assert (
        trunc.get_truncation_rule_class("latent_radius")
        is trunc.LatentRadiusTruncation
    )
    with pytest.raises(ValueError, match="Unknown truncation rule"):
        trunc.get_truncation_rule_class("nope")


def test_latent_radius_reference_aliases():
    rule = trunc.LatentRadiusTruncation(
        radius_mode="constant_volume", volume_fraction=0.9
    )
    assert rule.mode == "constant_volume"
    assert rule.constant_volume_mode
    assert rule.volume_fraction == 0.9
    assert rule.radius_mode == "constant_volume"
    fixed = trunc.LatentRadiusTruncation(fixed_radius=3.0)
    assert fixed.mode == "fixed"
    assert fixed.fixed_radius == 3.0
    assert trunc.LatentRadiusTruncation().fixed_radius is False
    kw = rule.to_kwargs()
    rebuilt = trunc.LatentRadiusTruncation(**kw)
    assert rebuilt.mode == rule.mode and rebuilt.q == rule.q


def test_rule_threshold_properties():
    assert trunc.LatentRadiusTruncation(mode="adaptive").threshold is None
    rule = trunc.LatentRadiusTruncation(mode="fixed", radius=2.0, fuzz=1.5)

    class _P:
        prime_dims = 2
        rng = np.random.default_rng(0)
        r = None

    rule.prepare(_P(), None)
    assert rule.threshold == pytest.approx(2.0 * 1.5)
    mq = trunc.MinLogQTruncation(threshold=-5.0)
    assert mq.min_log_q is None
    mq.prepare(None, None)
    assert mq.min_log_q == -5.0
    lt = trunc.LikelihoodThresholdTruncation()
    assert lt.threshold == -np.inf


def test_configure_applies_expansion_fraction():
    rule = trunc.LatentRadiusTruncation(expansion_fraction=3.0)

    class _P:
        prime_dims = 2

    scheme = trunc.TruncationScheme([rule])
    scheme.configure(_P())
    assert rule.fuzz == pytest.approx(4.0**0.5)


def test_configure_truncation_latent_radius_kwargs(model, rng, tmp_path):
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        rng=rng,
        plot=False,
        poolsize=100,
        latent_radius_kwargs={
            "radius_mode": "constant_volume",
            "volume_fraction": 0.9,
        },
    )
    rule = fp.truncation.get_rule("latent_radius")
    assert rule.mode == "constant_volume"
    assert rule.q == 0.9


def test_configure_truncation_default_latent_radius(model, rng, tmp_path):
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        rng=rng,
        plot=False,
        poolsize=100,
        constant_volume_mode=False,
        default_latent_radius=True,
    )
    rule = fp.truncation.get_rule("latent_radius")
    assert rule.mode == "constant_volume"
    assert rule.q == 0.95


def test_reference_parameter_names():
    """Parameter names flagged by the API audit match the reference."""
    from nessai_tpu.proposal.utils import (
        check_proposal_kwargs,
        get_flow_proposal_class,
    )
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    assert "ProposalClass" in inspect.signature(
        check_proposal_kwargs
    ).parameters
    assert "proposal_class" in inspect.signature(
        get_flow_proposal_class
    ).parameters
    assert "flow_proposal_class" in inspect.signature(
        NestedSampler.configure_flow_proposal
    ).parameters
    params = inspect.signature(
        NestedSampler.configure_uninformed_proposal
    ).parameters
    assert "maximum_uninformed" in params
    assert "uninformed_acceptance_threshold" in params


def test_get_cluster_labels_with_clusterer(tmp_path, rng):
    fm = ClusteringFlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=1, batch_size=64),
        output=str(tmp_path),
        rng=rng,
        max_clusters=4,
    )
    centres = np.array([[-3.0, -3.0], [3.0, 3.0]])
    x = np.array([[-2.9, -3.1], [3.2, 2.8]])
    labels = fm.get_cluster_labels(x, clusterer=centres)
    assert labels.ravel().tolist() == [0, 1]


# ----------------------------------------------------------------------
# Reference class-name surfaces (audit batch: class aliases)
# ----------------------------------------------------------------------
def test_stopping_criterion_reference_class_names():
    """Reference ``stopping_criteria.py:161-245`` exposes criterion
    classes under their canonical names; plugins subclass them."""
    import nessai_tpu.stopping_criteria as sc

    assert sc.LogEvidenceRatio is sc.Ratio
    assert sc.LogEvidenceRatioNestedSamples is sc.RatioNS
    assert sc.EvidenceError is sc.ZErr
    assert sc.DifferenceLogEvidence is sc.DeltaLogZ
    # subclassable like the reference classes
    class MyCriterion(sc.LogEvidenceRatio):
        pass

    assert MyCriterion.name == "log_evidence_ratio"


def test_base_truncation_rule_alias():
    """Reference ``truncation.py:155`` names the rule base
    ``BaseTruncationRule``."""
    from nessai_tpu.proposal.flowproposal.truncation import (
        BaseTruncationRule,
        LatentRadiusTruncation,
        TruncationRule,
    )

    assert BaseTruncationRule is TruncationRule
    assert issubclass(LatentRadiusTruncation, BaseTruncationRule)


def test_identity_reparameterisation_reference_surface():
    """Reference ``null.py:13`` names the class
    ``IdentityReparameterisation`` with ``NullReparameterisation`` as an
    alias, and accepts the multi-space kwargs."""
    import numpy as np

    from nessai_tpu.livepoint import numpy_array_to_live_points
    from nessai_tpu.reparameterisations import (
        IdentityReparameterisation,
        NullReparameterisation,
    )

    assert NullReparameterisation is IdentityReparameterisation
    r = IdentityReparameterisation(
        input_parameters=["x"], prior_bounds={"x": [0, 1]}
    )
    assert r.parameters == ["x"]
    x = numpy_array_to_live_points(np.array([[0.3]]), ["x"])
    xp = x.copy()
    _, xp, lj = r.reparameterise(x, xp, np.zeros(1))
    assert xp["x"][0] == x["x"][0]


def test_optimise_meta_proposal_weights_reference_signature():
    """Reference ``utils/optimise.py:16``: first argument is the
    structured samples array; initial weights default to per-iteration
    draw counts."""
    import numpy as np

    from nessai_tpu.utils.optimise import optimise_meta_proposal_weights

    rng = np.random.default_rng(42)
    n = 300
    samples = np.zeros(
        n, dtype=[("logL", "f8"), ("logQ", "f8"), ("it", "i4")]
    )
    samples["logL"] = rng.standard_normal(n)
    samples["logQ"] = 0.0
    samples["it"] = np.repeat([0, 1, 2], n // 3)
    log_q = rng.standard_normal((n, 3))
    # keyword call exactly as the reference signature allows
    w = optimise_meta_proposal_weights(
        samples=samples, log_q=log_q, method="SLSQP"
    )
    assert w.shape == (3,)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    # legacy positional order still works (plain logL + weights 3rd)
    w2 = optimise_meta_proposal_weights(
        samples["logL"], log_q, np.ones(3) / 3
    )
    np.testing.assert_allclose(w2.sum(), 1.0, atol=1e-6)


def test_external_proposal_entry_points(monkeypatch):
    """Entry-point plugin proposals resolve by name and load on demand
    (reference ``proposal/utils.py:97-130``)."""
    from nessai_tpu.proposal import utils as putils
    from nessai_tpu.proposal.flowproposal.base import BaseFlowProposal

    class FakeProposal(BaseFlowProposal):
        pass

    class FakeEP:
        name = "myplugin"

        def load(self):
            return FakeProposal

    monkeypatch.setattr(
        "nessai_tpu.utils.entry_points.get_entry_points",
        lambda group: {"myplugin": FakeEP()} if "proposals" in group else {},
    )
    ext = putils.available_external_flow_proposal_classes()
    assert list(ext) == ["myplugin"]
    loaded = putils.available_external_flow_proposal_classes(load=True)
    assert loaded["myplugin"] is FakeProposal
    assert putils.get_flow_proposal_class("myplugin") is FakeProposal


def test_get_flow_proposal_class_invalid_type():
    from nessai_tpu.proposal.utils import get_flow_proposal_class

    with pytest.raises(TypeError, match="Invalid flow class"):
        get_flow_proposal_class(12345)
    with pytest.raises(ValueError, match="Unknown flow class"):
        get_flow_proposal_class("definitely-not-a-proposal")


def test_method_signature_parity_batch():
    """Public-method kwarg names match the reference where classes share
    names (final audit batch: train output, update_weights_path,
    IFP rescale/to_prime/resume, yield_sample, rejection
    compute_weights, ScaleAndShift.update)."""
    import inspect

    from nessai_tpu.flowmodel.base import FlowModel
    from nessai_tpu.flowmodel.importance import ImportanceFlowModel
    from nessai_tpu.proposal.importance import ImportanceFlowProposal
    from nessai_tpu.proposal.rejection import RejectionProposal
    from nessai_tpu.reparameterisations.rescale import ScaleAndShift
    from nessai_tpu.samplers.nestedsampler import NestedSampler

    assert "output" in inspect.signature(FlowModel.train).parameters
    p = inspect.signature(ImportanceFlowModel.update_weights_path).parameters
    assert list(p)[1:3] == ["weights_path", "n"]
    assert "x" in inspect.signature(ImportanceFlowProposal.rescale).parameters
    assert "x" in inspect.signature(ImportanceFlowProposal.to_prime).parameters
    assert (
        "training_config"
        in inspect.signature(ImportanceFlowProposal.resume).parameters
    )
    assert (
        "oldparam" in inspect.signature(NestedSampler.yield_sample).parameters
    )
    assert (
        "return_log_prior"
        in inspect.signature(RejectionProposal.compute_weights).parameters
    )
    assert "x_prime" in inspect.signature(ScaleAndShift.update).parameters


def test_rejection_compute_weights_return_log_prior(rng):
    import numpy as np

    from nessai_tpu.proposal.rejection import RejectionProposal
    from nessai_tpu.utils.testing import IntegrationTestModel

    model = IntegrationTestModel(2)
    model.set_rng(rng)
    rp = RejectionProposal(model, poolsize=50, rng=rng)
    x = model.new_point(20)
    log_w, log_p = rp.compute_weights(x, return_log_prior=True)
    np.testing.assert_allclose(log_p, model.batch_evaluate_log_prior(x))
    np.testing.assert_allclose(
        log_w, rp.compute_weights(x), atol=1e-12
    )
