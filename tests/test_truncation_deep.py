"""Deep coverage of the truncation rules and scheme staging.

Reference: ``nessai/proposal/flowproposal/truncation.py`` and its tests.
"""

import numpy as np
import pytest
from scipy import stats as scipy_stats

from nessai_tpu.livepoint import empty_structured_array
from nessai_tpu.proposal.flowproposal.truncation import (
    LatentRadiusTruncation,
    LikelihoodThresholdTruncation,
    MinLogQTruncation,
    TruncationScheme,
    get_truncation_rule,
)


class FakeProposal:
    prime_dims = 3
    training_latent = None
    training_log_q = None

    def __init__(self, rng):
        self.rng = rng
        self.r = None


@pytest.fixture()
def proposal(rng):
    return FakeProposal(rng)


def test_unknown_rule_name():
    with pytest.raises(ValueError, match="Unknown truncation rule"):
        get_truncation_rule("not-a-rule")


def test_unknown_mode():
    with pytest.raises(ValueError, match="Unknown latent_radius mode"):
        LatentRadiusTruncation(mode="bogus")


def test_fixed_mode_requires_radius(proposal):
    rule = LatentRadiusTruncation(mode="fixed")
    with pytest.raises(RuntimeError, match="fixed mode requires"):
        rule.prepare(proposal, None)


def test_fixed_mode_radius(proposal):
    rule = LatentRadiusTruncation(mode="fixed", radius=2.5)
    rule.prepare(proposal, None)
    assert rule.r == 2.5
    assert proposal.r == 2.5
    z = rule.sample_latent(proposal, 500)
    assert z.shape == (500, 3)
    assert (np.linalg.norm(z, axis=1) <= 2.5 + 1e-9).all()


def test_constant_volume_radius_matches_chi(proposal):
    rule = LatentRadiusTruncation(mode="constant_volume", q=0.95)
    rule.prepare(proposal, None)
    assert np.isclose(rule.r, scipy_stats.chi.ppf(0.95, 3))


def test_adaptive_requires_training(proposal):
    rule = LatentRadiusTruncation(mode="adaptive")
    with pytest.raises(RuntimeError, match="adaptive latent radius"):
        rule.prepare(proposal, None)


def test_adaptive_radius_and_expansion(proposal, rng):
    proposal.training_latent = rng.normal(size=(100, 3))
    rule = LatentRadiusTruncation(mode="adaptive", expansion_fraction=4.0)
    rule.prepare(proposal, None)
    r_max = np.linalg.norm(proposal.training_latent, axis=1).max()
    assert np.isclose(rule.r, r_max)
    # fuzz expands the volume by (1 + expansion_fraction)
    assert np.isclose(rule.fuzz, 5.0 ** (1 / 3))


def test_radius_clamped_to_max(proposal):
    rule = LatentRadiusTruncation(mode="fixed", radius=100.0, max_radius=10.0)
    rule.prepare(proposal, None)
    assert rule.r == 10.0


def test_radius_clamped_to_min(proposal):
    rule = LatentRadiusTruncation(
        mode="fixed", radius=0.1, min_radius=1.0
    )
    rule.prepare(proposal, None)
    assert rule.r == 1.0


def test_explicit_radius_overrides(proposal):
    rule = LatentRadiusTruncation(mode="fixed", radius=2.0)
    rule.prepare(proposal, None, radius=3.0)
    assert rule.r == 3.0


def test_apply_latent_filters(proposal):
    rule = LatentRadiusTruncation(mode="fixed", radius=1.0)
    rule.prepare(proposal, None)
    z = np.array([[0.1, 0, 0], [5.0, 0, 0], [0, 0.5, 0]])
    out = rule.apply_latent(proposal, z)
    assert len(out) == 2


def test_latent_radius_reset(proposal):
    rule = LatentRadiusTruncation(mode="constant_volume")
    rule.prepare(proposal, None)
    rule.reset()
    assert rule._dist is None
    assert rule.r is None
    # fixed mode keeps its radius on reset
    rule2 = LatentRadiusTruncation(mode="fixed", radius=2.0)
    rule2.prepare(proposal, None)
    rule2.reset()
    assert rule2.r == 2.0


def test_truncated_gaussian_radial_law(rng):
    """The exact truncated sampler reproduces the chi radial CDF."""
    from nessai_tpu.utils.sampling import NDimensionalTruncatedGaussian

    dims, radius = 4, 2.0
    dist = NDimensionalTruncatedGaussian(dims, radius, rng=rng)
    z = dist.sample(20000)
    r = np.linalg.norm(z, axis=1)
    assert (r <= radius + 1e-9).all()
    # K-S against the truncated chi distribution
    cdf_max = scipy_stats.chi.cdf(radius, dims)
    u = scipy_stats.chi.cdf(r, dims) / cdf_max
    ks = scipy_stats.kstest(u, "uniform")
    assert ks.pvalue > 1e-3


# ----------------------------------------------------------------------
def test_min_log_q_threshold(proposal):
    rule = MinLogQTruncation(threshold=-5.0)
    rule.prepare(proposal, None)
    x = empty_structured_array(3, names=["a"])
    log_q = np.array([-10.0, -4.0, -5.0])
    z = np.zeros((3, 2))
    x2, lq2, z2 = rule.apply_after_backward(proposal, x, log_q, z)
    assert len(x2) == 2
    np.testing.assert_array_equal(lq2, [-4.0, -5.0])


def test_min_log_q_from_training(proposal):
    proposal.training_log_q = np.array([-3.0, -7.0, -1.0])
    rule = MinLogQTruncation()
    rule.prepare(proposal, None)
    assert rule._min_log_q == -7.0
    rule.reset()
    assert rule._min_log_q is None


def test_min_log_q_requires_training(proposal):
    rule = MinLogQTruncation()
    with pytest.raises(RuntimeError, match="min_log_q requires"):
        rule.prepare(proposal, None)


def test_likelihood_threshold(proposal):
    rule = LikelihoodThresholdTruncation()
    assert rule.requires_log_likelihood
    worst = empty_structured_array(1, names=["a"])
    worst["logL"] = -2.0
    rule.prepare(proposal, worst[0])
    x = empty_structured_array(3, names=["a"])
    x["logL"] = [-3.0, -1.0, -2.0]
    x2, _, _ = rule.apply_after_likelihood(
        proposal, x, np.zeros(3), np.zeros((3, 2))
    )
    assert len(x2) == 1
    assert x2["logL"][0] == -1.0


def test_likelihood_threshold_no_worst(proposal):
    rule = LikelihoodThresholdTruncation()
    rule.prepare(proposal, None)
    assert rule._threshold == -np.inf


# ----------------------------------------------------------------------
def test_scheme_from_config_variants(rng):
    assert TruncationScheme.from_config(None, rng=rng).rules == []
    s1 = TruncationScheme.from_config("likelihood_threshold", rng=rng)
    assert len(s1.rules) == 1
    s2 = TruncationScheme.from_config(
        ["min_log_q", "likelihood_threshold"], rng=rng
    )
    assert len(s2.rules) == 2
    s3 = TruncationScheme.from_config(
        {"latent_radius": {"mode": "fixed", "radius": 1.0}}, rng=rng
    )
    assert s3.rules[0].radius == 1.0
    assert s3.rules[0].rng is rng
    # passthrough of an existing scheme
    assert TruncationScheme.from_config(s3, rng=rng) is s3
    with pytest.raises(ValueError):
        TruncationScheme.from_config("bogus", rng=rng)


def test_scheme_requires_log_likelihood(rng):
    s = TruncationScheme.from_config(
        ["min_log_q", "likelihood_threshold"], rng=rng
    )
    assert s.requires_log_likelihood
    s2 = TruncationScheme.from_config("min_log_q", rng=rng)
    assert not s2.requires_log_likelihood


def test_scheme_first_latent_sampler_wins(proposal, rng):
    s = TruncationScheme.from_config(
        {
            "min_log_q": {"threshold": -1e9},
            "latent_radius": {"mode": "fixed", "radius": 2.0},
        },
        rng=rng,
    )
    s.prepare(proposal, None)
    z = s.sample_latent(proposal, 10)
    assert z.shape == (10, 3)
    # no sampler rules -> None (use the flow base)
    s2 = TruncationScheme.from_config("min_log_q", rng=rng)
    s2.rules[0]._min_log_q = 0.0
    assert s2.sample_latent(proposal, 5) is None


def test_scheme_rule_names_has_get_add():
    """Reference: ``truncation.py:456-480``."""
    from nessai_tpu.proposal.flowproposal.truncation import (
        LikelihoodThresholdTruncation,
        MinLogQTruncation,
        TruncationScheme,
    )

    scheme = TruncationScheme([MinLogQTruncation(quantile=0.5)])
    assert scheme.rule_names == ["min_log_q"]
    assert scheme.has_rule("min_log_q")
    assert not scheme.has_rule("latent_radius")
    assert scheme.get_rule("min_log_q") is scheme.rules[0]
    assert scheme.get_rule("latent_radius") is None
    rule = LikelihoodThresholdTruncation()
    scheme.add_rule(rule, index=0)
    assert scheme.rule_names == ["likelihood_threshold", "min_log_q"]
    with pytest.raises(ValueError, match="Duplicate truncation rule"):
        scheme.add_rule(LikelihoodThresholdTruncation())


class TestReferenceTruncationKwargs:
    """Reference FlowProposal ctor kwargs for truncation
    (``flowproposal.py:102-168``)."""

    @pytest.fixture()
    def model(self):
        from nessai_tpu.utils.testing import IntegrationTestModel

        m = IntegrationTestModel(2)
        m.set_rng(np.random.default_rng(0))
        return m

    def test_truncation_methods_and_kwargs(self, model):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(
            model,
            poolsize=50,
            truncation_methods=["latent_radius", "min_log_q"],
            truncation_kwargs={
                "latent_radius": {"mode": "constant_volume", "q": 0.9}
            },
        )
        assert p.truncation_methods == ["latent_radius", "min_log_q"]
        assert p.truncate_log_q is True
        assert p.get_truncation_rule("latent_radius").q == 0.9

    def test_truncation_method_single(self, model):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(model, poolsize=50, truncation_method="min_log_q")
        assert p.truncation_methods == ["min_log_q"]

    def test_deprecated_boolean_forms(self, model):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(
            model,
            poolsize=50,
            truncate_log_q=True,
            enforce_likelihood_threshold=True,
        )
        assert "min_log_q" in p.truncation_methods
        assert "likelihood_threshold" in p.truncation_methods
        assert p.enforce_likelihood_threshold is True

    def test_deprecated_radius_kwargs(self, model):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(
            model,
            poolsize=50,
            fixed_radius=3.0,
            min_radius=1.0,
            max_radius=5.0,
        )
        rule = p.get_truncation_rule("latent_radius")
        assert rule.mode == "fixed"
        assert rule.radius == 3.0
        assert rule.min_radius == 1.0
        assert rule.max_radius == 5.0

    def test_deprecation_warnings(self, model):
        import warnings

        from nessai_tpu.proposal import FlowProposal

        with pytest.warns(DeprecationWarning, match="latent_prior"):
            FlowProposal(
                model, poolsize=50, latent_prior="truncated_gaussian"
            )
        with pytest.warns(
            DeprecationWarning, match="compute_radius_with_all"
        ):
            FlowProposal(model, poolsize=50, compute_radius_with_all=True)

    def test_truncation_as_string_or_list(self, model):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(model, poolsize=50, truncation="min_log_q")
        assert p.truncation_methods == ["min_log_q"]
        p = FlowProposal(
            model, poolsize=50, truncation=["latent_radius", "min_log_q"]
        )
        assert p.truncation_methods == ["latent_radius", "min_log_q"]

    def test_method_and_methods_rejected(self, model):
        from nessai_tpu.proposal import FlowProposal

        with pytest.raises(ValueError, match="only one of"):
            FlowProposal(
                model,
                poolsize=50,
                truncation_method="min_log_q",
                truncation_methods=["latent_radius"],
            )

    def test_methods_string_and_dedup(self, model):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(model, poolsize=50, truncation_methods="min_log_q")
        assert p.truncation_methods == ["min_log_q"]
        p = FlowProposal(
            model,
            poolsize=50,
            truncation_methods=["min_log_q", "min_log_q"],
        )
        assert p.truncation_methods == ["min_log_q"]

    def test_explicit_empty_methods_disable_default_radius(self, model):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(model, poolsize=50, truncation_methods=[])
        assert p.truncation_methods == []

    def test_flat_kwargs_single_method(self, model):
        from nessai_tpu.proposal import FlowProposal

        p = FlowProposal(
            model,
            poolsize=50,
            truncation_method="latent_radius",
            truncation_kwargs={"mode": "constant_volume", "q": 0.9},
        )
        assert p.get_truncation_rule("latent_radius").q == 0.9

    def test_non_dict_kwargs_rejected(self, model):
        from nessai_tpu.proposal import FlowProposal

        with pytest.raises(TypeError, match="must be a dictionary"):
            FlowProposal(
                model,
                poolsize=50,
                truncation_methods=["min_log_q"],
                truncation_kwargs={"min_log_q": 5.0},
            )
