"""Tests for stopping criteria."""

import pytest

from nessai_tpu.stopping_criteria import (
    CriterionGroup,
    StoppingCriterion,
    StoppingCriterionRegistry,
)


def test_registry_known():
    known = StoppingCriterionRegistry.known()
    for name in (
        "dlogz",
        "difference_log_evidence",
        "ratio",
        "log_evidence_ratio",
        "ess",
        "z_err",
        "evidence_error",
    ):
        assert name in known


def test_dlogz_default():
    c = StoppingCriterionRegistry.get("dlogZ")
    assert c.tolerance == 0.1
    assert not c.is_met(0.5)
    assert c.is_met(0.05)


def test_ratio_default():
    c = StoppingCriterionRegistry.get("ratio")
    assert c.tolerance == 0.0
    assert c.is_met(-0.1)
    assert not c.is_met(0.5)


def test_ess_comparison():
    c = StoppingCriterionRegistry.get("ess", tolerance=1000)
    assert c.is_met(2000)
    assert not c.is_met(500)


def test_unknown_raises():
    with pytest.raises(ValueError):
        StoppingCriterionRegistry.get("not-a-criterion")


def test_and_group():
    g = StoppingCriterionRegistry.get("ratio") & StoppingCriterionRegistry.get(
        "ess", tolerance=100
    )
    assert isinstance(g, CriterionGroup)
    assert g.is_met({"log_evidence_ratio": -1.0, "ess": 200})
    assert not g.is_met({"log_evidence_ratio": -1.0, "ess": 50})


def test_or_group():
    g = StoppingCriterionRegistry.get("ratio") | StoppingCriterionRegistry.get(
        "ess", tolerance=100
    )
    assert g.is_met({"log_evidence_ratio": -1.0, "ess": 50})
    assert not g.is_met({"log_evidence_ratio": 1.0, "ess": 50})


def test_none_value_not_met():
    c = StoppingCriterionRegistry.get("ratio")
    assert not c.is_met(None)


class TestRound3CriteriaBranches:
    def test_criterion_and_or_operators(self):
        from nessai_tpu.stopping_criteria import StoppingCriterionRegistry

        a = StoppingCriterionRegistry.get("dlogZ", tolerance=0.1)
        b = StoppingCriterionRegistry.get("ess", tolerance=100)
        g_and = a & b
        g_or = a | b
        assert g_and.mode == "and"
        assert g_or.mode == "or"
        assert set(g_and.names) == {"difference_log_evidence", "ess"}
        vals_one = {"difference_log_evidence": 0.01, "ess": 10.0}
        assert not g_and.is_met(vals_one)
        assert g_or.is_met(vals_one)
        vals_both = {"difference_log_evidence": 0.01, "ess": 500.0}
        assert g_and.is_met(vals_both)

    def test_group_merge_and_repr(self):
        from nessai_tpu.stopping_criteria import StoppingCriterionRegistry

        a = StoppingCriterionRegistry.get("dlogZ", tolerance=0.1)
        b = StoppingCriterionRegistry.get("ess", tolerance=100)
        c = StoppingCriterionRegistry.get("ratio", tolerance=0.0)
        g = (a & b) & c
        assert len(g.criteria) == 3
        assert "&" in repr(g)
        g2 = (a | b) | c
        assert "|" in repr(g2)
        assert repr(a) == "difference_log_evidence<=0.1"

    def test_group_tolerances_dict(self):
        from nessai_tpu.stopping_criteria import StoppingCriterionRegistry

        a = StoppingCriterionRegistry.get("dlogZ", tolerance=0.2)
        g = a & StoppingCriterionRegistry.get("ess", tolerance=50)
        assert g.tolerances == {"difference_log_evidence": 0.2, "ess": 50}
