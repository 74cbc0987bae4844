"""Tests for stopping criteria."""

import pytest

from nessai_tpu.stopping_criteria import (
    CriterionGroup,
    StoppingCriterion,
    StoppingCriterionRegistry,
)


def test_registry_known():
    known = StoppingCriterionRegistry.known()
    for name in ("dlogz", "ratio", "ess", "z_err"):
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
    assert g.is_met({"ratio": -1.0, "ess": 200})
    assert not g.is_met({"ratio": -1.0, "ess": 50})


def test_or_group():
    g = StoppingCriterionRegistry.get("ratio") | StoppingCriterionRegistry.get(
        "ess", tolerance=100
    )
    assert g.is_met({"ratio": -1.0, "ess": 50})
    assert not g.is_met({"ratio": 1.0, "ess": 50})


def test_none_value_not_met():
    c = StoppingCriterionRegistry.get("ratio")
    assert not c.is_met(None)
