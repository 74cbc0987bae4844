"""Spec-form tests for BaseFlowProposal.configure_reparameterisations.

Analogue of the reference's ``tests/test_proposal/test_flowproposal/
test_base/test_reparameterisations.py`` (834 LoC): every accepted spec
form, regex keys, label keys, fallbacks, and error branches.
"""

import numpy as np
import pytest

from nessai_tpu.proposal.flowproposal import FlowProposal
from nessai_tpu.reparameterisations import NullReparameterisation
from nessai_tpu.reparameterisations.rescale import (
    RescaleToBounds,
    ScaleAndShift,
)


@pytest.fixture()
def sky_model(rng):
    from nessai_tpu.model import Model

    class SkyModel(Model):
        names = ["ra", "dec", "q_0", "q_1"]
        bounds = {
            "ra": [0.0, 2 * np.pi],
            "dec": [-np.pi / 2, np.pi / 2],
            "q_0": [-1.0, 1.0],
            "q_1": [-1.0, 1.0],
        }

        def log_prior(self, x):
            lp = np.log(self.in_bounds(x), dtype=float)
            for n in self.names:
                lp -= np.log(np.ptp(self.bounds[n]))
            return lp

        def log_likelihood(self, x):
            return np.zeros(len(np.atleast_1d(x)))

    m = SkyModel()
    m.set_rng(rng)
    return m


def _proposal(model, reparameterisations, tmp_path, rng, **kwargs):
    p = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=50,
        rng=rng,
        reparameterisations=reparameterisations,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        **kwargs,
    )
    p.configure_reparameterisations(reparameterisations)
    return p


def _classes(proposal):
    return {
        name: type(r) for name, r in proposal._reparameterisation.items()
    }


def test_none_uses_fallback(sky_model, tmp_path, rng):
    p = _proposal(sky_model, None, tmp_path, rng)
    types = set(_classes(p).values())
    # the zscore fallback covers every parameter
    assert types == {ScaleAndShift}
    assert set(p._reparameterisation.parameters) == set(sky_model.names)


def test_global_string(sky_model, tmp_path, rng):
    p = _proposal(sky_model, "rescaletobounds", tmp_path, rng)
    assert set(_classes(p).values()) == {RescaleToBounds}
    assert set(p._reparameterisation.parameters) == set(sky_model.names)


def test_parameter_to_string(sky_model, tmp_path, rng):
    p = _proposal(
        sky_model,
        {"q_0": "zscore", "q_1": "rescaletobounds"},
        tmp_path,
        rng,
    )
    classes = _classes(p).values()
    assert ScaleAndShift in classes
    assert RescaleToBounds in classes


def test_parameter_to_dict_with_kwargs(sky_model, tmp_path, rng):
    p = _proposal(
        sky_model,
        {
            "q_0": {
                "reparameterisation": "rescaletobounds",
                "rescale_bounds": [0.0, 1.0],
            }
        },
        tmp_path,
        rng,
    )
    r = next(
        r
        for r in p._reparameterisation.values()
        if "q_0" in r.parameters
    )
    assert isinstance(r, RescaleToBounds)
    assert list(r.rescale_bounds["q_0"]) == [0.0, 1.0]


def test_regex_parameter_key(sky_model, tmp_path, rng):
    p = _proposal(sky_model, {"q_.*": "zscore"}, tmp_path, rng)
    zs = [
        r
        for r in p._reparameterisation.values()
        if isinstance(r, ScaleAndShift)
    ]
    covered = sorted(sum((r.parameters for r in zs), []))
    assert "q_0" in covered and "q_1" in covered


def test_name_key_with_parameters(sky_model, tmp_path, rng):
    p = _proposal(
        sky_model,
        {"zscore": {"parameters": ["q_0", "q_1"]}},
        tmp_path,
        rng,
    )
    zs = [
        r
        for r in p._reparameterisation.values()
        if isinstance(r, ScaleAndShift)
        and set(r.parameters) >= {"q_0", "q_1"}
    ]
    assert zs


def test_label_key_with_reparameterisation(sky_model, tmp_path, rng):
    from nessai_tpu.reparameterisations.angle import AnglePair

    p = _proposal(
        sky_model,
        {
            "sky": {
                "reparameterisation": "angle-pair",
                "parameters": ["ra", "dec"],
            }
        },
        tmp_path,
        rng,
    )
    pairs = [
        r
        for r in p._reparameterisation.values()
        if isinstance(r, AnglePair)
    ]
    assert len(pairs) == 1
    assert set(pairs[0].parameters) >= {"ra", "dec"}


def test_name_key_missing_parameters_raises(sky_model, tmp_path, rng):
    with pytest.raises(RuntimeError, match="parameters"):
        _proposal(sky_model, {"zscore": {}}, tmp_path, rng)


def test_unknown_name_raises(sky_model, tmp_path, rng):
    # reference wraps the registry lookup error
    # (``flowproposal/base.py:462-471``)
    with pytest.raises(
        RuntimeError,
        match="not a parameter in the model or a known reparameterisation",
    ):
        _proposal(
            sky_model,
            {"widget": {"parameters": ["q_0"]}},
            tmp_path,
            rng,
        )


def test_parameter_none_value_uses_null(sky_model, tmp_path, rng):
    p = _proposal(sky_model, {"q_0": "none"}, tmp_path, rng)
    r = next(
        r
        for r in p._reparameterisation.values()
        if "q_0" in r.parameters
    )
    assert isinstance(r, NullReparameterisation)


def test_fallback_none_gives_null(sky_model, tmp_path, rng):
    p = _proposal(
        sky_model,
        {"q_0": "zscore"},
        tmp_path,
        rng,
        fallback_reparameterisation=None,
    )
    nulls = [
        r
        for r in p._reparameterisation.values()
        if isinstance(r, NullReparameterisation)
    ]
    assert nulls
    covered = sum((r.parameters for r in nulls), [])
    assert "ra" in covered and "dec" in covered and "q_1" in covered


def test_class_value(sky_model, tmp_path, rng):
    p = _proposal(
        sky_model,
        {
            "q_0": {
                "reparameterisation": ScaleAndShift,
                "scale": 2.0,
            }
        },
        tmp_path,
        rng,
    )
    r = next(
        r
        for r in p._reparameterisation.values()
        if "q_0" in r.parameters
    )
    assert isinstance(r, ScaleAndShift)
