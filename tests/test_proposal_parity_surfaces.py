"""Reference-parity hooks on the flow proposals:
``initialise(resumed)``, ``inverse_rescale(return_unit_hypercube)``,
the ``flow_config`` property, the ``add_default_reparameterisations``
hook, ``populate(max_samples=...)`` and
``verify_rescaling(n, rtol, atol)``
(``nessai/proposal/flowproposal/base.py:182-195, 358, 437, 755``;
``flowproposal.py:391-397``; ``importance.py:170``).
"""

import numpy as np
import pytest

from nessai_tpu.proposal import FlowProposal
from nessai_tpu.proposal.importance import ImportanceFlowProposal
from nessai_tpu.samplers.importancesampler import ImportanceNestedSampler
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def model():
    m = IntegrationTestModel(2)
    m.set_rng(np.random.default_rng(11))
    return m


@pytest.fixture()
def flow_config():
    return dict(n_blocks=2, n_neurons=8, n_layers=1)


def test_initialise_resumed_skips_verify(model, tmp_path, flow_config):
    calls = []

    class SpyProposal(FlowProposal):
        def verify_rescaling(self, *args, **kwargs):
            calls.append(True)
            return super().verify_rescaling(*args, **kwargs)

    fp = SpyProposal(
        model,
        output=str(tmp_path / "a"),
        poolsize=10,
        flow_config=flow_config,
        plot=False,
    )
    fp.initialise(resumed=True)
    assert fp.initialised
    assert not calls
    fp2 = SpyProposal(
        model,
        output=str(tmp_path / "b"),
        poolsize=10,
        flow_config=flow_config,
        plot=False,
    )
    fp2.initialise(resumed=False)
    assert calls


def test_flow_config_property_none_becomes_empty(model, tmp_path):
    fp = FlowProposal(
        model, output=str(tmp_path), poolsize=10, flow_config=None, plot=False
    )
    assert fp.flow_config == {}
    fp.flow_config = dict(n_blocks=3)
    assert fp.flow_config == dict(n_blocks=3)


def test_add_default_reparameterisations_hook(model, tmp_path, flow_config):
    """The hook only runs when use_default_reparameterisations is True
    and runs after the user specs (reference
    ``flowproposal/base.py:602-603``)."""
    seen = []

    class Hooked(FlowProposal):
        def add_default_reparameterisations(self):
            seen.append(len(self._reparameterisation.parameters))

    fp = Hooked(
        model,
        output=str(tmp_path),
        poolsize=10,
        flow_config=flow_config,
        plot=False,
    )
    fp.initialise()
    # disabled by default
    assert seen == []

    fp2 = Hooked(
        model,
        output=str(tmp_path / "b"),
        poolsize=10,
        flow_config=flow_config,
        plot=False,
        use_default_reparameterisations=True,
        reparameterisations={model.names[0]: "zscore"},
    )
    fp2.initialise()
    # called once, after the user spec was applied
    assert seen == [1]


def test_inverse_rescale_return_unit_hypercube(model, tmp_path, flow_config):
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=10,
        flow_config=flow_config,
        map_to_unit_hypercube=True,
        plot=False,
    )
    fp.initialise()
    x = model.new_point(16)
    x_hyper = model.to_unit_hypercube(x)
    x_conv = fp._convert_to_x(x_hyper)
    x_prime, _ = fp.rescale(x_conv)
    x_unit, _ = fp.inverse_rescale(x_prime, return_unit_hypercube=True)
    x_model, _ = fp.inverse_rescale(x_prime, return_unit_hypercube=False)
    for n in model.names:
        assert x_unit[n].min() >= 0.0 and x_unit[n].max() <= 1.0
        np.testing.assert_allclose(
            x_model[n],
            model.from_unit_hypercube(x_unit)[n],
            rtol=1e-10,
        )


def test_populate_max_samples_override(model, tmp_path, flow_config):
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=50,
        flow_config=flow_config,
        training_config=dict(max_epochs=3, batch_size=64),
        populate_mode="rounds",
        plot=False,
    )
    fp.initialise()
    x = model.new_point(128)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
    worst = x[np.argsort(x["logL"])][0]
    prev = fp.max_samples
    fp.populate(worst, n_samples=50, plot=False, max_samples=10_000)
    # per-call override restored afterwards
    assert fp.max_samples == prev
    assert len(fp.samples) > 0


def test_importance_verify_rescaling_tolerances(model, tmp_path):
    ImportanceNestedSampler.add_fields()
    fp = ImportanceFlowProposal(
        model,
        output=str(tmp_path),
        flow_config=dict(n_blocks=2, n_neurons=4),
    )
    fp.verify_rescaling(n=64, rtol=1e-10, atol=1e-10)
    with pytest.raises(RuntimeError, match="invertible"):
        # absurdly tight tolerance on float32 round-trips must fail
        fp.verify_rescaling(n=64, rtol=0.0, atol=1e-300)
