"""Capped run of the toy GW chirp model (BASELINE GW-injection config
analogue): exercises the jitted batched likelihood + angle
reparameterisation on a 5-dim problem."""

import sys

import numpy as np
import pytest


@pytest.mark.integration_test
def test_toy_cbc_capped(tmp_path, monkeypatch):
    sys.path.insert(0, "examples/gw")
    try:
        from toy_cbc import ToyCBCModel
    finally:
        sys.path.pop(0)
    from nessai_tpu.flowsampler import FlowSampler

    model = ToyCBCModel()
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=200,
        seed=9,
        resume=False,
        plot=False,
        max_iteration=250,
        maximum_uninformed=100,
        flow_config=dict(n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=10, batch_size=128, patience=5),
        poolsize=200,
        reparameterisations={"phi0": {"reparameterisation": "angle-2pi"}},
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)
    assert fs.ns._flow_proposal.training_count >= 1
    # angle reparameterisation created the Cartesian prime parameters
    assert "phi0_x" in fs.ns._flow_proposal.prime_parameters
    # jax likelihood path is active
    assert model.has_jax_likelihood
