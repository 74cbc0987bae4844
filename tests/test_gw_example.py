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


@pytest.mark.integration_test
def test_basic_gw_example_capped(tmp_path):
    """Capped run of the frequency-domain CBC analogue (reference
    examples/gw/basic_gw_example.py): jitted Whittle likelihood +
    angle reparameterisation."""
    sys.path.insert(0, "examples/gw")
    try:
        from basic_gw_example import BasicGWModel
    finally:
        sys.path.pop(0)
    from nessai_tpu.flowsampler import FlowSampler

    model = BasicGWModel()
    model.set_rng(np.random.default_rng(0))
    assert model.has_jax_likelihood
    # jax and numpy likelihoods agree
    x = model.new_point(8)
    np.testing.assert_allclose(
        model.batch_evaluate_log_likelihood(x),
        model.log_likelihood(x),
        rtol=1e-4,
    )
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=200,
        seed=3,
        resume=False,
        plot=False,
        max_iteration=250,
        maximum_uninformed=100,
        flow_config=dict(n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=10, batch_size=128, patience=5),
        poolsize=200,
        reparameterisations={"phase": {"reparameterisation": "angle-2pi"}},
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)


@pytest.mark.integration_test
def test_callback_gw_example_capped(tmp_path):
    """The lalsuite-style (numpy-only, pure_callback) GW model runs the
    fused populate path end-to-end."""
    sys.path.insert(0, "examples/gw")
    try:
        from callback_gw_example import LalStyleGWModel
    finally:
        sys.path.pop(0)
    from nessai_tpu.flowsampler import FlowSampler

    model = LalStyleGWModel()
    assert not model.has_jax_likelihood
    assert model.likelihood_callback
    fs = FlowSampler(
        model,
        output=str(tmp_path),
        nlive=150,
        seed=4,
        resume=False,
        plot=False,
        max_iteration=200,
        maximum_uninformed=80,
        flow_config=dict(n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=10, batch_size=128, patience=5),
        poolsize=150,
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)
    # the fused (callback) path was actually available
    assert fs.ns._flow_proposal._can_fuse_populate


@pytest.mark.integration_test
def test_ins_gw_example_capped(tmp_path):
    """INS on the GW analogue (reference examples/gw/ins_gw_example.py)."""
    sys.path.insert(0, "examples/gw")
    try:
        from basic_gw_example import BasicGWModel
    finally:
        sys.path.pop(0)
    from nessai_tpu.flowsampler import FlowSampler

    fs = FlowSampler(
        BasicGWModel(),
        output=str(tmp_path),
        nlive=300,
        seed=5,
        resume=False,
        plot=False,
        importance_nested_sampler=True,
        max_iteration=3,
        min_samples=100,
        flow_config=dict(n_blocks=2, n_neurons=8, n_layers=1),
        training_config=dict(max_epochs=10, batch_size=128, patience=5),
    )
    fs.run(plot=False, save=False)
    assert np.isfinite(fs.logZ)
