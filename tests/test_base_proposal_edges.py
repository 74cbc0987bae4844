"""Edge paths of BaseFlowProposal: verify_rescaling failure modes,
opt-in async precompilation, poolsize scaling. Reference:
``nessai/proposal/flowproposal/base.py:416-435, 655-714``.
"""

import numpy as np
import pytest

from nessai_tpu.proposal import FlowProposal
from nessai_tpu.utils.testing import IntegrationTestModel


@pytest.fixture()
def fp(rng, tmp_path):
    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=2, batch_size=64),
        rng=rng,
        plot=False,
    )
    fp.initialise()
    return fp


def test_verify_rescaling_passes(fp):
    fp.verify_rescaling()


def test_verify_rescaling_not_invertible_value(fp):
    orig = fp.inverse_rescale

    def broken(x_prime, **kwargs):
        x, log_j = orig(x_prime, **kwargs)
        x[fp.model.names[0]] = x[fp.model.names[0]] + 0.5
        return x, log_j

    fp.inverse_rescale = broken
    with pytest.raises(RuntimeError, match="not invertible for"):
        fp.verify_rescaling()


def test_verify_rescaling_bad_jacobian(fp):
    orig = fp.inverse_rescale

    def broken(x_prime, **kwargs):
        x, log_j = orig(x_prime, **kwargs)
        return x, log_j + 1.0

    fp.inverse_rescale = broken
    with pytest.raises(RuntimeError, match="Jacobian is not invertible"):
        fp.verify_rescaling()


def test_verify_rescaling_non_integer_factor(fp):
    orig = fp.inverse_rescale

    def broken(x_prime, **kwargs):
        x, log_j = orig(x_prime, **kwargs)
        return x[:-3], log_j[:-3]

    fp.inverse_rescale = broken
    with pytest.raises(RuntimeError, match="non-integer factor"):
        fp.verify_rescaling()


def test_verify_rescaling_not_one_to_one_warns(fp, caplog, monkeypatch):
    monkeypatch.setattr(
        type(fp._reparameterisation),
        "one_to_one",
        property(lambda self: False),
    )
    with caplog.at_level("WARNING"):
        fp.verify_rescaling()
    assert any("invertible" in r.message for r in caplog.records)


def test_update_poolsize_scale(fp):
    fp.update_poolsize_scale(0.5)
    assert fp._poolsize_scale == 2.0
    fp.update_poolsize_scale(1e-9)
    assert fp._poolsize_scale == fp.max_poolsize_scale
    fp.update_poolsize_scale(None)
    assert fp._poolsize_scale == fp.max_poolsize_scale
    fp.update_poolsize_scale(2.0)
    assert fp._poolsize_scale == 1.0
    assert fp.poolsize == fp._poolsize


def test_precompile_async_runs(rng, tmp_path, caplog):
    import logging

    model = IntegrationTestModel(2)
    model.set_rng(rng)
    fp = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=100,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(
            max_epochs=2, batch_size=64, val_size=0.1,
            noise_type="constant", noise_scale=0.1,
        ),
        rng=rng,
        plot=False,
        precompile=True,
    )
    fp.initialise()
    with caplog.at_level(logging.DEBUG, logger="nessai_tpu"):
        fp.precompile_async(128)
        fp._join_precompile()
    # the warm-up body swallows exceptions by design — the success log
    # is the proof it actually compiled (incl. val + noise-sigma
    # branches enabled above) rather than silently bailing
    assert "precompilation complete" in caplog.text
    assert "Precompilation failed" not in caplog.text
    # training still works after the warm-up thread completed
    x = model.new_point(128)
    x["logL"] = model.batch_evaluate_log_likelihood(x)
    fp.train(x, plot=False)
