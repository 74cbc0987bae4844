"""Reference-parity behaviour tests for ``FlowModel``.

Mirrors the behavioural content of
``/root/reference/tests/test_flowmodel/test_flowmodel_base.py`` against
this package's API — conditional flows, weighted training, prep_data
validation and inference entry points.

Note: the reference's ``check_batch_size`` divisor-search algorithm is
deliberately not ported — this package pads every split to whole
static-shape batches (zero-weight padding), so ragged final batches
cannot occur. The input validation (batch size 1, unknown types) is
mirrored.
"""

import os

import numpy as np
import pytest

from nessai_tpu.flowmodel import FlowModel

DATA_DIM = 2


@pytest.fixture
def fm(tmp_path, rng):
    fm = FlowModel(
        flow_config=dict(
            n_inputs=DATA_DIM, n_blocks=2, n_neurons=4, n_layers=1
        ),
        training_config=dict(max_epochs=3, patience=2, batch_size=50),
        output=str(tmp_path),
        rng=rng,
    )
    fm.initialise()
    return fm


@pytest.fixture
def cfm(tmp_path, rng):
    """Conditional flow model with a 1-d context."""
    fm = FlowModel(
        flow_config=dict(
            n_inputs=DATA_DIM,
            n_blocks=2,
            n_neurons=4,
            n_layers=1,
            context_features=1,
        ),
        training_config=dict(max_epochs=3, patience=2, batch_size=50),
        output=str(tmp_path),
        rng=rng,
    )
    fm.initialise()
    return fm


def test_init_no_config(tmp_path):
    fm = FlowModel(output=str(tmp_path))
    assert fm.initialised is False


def test_init_no_output(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fm = FlowModel(flow_config=dict(n_inputs=2))
    assert fm.output is not None


# ----------------------------------------------------------------------
# prep_data
# ----------------------------------------------------------------------
@pytest.mark.parametrize("val_size, batch_size", [(0.1, 50), (0.5, "all")])
def test_prep_data_splits(fm, rng, val_size, batch_size):
    n = 100
    x = rng.standard_normal((n, DATA_DIM))
    data = fm.prep_data(x, val_size, batch_size)
    n_train_batches, bs = data["train"]["x"].shape[:2]
    # all training rows present (padding rows have zero weight)
    w = np.asarray(data["train"]["w"])
    assert int((w > 0).sum()) == n - int(round(val_size * n))
    if isinstance(batch_size, int):
        assert bs == batch_size
    if val_size:
        wv = np.asarray(data["val"]["w"])
        assert int((wv > 0).sum()) == int(round(val_size * n))


def test_prep_data_conditional_shapes(cfm, rng):
    n = 200
    x = rng.standard_normal((n, DATA_DIM))
    c = rng.standard_normal((n, 1))
    data = cfm.prep_data(x, 0.1, 100, conditional=c)
    assert data["train"]["context"].shape[2] == 1
    assert (
        data["train"]["context"].shape[:2] == data["train"]["x"].shape[:2]
    )
    assert data["val"]["context"].shape[2] == 1


def test_prep_data_weights_and_conditional(cfm, rng):
    n = 100
    x = rng.standard_normal((n, DATA_DIM))
    w = rng.random(n)
    c = rng.standard_normal((n, 1))
    data = cfm.prep_data(x, 0.1, 50, weights=w, conditional=c)
    assert "context" in data["train"]
    assert data["train"]["w"].shape == data["train"]["x"].shape[:2]


@pytest.mark.parametrize("batch_size", ["10", True, False])
def test_incorrect_batch_size_type(fm, rng, batch_size):
    x = rng.standard_normal((100, DATA_DIM))
    with pytest.raises(RuntimeError, match="Unknown batch size"):
        fm.prep_data(x, 0.1, batch_size)


def test_batch_size_one_rejected(fm, rng):
    x = rng.standard_normal((100, DATA_DIM))
    with pytest.raises(ValueError, match="Cannot use a batch size of 1"):
        fm.prep_data(x, 0.1, 1)


@pytest.mark.parametrize("bad", [np.inf, np.nan])
def test_prep_data_non_finite_values(fm, rng, bad):
    x = rng.standard_normal((100, DATA_DIM))
    x[7, 0] = bad
    with pytest.raises(ValueError, match="not finite"):
        fm.prep_data(x, 0.1, 50)


@pytest.mark.parametrize("bad", [np.inf, np.nan])
def test_prep_data_non_finite_weights(fm, rng, bad):
    x = rng.standard_normal((100, DATA_DIM))
    w = np.ones(100)
    w[3] = bad
    with pytest.raises(ValueError, match="non-finite"):
        fm.prep_data(x, 0.1, 50, weights=w)


# ----------------------------------------------------------------------
# Training
# ----------------------------------------------------------------------
def test_training_basic(fm, rng):
    x = rng.standard_normal((100, DATA_DIM))
    history = fm.train(x)
    assert np.isfinite(history["loss"]).all()
    assert fm.weights_file is not None
    assert os.path.exists(fm.weights_file)


def test_training_with_weights(fm, rng):
    x = rng.standard_normal((100, DATA_DIM))
    w = rng.random(100)
    history = fm.train(x, weights=w)
    assert np.isfinite(history["loss"]).all()


def test_training_with_conditional(cfm, rng):
    x = rng.standard_normal((100, DATA_DIM))
    c = rng.standard_normal((100, 1))
    history = cfm.train(x, conditional=c)
    assert np.isfinite(history["loss"]).all()


def test_training_non_finite_samples(fm, rng):
    x = rng.standard_normal((100, DATA_DIM))
    x[0, 0] = np.nan
    with pytest.raises(ValueError, match="not finite"):
        fm.train(x)


def test_training_max_epochs_kwarg(fm, rng):
    x = rng.standard_normal((100, DATA_DIM))
    history = fm.train(x, max_epochs=2)
    assert len(history["loss"]) <= 2


# ----------------------------------------------------------------------
# Inference entry points (incl. conditional)
# ----------------------------------------------------------------------
@pytest.mark.parametrize("n_samples", [1, 10])
def test_sample_and_log_prob(fm, n_samples):
    x, lp = fm.sample_and_log_prob(N=n_samples)
    assert x.shape == (n_samples, DATA_DIM)
    assert lp.shape == (n_samples,)


def test_sample_and_log_prob_not_initialised(tmp_path):
    fm = FlowModel(flow_config=dict(n_inputs=2), output=str(tmp_path))
    with pytest.raises(RuntimeError, match="initialise"):
        fm.sample_and_log_prob(N=2)


@pytest.mark.parametrize("n_samples", [1, 10])
def test_sample_and_log_prob_with_latent(fm, rng, n_samples):
    z = rng.standard_normal((n_samples, DATA_DIM))
    x, lp = fm.sample_and_log_prob(z=z)
    assert x.shape == (n_samples, DATA_DIM)
    assert lp.shape == (n_samples,)


def test_forward_and_log_prob_roundtrip(fm, rng):
    x = rng.standard_normal((10, DATA_DIM)).astype(np.float32)
    z, lp = fm.forward_and_log_prob(x)
    assert z.shape == x.shape
    x_back, log_j = fm.inverse(z)
    assert log_j.shape == (10,)
    np.testing.assert_allclose(
        np.asarray(x_back), x, atol=5e-5, rtol=1e-4
    )
    lp2 = fm.log_prob(x)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=5e-4)


def test_conditional_inference(cfm, rng):
    """forward/inverse/log_prob accept a conditional and, after training
    on context-dependent data, the context changes the density.

    (An untrained flow is the identity by construction — conditioner
    output layers are zero-initialised — so training is required for the
    context to have an effect.)"""
    n = 200
    c_train = rng.integers(0, 2, (n, 1)).astype(np.float32)
    x_train = rng.standard_normal((n, DATA_DIM)).astype(np.float32) + 3 * c_train
    cfm.train(x_train, conditional=c_train, max_epochs=20)

    x = rng.standard_normal((10, DATA_DIM)).astype(np.float32)
    c1 = np.zeros((10, 1), np.float32)
    c2 = np.ones((10, 1), np.float32)
    lp1 = np.asarray(cfm.log_prob(x, conditional=c1))
    lp2 = np.asarray(cfm.log_prob(x, conditional=c2))
    assert lp1.shape == (10,)
    assert not np.allclose(lp1, lp2)

    z, _ = cfm.forward_and_log_prob(x, conditional=c1)
    x_back, _ = cfm.inverse(z, conditional=c1)
    np.testing.assert_allclose(np.asarray(x_back), x, atol=5e-4, rtol=1e-3)


def test_conditional_sample(cfm, rng):
    c = rng.standard_normal((5, 1)).astype(np.float32)
    x = cfm.sample(5, conditional=c)
    assert np.asarray(x).shape == (5, DATA_DIM)


def test_conditional_sample_and_log_prob(cfm, rng):
    c = rng.standard_normal((5, 1)).astype(np.float32)
    x, lp = cfm.sample_and_log_prob(N=5, conditional=c)
    assert x.shape == (5, DATA_DIM)
    assert lp.shape == (5,)


def test_sample_latent_distribution(fm):
    z = fm.sample_latent_distribution(7)
    assert np.asarray(z).shape == (7, DATA_DIM)


# ----------------------------------------------------------------------
# Weights files
# ----------------------------------------------------------------------
def test_save_weights_rotates_existing(fm, rng, tmp_path):
    x = rng.standard_normal((100, DATA_DIM))
    fm.train(x)
    path = os.path.join(str(tmp_path), "w.pkl")
    fm.save_weights(path)
    fm.save_weights(path)
    assert os.path.exists(path)
    assert os.path.exists(path + ".old")


def test_load_weights(fm, rng, tmp_path):
    x = rng.standard_normal((100, DATA_DIM))
    fm.train(x)
    path = fm.weights_file
    lp_before = np.asarray(fm.log_prob(x[:5].astype(np.float32)))
    fm2 = FlowModel(
        flow_config=dict(
            n_inputs=DATA_DIM, n_blocks=2, n_neurons=4, n_layers=1
        ),
        output=str(tmp_path),
        rng=np.random.default_rng(1),
    )
    fm2.initialise()
    fm2.load_weights(path)
    lp_after = np.asarray(fm2.log_prob(x[:5].astype(np.float32)))
    np.testing.assert_allclose(lp_before, lp_after, atol=1e-6)
