"""Deep branch coverage for FlowModel: data prep, batch sizing, error
branches, optimisers, resets and persistence rotation.

Reference: ``tests/test_flowmodel/`` in the reference repo.
"""

import os
import pickle

import numpy as np
import pytest

from nessai_tpu.flowmodel import FlowModel
from nessai_tpu.flowmodel.base import (
    _bucket_size,
    _get_optimiser,
    _pad_rows,
    _partition_params,
    _combine_params,
)


@pytest.fixture()
def fm(tmp_path, rng):
    return FlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=3, batch_size=32, patience=2),
        output=str(tmp_path),
        rng=rng,
    )


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------
def test_bucket_size_powers_of_two():
    assert _bucket_size(1) == 256
    assert _bucket_size(256) == 256
    assert _bucket_size(257) == 512
    assert _bucket_size(1000) == 1024
    assert _bucket_size(5, minimum=4) == 8


def test_pad_rows():
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    out = _pad_rows(x, 5)
    assert out.shape == (5, 2)
    np.testing.assert_array_equal(out[3], out[2])
    # no-op at exact size
    assert _pad_rows(x, 3).shape == (3, 2)


def test_partition_combine_roundtrip(fm):
    fm.initialise()
    diff, aux = _partition_params(fm.params)
    params2 = _combine_params(diff, aux)
    import jax

    for a, b in zip(jax.tree.leaves(fm.params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # integer leaves (permutations) are excluded from the diff part
    int_leaves = [
        leaf
        for leaf in jax.tree.leaves(fm.params)
        if not np.issubdtype(np.asarray(leaf).dtype, np.floating)
    ]
    assert len([d for d in diff if d is None]) == len(int_leaves)


def test_get_optimiser_unknown():
    with pytest.raises(ValueError, match="Unknown optimiser"):
        _get_optimiser("bogus", 1e-3, 5.0)


@pytest.mark.parametrize("name", ["adam", "adamw", "sgd"])
def test_get_optimiser_known(name):
    tx = _get_optimiser(name, 1e-3, 5.0)
    assert tx is not None
    # no clipping branch
    tx2 = _get_optimiser(name, 1e-3, 0.0)
    assert tx2 is not None


# ----------------------------------------------------------------------
# batch sizing / data prep
# ----------------------------------------------------------------------
def test_check_batch_size_all(fm):
    fm.training_config.batch_size = "all"
    assert fm.check_batch_size(100) == 128  # bucketed


def test_check_batch_size_small_dataset(fm):
    fm.training_config.batch_size = 1000
    # dataset smaller than the batch: bucket the dataset size
    assert fm.check_batch_size(50) == 64


def test_prep_data_non_finite_samples(fm, rng):
    x = rng.normal(size=(64, 2)).astype(np.float32)
    x[0, 0] = np.nan
    with pytest.raises(ValueError, match="not finite"):
        fm.prep_data(x, val_size=0.1)


def test_prep_data_non_finite_weights(fm, rng):
    x = rng.normal(size=(64, 2)).astype(np.float32)
    w = np.ones(64, np.float32)
    w[3] = np.inf
    with pytest.raises(ValueError, match="non-finite"):
        fm.prep_data(x, val_size=0.1, weights=w)


def test_prep_data_too_few(fm):
    with pytest.raises(ValueError, match="Too few"):
        fm.prep_data(np.zeros((1, 2), np.float32), val_size=0.0)


def test_prep_data_shapes(fm, rng):
    fm.initialise()
    x = rng.normal(size=(100, 2)).astype(np.float32)
    data = fm.prep_data(x, val_size=0.1)
    xb = np.asarray(data["train"]["x"])
    wb = np.asarray(data["train"]["w"])
    assert xb.ndim == 3 and xb.shape[2] == 2
    assert xb.shape[:2] == wb.shape
    # padding rows have zero weight
    assert wb.sum() == 90
    assert "val" in data


def test_prep_data_no_validation(fm, rng):
    data = fm.prep_data(
        rng.normal(size=(64, 2)).astype(np.float32), val_size=None
    )
    assert "val" not in data


def test_train_rejects_1d(fm):
    with pytest.raises(ValueError, match="2D"):
        fm.train(np.zeros(10, np.float32))


def test_train_max_epochs_override(fm, rng):
    h = fm.train(
        rng.normal(size=(64, 2)).astype(np.float32), max_epochs=2, plot=False
    )
    assert len(h["loss"]) <= 2


# ----------------------------------------------------------------------
# resets / optimiser keys
# ----------------------------------------------------------------------
def test_reset_optimiser_lr_changes_key(fm):
    fm.initialise()
    k1 = fm._opt_key
    fm.reset_optimiser(lr=1e-4)
    assert fm._opt_key != k1
    fm.reset_optimiser(lr=fm.training_config.lr)
    assert fm._opt_key == k1


def test_reset_model_permutations(fm, rng):
    import jax

    fm.initialise()
    before = jax.tree.map(np.asarray, fm.params)
    fm.reset_model(weights=False, permutations=True)
    # float weights unchanged, permutations redrawn (possibly identical
    # for tiny dims, so only check weights stayed put)
    after = jax.tree.map(np.asarray, fm.params)
    float_same = [
        np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
        if np.issubdtype(np.asarray(a).dtype, np.floating)
    ]
    assert all(float_same)


def test_reset_model_before_initialise(tmp_path, rng):
    fm = FlowModel(
        flow_config=dict(n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1),
        output=str(tmp_path),
        rng=rng,
    )
    fm.reset_model()
    assert fm.initialised


# ----------------------------------------------------------------------
# persistence
# ----------------------------------------------------------------------
def test_save_weights_rotation(fm, rng, tmp_path):
    fm.initialise()
    path = str(tmp_path / "w.pkl")
    fm.save_weights(path)
    fm.save_weights(path)
    assert os.path.exists(path)
    assert os.path.exists(path + ".old")
    # both are loadable parameter pytrees
    with open(path + ".old", "rb") as f:
        old = pickle.load(f)
    assert isinstance(old, dict)


def test_reload_weights_uses_last_file(fm, rng, tmp_path):
    import jax

    fm.initialise()
    path = str(tmp_path / "w.pkl")
    fm.save_weights(path)
    orig = jax.tree.map(np.asarray, fm.params)
    fm.reset_model()
    fm.reload_weights()
    for a, b in zip(
        jax.tree.leaves(orig), jax.tree.leaves(fm.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_saves_model_pkl(fm, rng):
    fm.train(rng.normal(size=(64, 2)).astype(np.float32), plot=False)
    # the per-training save runs on a background thread
    fm._join_pending_save()
    assert os.path.exists(os.path.join(fm.output, "model.pkl"))


def test_async_save_weights_serialised(fm, rng, tmp_path):
    """Async saves are serialised and readers join: a save followed by
    an immediate load returns the saved parameters."""
    import jax

    fm.initialise()
    path = str(tmp_path / "w.pkl")
    fm.save_weights(path, blocking=False)
    orig = jax.tree.map(np.asarray, fm.params)
    fm.reset_model()
    fm.load_weights(path)  # joins the pending save first
    for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(fm.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a second async save rotates the first
    fm.save_weights(path, blocking=False)
    fm._join_pending_save()
    assert os.path.exists(path + ".old")


# ----------------------------------------------------------------------
# inference paths
# ----------------------------------------------------------------------
def test_inference_shapes_and_dtypes(fm, rng):
    fm.initialise()
    x = rng.normal(size=(17, 2)).astype(np.float32)
    z, lp = fm.forward_and_log_prob(x)
    assert z.shape == (17, 2) and lp.shape == (17,)
    assert z.dtype == np.float64
    x2, log_j = fm.inverse(z)
    np.testing.assert_allclose(x2, x, atol=1e-4)
    lp2 = fm.log_prob(x)
    np.testing.assert_allclose(lp2, lp, atol=1e-5)
    x3, lq = fm.inverse_and_log_prob(z)
    np.testing.assert_allclose(x3, x2, atol=1e-6)
    s = fm.sample(9)
    assert s.shape == (9, 2)
    zb = fm.sample_latent_distribution(5)
    assert zb.shape == (5, 2)
    np.testing.assert_allclose(
        fm.base_log_prob(zb),
        -0.5 * np.sum(zb**2, axis=1) - np.log(2 * np.pi),
        atol=1e-5,
    )


def test_sample_and_log_prob_alt_dist(fm, rng):
    fm.initialise()
    z = rng.normal(size=(8, 2)).astype(np.float32)

    class AltDist:
        def log_prob(self, z):
            return np.zeros(len(z))

    x, lp = fm.sample_and_log_prob(z=z, alt_dist=AltDist())
    assert x.shape == (8, 2)
    assert np.isfinite(lp).all()


def test_dims_property(fm):
    assert fm.dims == 2


class TestImportanceFlowModelWeights:
    """Per-level weight save/reload (reference flowmodel/importance.py:
    96-226)."""

    def _make(self, tmp_path, rng):
        from nessai_tpu.flowmodel.importance import ImportanceFlowModel

        fm = ImportanceFlowModel(
            flow_config=dict(
                n_inputs=2, n_blocks=2, n_neurons=4, n_layers=1
            ),
            training_config=dict(max_epochs=2, batch_size=64, patience=2),
            output=str(tmp_path),
            rng=rng,
        )
        x = rng.normal(size=(128, 2)).astype("float32")
        fm.add_new_flow(reset=True)
        fm.train(x)
        fm.add_new_flow(reset=False)
        fm.train(x)
        return fm, x

    def test_sample_ith_and_log_prob_ith(self, tmp_path, rng):
        fm, x = self._make(tmp_path, rng)
        s = fm.sample_ith(0, N=17)
        assert s.shape == (17, 2)
        lp = fm.log_prob_ith(x[:9], 1)
        assert lp.shape == (9,)
        s2, lp2 = fm.sample_and_log_prob_ith(1, N=13)
        assert s2.shape == (13, 2)
        assert lp2.shape == (13,)
        np.testing.assert_allclose(
            fm.log_prob_ith(s2, 1), lp2, atol=1e-4
        )

    def test_save_and_load_all_weights(self, tmp_path, rng):
        import os

        fm, x = self._make(tmp_path, rng)
        lp_before = fm.log_prob_all(x[:16])
        fm.save_all_weights()
        assert os.path.exists(tmp_path / "level_0" / "model.pkl")
        assert os.path.exists(tmp_path / "level_1" / "model.pkl")
        # perturb in memory then reload
        import jax

        fm.params_list = [
            jax.tree.map(lambda a: a * 0.0, p) for p in fm.params_list
        ]
        fm.load_all_weights()
        lp_after = fm.log_prob_all(x[:16])
        np.testing.assert_allclose(lp_before, lp_after, atol=1e-5)

    def test_update_weights_path(self, tmp_path, rng):
        fm, _ = self._make(tmp_path, rng)
        fm.save_all_weights()
        new_dir = tmp_path / "moved"
        import shutil

        shutil.copytree(tmp_path, new_dir, dirs_exist_ok=True)
        fm.update_weights_path(str(new_dir))
        assert fm.output == str(new_dir)
