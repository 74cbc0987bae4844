"""Smoke tests for plotting and remaining utilities."""

import os

import numpy as np
import pytest

from nessai_tpu.livepoint import numpy_array_to_live_points


@pytest.fixture()
def samples(rng):
    x = numpy_array_to_live_points(rng.normal(size=(200, 3)), ["a", "b", "c"])
    x["logL"] = rng.normal(size=200)
    x["logP"] = 0.0
    return x


def test_plot_live_points(samples, tmp_path):
    from nessai_tpu.plot import plot_live_points

    f = str(tmp_path / "lp.png")
    plot_live_points(samples, filename=f)
    assert os.path.getsize(f) > 0


def test_plot_1d_comparison(samples, tmp_path, rng):
    from nessai_tpu.plot import plot_1d_comparison

    other = numpy_array_to_live_points(
        rng.normal(1, 1, size=(100, 3)), ["a", "b", "c"]
    )
    f = str(tmp_path / "cmp.png")
    plot_1d_comparison(samples, other, labels=["x", "y"], filename=f)
    assert os.path.getsize(f) > 0


def test_plot_indices(tmp_path, rng):
    from nessai_tpu.plot import plot_indices

    f = str(tmp_path / "idx.png")
    plot_indices(rng.integers(0, 100, 2000), 100, filename=f)
    assert os.path.getsize(f) > 0


def test_plot_loss(tmp_path):
    from nessai_tpu.plot import plot_loss

    f = str(tmp_path / "loss.png")
    plot_loss(3, {"loss": [5, 4, 3, 2.5], "val_loss": [5, 4.5, 3.5, 3]}, filename=f)
    assert os.path.getsize(f) > 0


def test_plot_trace(samples, tmp_path):
    from nessai_tpu.plot import plot_trace

    f = str(tmp_path / "trace.png")
    plot_trace(-np.arange(200) / 50, samples, filename=f)
    assert os.path.getsize(f) > 0


def test_corner_plot(samples, tmp_path):
    from nessai_tpu.plot import corner_plot

    f = str(tmp_path / "corner.png")
    corner_plot(samples, filename=f)
    assert os.path.getsize(f) > 0


def test_nessai_style_disable():
    from nessai_tpu import config
    from nessai_tpu.plot import nessai_style

    @nessai_style()
    def f():
        return 42

    config.plotting.disable_style = True
    try:
        assert f() == 42
    finally:
        config.plotting.disable_style = False
    assert f() == 42


def test_optimise_meta_proposal_weights(rng):
    from nessai_tpu.utils.optimise import optimise_meta_proposal_weights

    n = 500
    # two proposals: one matching the posterior, one broad
    logL = rng.normal(size=n)
    log_q = np.stack([logL, np.zeros(n)], axis=1)
    w = optimise_meta_proposal_weights(logL, log_q, np.array([0.5, 0.5]))
    assert np.isclose(w.sum(), 1.0)
    assert np.all(w >= 0)


def test_lars_distribution_sample_log_prob(rng):
    import jax

    from nessai_tpu.flows.distributions import ResampledGaussian

    dist = ResampledGaussian(2, n_neurons=8, n_layers=1)
    params = dist.init(jax.random.PRNGKey(0))
    z = dist.sample(params, jax.random.PRNGKey(1), 64)
    assert z.shape == (64, 2)
    lp = dist.log_prob(params, z)
    assert np.isfinite(np.asarray(lp)).all()
    # at init a(z)=0.5 and Z=0.5 so log_prob == standard normal
    expected = -0.5 * np.sum(np.asarray(z) ** 2, axis=1) - np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(lp), expected, atol=1e-5)


def test_box_uniform_and_diag_normal(rng):
    import jax

    from nessai_tpu.utils.distributions import (
        get_multivariate_normal,
        get_uniform_distribution,
    )

    u = get_uniform_distribution(3, 2.0)
    z = u.sample(jax.random.PRNGKey(0), 100)
    assert np.abs(np.asarray(z)).max() <= 2.0
    np.testing.assert_allclose(
        np.asarray(u.log_prob(z)), -3 * np.log(4.0), atol=1e-6
    )
    nrm = get_multivariate_normal(3, var=2.0)
    z = nrm.sample(jax.random.PRNGKey(1), 100)
    lp = np.asarray(nrm.log_prob(z))
    from scipy.stats import multivariate_normal

    expected = multivariate_normal(np.zeros(3), 2.0 * np.eye(3)).logpdf(
        np.asarray(z)
    )
    np.testing.assert_allclose(lp, expected, rtol=1e-5)


def test_live_points_to_dataframe(samples):
    from nessai_tpu.livepoint import live_points_to_dataframe

    df = live_points_to_dataframe(samples)
    assert "a" in df.columns and "logL" in df.columns
    assert len(df) == 200
