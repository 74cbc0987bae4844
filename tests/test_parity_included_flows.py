"""Reference-parity tests for the included flow architectures and base
distributions.

Mirrors ``/root/reference/tests/test_flows/test_included_flows.py`` and
``test_distributions/`` against this package's API: every included flow
supports the full op surface with consistent shapes and is invertible.
"""

import numpy as np
import pytest
from scipy import stats

from nessai_tpu.flows.distributions import MultivariateNormal
from nessai_tpu.flows.utils import configure_model

N = 10
DATA_DIM = 2


@pytest.fixture(params=["realnvp", "nsf", "maf"])
def flow_and_params(request):
    return configure_model(
        dict(
            n_inputs=DATA_DIM,
            n_blocks=2,
            n_neurons=4,
            n_layers=1,
            ftype=request.param,
        )
    )[:2]


@pytest.fixture
def x(rng):
    return rng.standard_normal((N, DATA_DIM)).astype(np.float32)


@pytest.fixture
def z(rng):
    return rng.standard_normal((N, DATA_DIM)).astype(np.float32)


def test_forward(flow_and_params, x):
    flow, params = flow_and_params
    z_out, log_j = flow.forward(params, x)
    assert np.asarray(z_out).shape == (N, DATA_DIM)
    assert np.asarray(log_j).shape == (N,)


def test_inverse(flow_and_params, z):
    flow, params = flow_and_params
    x_out, log_j = flow.inverse(params, z)
    assert np.asarray(x_out).shape == (N, DATA_DIM)
    assert np.asarray(log_j).shape == (N,)


def test_sample(flow_and_params):
    import jax

    flow, params = flow_and_params
    out = flow.sample(params, jax.random.PRNGKey(0), N)
    assert np.asarray(out).shape == (N, DATA_DIM)


def test_log_prob(flow_and_params, x):
    flow, params = flow_and_params
    lp = flow.log_prob(params, x)
    assert np.asarray(lp).shape == (N,)
    assert np.isfinite(np.asarray(lp)).all()


def test_base_distribution_log_prob(flow_and_params, z):
    flow, params = flow_and_params
    lp = flow.base_log_prob(params, z)
    assert np.asarray(lp).shape == (N,)


def test_forward_and_log_prob(flow_and_params, x):
    flow, params = flow_and_params
    z_out, lp = flow.forward_and_log_prob(params, x)
    assert np.asarray(z_out).shape == (N, DATA_DIM)
    np.testing.assert_allclose(
        np.asarray(lp),
        np.asarray(flow.log_prob(params, x)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_sample_and_log_prob(flow_and_params):
    import jax

    flow, params = flow_and_params
    x_out, lp = flow.sample_and_log_prob(params, jax.random.PRNGKey(1), N)
    assert np.asarray(x_out).shape == (N, DATA_DIM)
    # consistency with log_prob evaluated at the samples
    lp2 = flow.log_prob(params, x_out)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(lp2), rtol=1e-4, atol=1e-4
    )


def test_invertibility(flow_and_params, x):
    flow, params = flow_and_params
    z_out, log_j = flow.forward(params, x)
    x_back, log_j_inv = flow.inverse(params, z_out)
    np.testing.assert_allclose(
        np.asarray(x_back), x, atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(log_j), -np.asarray(log_j_inv), atol=1e-4, rtol=1e-3
    )


@pytest.mark.parametrize("ftype", ["realnvp", "nsf"])
def test_sample_and_log_prob_conditional(ftype, rng):
    import jax

    flow, params, _ = configure_model(
        dict(
            n_inputs=DATA_DIM,
            n_blocks=2,
            n_neurons=4,
            n_layers=1,
            ftype=ftype,
            context_features=1,
        )
    )
    c = np.zeros((N, 1), np.float32)
    x_out, lp = flow.sample_and_log_prob(
        params, jax.random.PRNGKey(2), N, c
    )
    assert np.asarray(x_out).shape == (N, DATA_DIM)
    assert np.asarray(lp).shape == (N,)


# ----------------------------------------------------------------------
# MultivariateNormal
# ----------------------------------------------------------------------
@pytest.mark.parametrize("dims", [2, 4])
@pytest.mark.parametrize("var", [1.0, 4.0])
def test_mvn_log_prob_matches_scipy(rng, dims, var):
    dist = MultivariateNormal(dims, var=var)
    x = rng.standard_normal((16, dims)).astype(np.float32)
    expected = stats.multivariate_normal(
        np.zeros(dims), var * np.eye(dims)
    ).logpdf(x)
    np.testing.assert_allclose(
        np.asarray(dist.log_prob(None, x)), expected, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("var", [1.0, 4.0])
def test_mvn_sample_variance(var):
    import jax

    dist = MultivariateNormal(2, var=var)
    s = np.asarray(dist.sample(None, jax.random.PRNGKey(3), 20000))
    assert s.shape == (20000, 2)
    np.testing.assert_allclose(s.var(axis=0), var, rtol=0.1)
    np.testing.assert_allclose(s.mean(axis=0), 0.0, atol=0.1)
