"""Tests for the flow stack: invertibility, Jacobian correctness,
log-prob consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nessai_tpu.flows import (
    ActNorm,
    AffineCoupling,
    Chain,
    Logit,
    LULinear,
    MaskedAffineAutoregressive,
    Permutation,
    RQSCoupling,
    configure_model,
    get_n_neurons,
    reset_permutations,
    reset_weights,
)

DIM = 4


def _rand_params_bijector(bij, key=0):
    return bij.init(jax.random.PRNGKey(key))


def _randomise(params, key, scale=0.5):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            out.append(leaf + scale * jax.random.normal(k, leaf.shape))
        else:
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)


BIJECTORS = [
    AffineCoupling(np.array([1, 0, 1, 0]), n_neurons=8),
    AffineCoupling(np.array([0, 1, 0, 1]), n_neurons=8, net="mlp"),
    AffineCoupling(np.array([1, 0, 1, 0]), n_neurons=8, volume_preserving=True),
    RQSCoupling(np.array([1, 0, 1, 0]), n_neurons=8, num_bins=4),
    LULinear(DIM, identity_init=False),
    Permutation(DIM),
    ActNorm(DIM),
    MaskedAffineAutoregressive(DIM, n_neurons=16),
]


@pytest.mark.parametrize("bij", BIJECTORS, ids=lambda b: type(b).__name__)
def test_bijector_roundtrip(bij):
    params = _randomise(
        _rand_params_bijector(bij), jax.random.PRNGKey(1), scale=0.1
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (32, DIM))
    z, ld_f = bij.forward(params, x)
    x2, ld_i = bij.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-4)


@pytest.mark.parametrize("bij", BIJECTORS, ids=lambda b: type(b).__name__)
def test_bijector_jacobian(bij):
    """log_det must match the exact autodiff Jacobian determinant."""
    params = _randomise(
        _rand_params_bijector(bij), jax.random.PRNGKey(3), scale=0.1
    )
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (3, DIM))

    def f(xi):
        return bij.forward(params, xi[None, :])[0][0]

    _, ld = bij.forward(params, x)
    for i in range(3):
        J = jax.jacobian(f)(x[i])
        expected = np.linalg.slogdet(np.asarray(J))[1]
        np.testing.assert_allclose(float(ld[i]), expected, atol=1e-4)


def test_logit_roundtrip():
    bij = Logit()
    x = jnp.linspace(0.01, 0.99, 16)[:, None] * jnp.ones((1, 2))
    z, ld_f = bij.forward({}, x)
    x2, ld_i = bij.inverse({}, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-4)


def test_rqs_tails_identity():
    bij = RQSCoupling(np.array([1, 0, 1, 0]), n_neurons=8, tail_bound=2.0)
    params = _randomise(bij.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(5))
    x = 10.0 * jnp.ones((4, DIM))
    z, ld = bij.forward(params, x)
    # outside the tail bound the transform dims are identity
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)


@pytest.mark.parametrize("ftype", ["realnvp", "nsf", "maf"])
def test_configure_model_and_log_prob(ftype):
    flow, params, key = configure_model(
        dict(n_inputs=DIM, n_blocks=2, n_neurons=8, n_layers=1, ftype=ftype)
    )
    x = jax.random.normal(jax.random.PRNGKey(6), (16, DIM))
    log_p = flow.log_prob(params, x)
    assert log_p.shape == (16,)
    assert np.all(np.isfinite(np.asarray(log_p)))
    # identity init => log_prob equals the standard normal density
    expected = -0.5 * np.sum(np.asarray(x) ** 2, axis=1) - 0.5 * DIM * np.log(
        2 * np.pi
    )
    np.testing.assert_allclose(np.asarray(log_p), expected, atol=1e-4)


def test_sample_and_log_prob_consistent():
    flow, params, key = configure_model(
        dict(n_inputs=DIM, n_blocks=2, n_neurons=8, n_layers=1)
    )
    params = _randomise(params, jax.random.PRNGKey(7), scale=0.05)
    x, log_p = flow.sample_and_log_prob(params, jax.random.PRNGKey(8), 64)
    log_p2 = flow.log_prob(params, x)
    np.testing.assert_allclose(np.asarray(log_p), np.asarray(log_p2), atol=1e-4)


def test_get_n_neurons():
    assert get_n_neurons(None, 3) == 6
    assert get_n_neurons("double", 3) == 6
    assert get_n_neurons("equal", 3) == 3
    assert get_n_neurons("half", 4) == 2
    assert get_n_neurons(10) == 10


def test_reset_weights_keeps_permutations():
    flow, params, key = configure_model(
        dict(n_inputs=DIM, n_blocks=2, n_neurons=8, n_layers=1)
    )
    new = reset_weights(flow, params, jax.random.PRNGKey(9))
    from nessai_tpu.flows.bijectors import Permutation as P

    for i, b in enumerate(flow.bijector.bijectors):
        if isinstance(b, P):
            np.testing.assert_array_equal(
                np.asarray(params["bijector"][i]["perm"]),
                np.asarray(new["bijector"][i]["perm"]),
            )


def test_stacked_params_vmap_log_prob():
    """INS log_prob_all pattern: vmap one flow over stacked params."""
    flow, params, key = configure_model(
        dict(n_inputs=DIM, n_blocks=2, n_neurons=8, n_layers=1,
             linear_transform=None)
    )
    p1 = _randomise(params, jax.random.PRNGKey(10), scale=0.05)
    p2 = _randomise(params, jax.random.PRNGKey(11), scale=0.05)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    x = jax.random.normal(jax.random.PRNGKey(12), (16, DIM))
    log_p_all = jax.vmap(lambda p: flow.log_prob(p, x))(stacked)
    assert log_p_all.shape == (2, 16)
    np.testing.assert_allclose(
        np.asarray(log_p_all[0]), np.asarray(flow.log_prob(p1, x)), atol=1e-5
    )


def test_stacked_params_vmap_with_lu():
    """log_prob_all pattern with LU linear transforms in the chain."""
    flow, params, key = configure_model(
        dict(n_inputs=DIM, n_blocks=2, n_neurons=8, n_layers=1,
             linear_transform="lu")
    )
    p1 = _randomise(params, jax.random.PRNGKey(20), scale=0.05)
    p2 = _randomise(params, jax.random.PRNGKey(21), scale=0.05)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    x = jax.random.normal(jax.random.PRNGKey(22), (16, DIM))
    log_p_all = jax.vmap(lambda p: flow.log_prob(p, x))(stacked)
    assert log_p_all.shape == (2, 16)
    np.testing.assert_allclose(
        np.asarray(log_p_all[1]), np.asarray(flow.log_prob(p2, x)), atol=1e-5
    )


# ----------------------------------------------------------------------
# External-flow adapters (reference GlasflowWrapper role,
# nessai/experimental/flows/glasflow.py:13)
# ----------------------------------------------------------------------
def test_register_flow_custom_ftype(tmp_path, rng):
    import jax

    from nessai_tpu.flowmodel import FlowModel
    from nessai_tpu.flows import register_flow
    from nessai_tpu.flows.realnvp import build_realnvp_bijector

    def my_builder(dim, n_blocks=2, n_neurons=4, n_layers=1, **kwargs):
        return build_realnvp_bijector(
            dim, n_blocks=n_blocks, n_neurons=n_neurons, n_layers=n_layers
        )

    register_flow("my-custom-flow", my_builder)
    fm = FlowModel(
        flow_config=dict(
            n_inputs=2, ftype="my-custom-flow", n_blocks=2, n_neurons=4
        ),
        training_config=dict(max_epochs=3, batch_size=32, patience=2),
        output=str(tmp_path),
        rng=rng,
    )
    history = fm.train(rng.normal(size=(64, 2)).astype(np.float32))
    assert np.isfinite(history["loss"]).all()

    with pytest.raises(TypeError):
        register_flow("bad", "not-callable")


def test_flow_config_callable_flow_key(rng):
    from nessai_tpu.flows import configure_model
    from nessai_tpu.flows.base import Flow
    from nessai_tpu.flows.realnvp import build_realnvp_bijector

    calls = []

    def my_builder(dim, **kwargs):
        calls.append(dim)
        return build_realnvp_bijector(dim, n_blocks=2, n_neurons=4, n_layers=1)

    flow, params, _ = configure_model(
        dict(n_inputs=3, flow=my_builder)
    )
    assert calls == [3]
    assert isinstance(flow, Flow)
    x = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    assert np.isfinite(np.asarray(flow.log_prob(params, x))).all()

    with pytest.raises(TypeError):
        configure_model(dict(n_inputs=3, flow="not-callable"))


def test_external_bijector_wrapper():
    import jax
    import jax.numpy as jnp

    from nessai_tpu.experimental.flows import ExternalBijector
    from nessai_tpu.flows.base import Flow
    from nessai_tpu.flows.bijectors import Chain
    from nessai_tpu.flows.distributions import StandardNormal

    # a simple externally-defined affine bijection
    def init_fn(key):
        return {"log_a": jnp.zeros(()), "b": jnp.ones(())}

    def forward_fn(params, x, context):
        a = jnp.exp(params["log_a"])
        return a * x + params["b"], (
            params["log_a"] * x.shape[-1] * jnp.ones(x.shape[:-1])
        )

    def inverse_fn(params, z, context):
        a = jnp.exp(-params["log_a"])
        return a * (z - params["b"]), (
            -params["log_a"] * z.shape[-1] * jnp.ones(z.shape[:-1])
        )

    bij = ExternalBijector(init_fn, forward_fn, inverse_fn)
    flow = Flow(Chain([bij]), StandardNormal(2), 2)
    params = flow.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(6, 2)).astype(np.float32)
    )
    z, ld = flow.forward(params, x)
    x2, ld2 = flow.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-6)
    lp = flow.log_prob(params, x)
    assert np.isfinite(np.asarray(lp)).all()

    with pytest.raises(TypeError):
        ExternalBijector(init_fn, "nope", inverse_fn)


class TestRound3FlowConfigBranches:
    def test_nsf_custom_masks(self, rng):
        import jax
        import jax.numpy as jnp

        from nessai_tpu.flows.utils import configure_model

        # 1-D mask alternates automatically
        flow, params, _ = configure_model(
            dict(
                ftype="nsf",
                n_inputs=4,
                n_blocks=2,
                n_neurons=8,
                kwargs=dict(mask=[1, 1, -1, -1]),
            )
        )
        x = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
        z, lj = flow.forward(params, x)
        x2, lj_inv = flow.inverse(params, z)
        np.testing.assert_allclose(
            np.asarray(x2), np.asarray(x), atol=1e-4
        )
        # 2-D mask list taken as-is
        flow2, p2, _ = configure_model(
            dict(
                ftype="nsf",
                n_inputs=4,
                n_blocks=2,
                n_neurons=8,
                kwargs=dict(mask=[[1, 1, -1, -1], [-1, -1, 1, 1]]),
            )
        )
        z2, _ = flow2.forward(p2, x)
        assert z2.shape == x.shape

    def test_nsf_pre_transform_logit_and_actnorm(self, rng):
        import jax
        import jax.numpy as jnp

        from nessai_tpu.flows.utils import configure_model

        flow, params, _ = configure_model(
            dict(
                ftype="nsf",
                n_inputs=2,
                n_blocks=2,
                n_neurons=8,
                kwargs=dict(
                    pre_transform="logit",
                    batch_norm_between_layers=True,
                ),
            )
        )
        x = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 2)), jnp.float32)
        z, lj = flow.forward(params, x)
        x2, lj_inv = flow.inverse(params, z)
        np.testing.assert_allclose(
            np.asarray(x2), np.asarray(x), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(lj + lj_inv), 0.0, atol=1e-4
        )
