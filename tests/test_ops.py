"""Tests for the Pallas kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nessai_tpu.flows.rqs import rational_quadratic_spline
from nessai_tpu.ops import affine_coupling_transform, rqs_pallas


@pytest.mark.parametrize("inverse", [False, True])
def test_rqs_pallas_matches_reference(rng, inverse):
    n, d, K = 300, 3, 8
    x = jnp.asarray(rng.uniform(-6, 6, (n, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, d, K)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(n, d, K)), jnp.float32)
    dd = jnp.asarray(rng.normal(size=(n, d, K - 1)), jnp.float32)
    ref_out, ref_ld = rational_quadratic_spline(x, w, h, dd, inverse=inverse)
    out, ld = rqs_pallas(x, w, h, dd, inverse=inverse, interpret=True)
    # float32 bin-edge rounding can differ between the two layouts
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ld), np.asarray(ref_ld), atol=1e-3, rtol=1e-3
    )


def test_rqs_pallas_roundtrip(rng):
    n, d, K = 128, 2, 6
    x = jnp.asarray(rng.uniform(-4, 4, (n, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, d, K)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(n, d, K)), jnp.float32)
    dd = jnp.asarray(rng.normal(size=(n, d, K - 1)), jnp.float32)
    z, ld = rqs_pallas(x, w, h, dd, interpret=True)
    x2, ld_inv = rqs_pallas(z, w, h, dd, inverse=True, interpret=True)
    # float32 bin-edge roundtrip precision
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(ld + ld_inv), 0.0, atol=5e-3
    )


@pytest.mark.parametrize("inverse", [False, True])
def test_affine_coupling_pallas(rng, inverse):
    n, d = 200, 4
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    out, ld = affine_coupling_transform(
        x, s, t, inverse=inverse, interpret=True
    )
    s_c = 5.0 * jnp.tanh(s / 5.0)
    if inverse:
        expected = (x - t) * jnp.exp(-s_c)
        expected_ld = -jnp.sum(s_c, axis=1)
    else:
        expected = x * jnp.exp(s_c) + t
        expected_ld = jnp.sum(s_c, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ld), np.asarray(expected_ld), atol=1e-4
    )


def test_affine_coupling_roundtrip(rng):
    n, d = 100, 3
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    z, ld = affine_coupling_transform(x, s, t, interpret=True)
    x2, ld_inv = affine_coupling_transform(z, s, t, inverse=True, interpret=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-5)


def test_affine_coupling_vjp_reference_matches_bijector(rng):
    """The jnp reference used for the Pallas backward must match the
    AffineCoupling soft-clamp math exactly (same clamp, same log-det)."""
    import jax
    import jax.numpy as jnp

    from nessai_tpu.ops.coupling_pallas import _reference_transform

    x = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    raw = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    clamp = 5.0
    y, ld = _reference_transform(x, raw, t, False, clamp)
    s = clamp * jnp.tanh(raw / clamp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x * jnp.exp(s) + t))
    np.testing.assert_allclose(np.asarray(ld), np.asarray(jnp.sum(s, axis=-1)))
    # inverse undoes forward
    x2, ld2 = _reference_transform(y, raw, t, True, clamp)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-5)
    # gradients flow through all three inputs
    g = jax.grad(
        lambda a, b, c: jnp.sum(_reference_transform(a, b, c, False, clamp)[0])
    )
    ga = g(x, raw, t)
    assert bool(jnp.all(jnp.isfinite(ga)))


def test_affine_coupling_pallas_padding_branch(rng):
    """Batch not a multiple of the block size exercises the pad path."""
    from nessai_tpu.ops import affine_coupling_transform

    n, d = 13, 3
    x = rng.standard_normal((n, d)).astype(np.float32)
    s = rng.standard_normal((n, d)).astype(np.float32)
    t = rng.standard_normal((n, d)).astype(np.float32)
    y, ld = affine_coupling_transform(x, s, t, interpret=True)
    assert y.shape == (n, d) and ld.shape == (n,)
    from nessai_tpu.ops.coupling_pallas import _reference_transform

    y_ref, ld_ref = _reference_transform(x, s, t, False, 5.0)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ld, ld_ref, rtol=1e-5, atol=1e-5)


def test_affine_coupling_pallas_vjp_grads(rng):
    """The custom-VJP wrapper's gradients match autodiff through the
    jnp reference transform."""
    import jax
    import jax.numpy as jnp

    from nessai_tpu.ops.coupling_pallas import (
        _reference_transform,
        affine_coupling_pallas_vjp,
    )

    n, d = 8, 2
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)

    def loss_vjp(x, s, t):
        y, ld = affine_coupling_pallas_vjp(x, s, t, False, 5.0, True)
        return jnp.sum(y**2) + jnp.sum(ld)

    def loss_ref(x, s, t):
        y, ld = _reference_transform(x, s, t, False, 5.0)
        return jnp.sum(y**2) + jnp.sum(ld)

    g_vjp = jax.grad(loss_vjp, argnums=(0, 1, 2))(x, s, t)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s, t)
    for a, b in zip(g_vjp, g_ref):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_rqs_pallas_vjp_grads(rng):
    """rqs_pallas_vjp gradients match autodiff through the jnp spline."""
    import jax
    import jax.numpy as jnp

    from nessai_tpu.flows.rqs import rational_quadratic_spline
    from nessai_tpu.ops.rqs_pallas import rqs_pallas_vjp

    n, d, K = 8, 2, 4
    x = jnp.asarray(rng.uniform(-3, 3, (n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, d, K)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((n, d, K)), jnp.float32)
    dd = jnp.asarray(rng.standard_normal((n, d, K - 1)), jnp.float32)

    def loss_vjp(x, w, h, dd):
        y, ld = rqs_pallas_vjp(x, w, h, dd, False, 5.0, True)
        return jnp.sum(y**2) + jnp.sum(ld)

    def loss_ref(x, w, h, dd):
        y, ld = rational_quadratic_spline(
            x, w, h, dd, inverse=False, tail_bound=5.0
        )
        return jnp.sum(y**2) + jnp.sum(ld)

    g_vjp = jax.grad(loss_vjp, argnums=(0, 1, 2, 3))(x, w, h, dd)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, h, dd)
    for a, b in zip(g_vjp, g_ref):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
