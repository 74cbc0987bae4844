"""Every registry reparameterisation round-trips and (where defined)
provides a jittable device inverse.

One parametrized case per registry alias (reference
``nessai/reparameterisations/__init__.py:28-198``): construct with
appropriate bounds/data, forward + inverse on prior-like draws, and
check ``jax_inverse`` agreement when available.
"""

import numpy as np
import pytest

from nessai_tpu.livepoint import empty_structured_array
from nessai_tpu.reparameterisations import (
    default_reparameterisations,
    get_reparameterisation,
)

#: registry aliases and the (bounds, data-generator) each needs
CASES = {
    "default": ([0.0, 5.0], lambda r, n: r.uniform(0, 5, n)),
    "rescaletobounds": ([0.0, 5.0], lambda r, n: r.uniform(0, 5, n)),
    "rescale-to-bounds": ([0.0, 5.0], lambda r, n: r.uniform(0, 5, n)),
    "offset": ([2.0, 6.0], lambda r, n: r.uniform(2, 6, n)),
    "inversion": ([0.0, 1.0], lambda r, n: r.beta(1, 4, n)),
    "inversion-duplicate": ([0.0, 1.0], lambda r, n: r.beta(1, 4, n)),
    "logit": ([0.0, 1.0], lambda r, n: r.uniform(0.01, 0.99, n)),
    "log-rescale": ([0.0, 2.0], lambda r, n: r.uniform(0.05, 1.95, n)),
    "scaleandshift": ([-5.0, 5.0], lambda r, n: r.normal(0, 1, n)),
    "zscore": ([-5.0, 5.0], lambda r, n: r.normal(0, 1, n)),
    "standardize": ([-5.0, 5.0], lambda r, n: r.normal(0, 1, n)),
    "z-score": ([-5.0, 5.0], lambda r, n: r.normal(0, 1, n)),
    "zscore-gaussian-cdf": ([-5.0, 5.0], lambda r, n: r.normal(0, 1, n)),
    "z-score-gaussian-cdf": ([-5.0, 5.0], lambda r, n: r.normal(0, 1, n)),
    "z-score-logit": (
        [0.0, 1.0],
        lambda r, n: r.uniform(0.05, 0.95, n),
    ),
    "zscore-logit": ([0.0, 1.0], lambda r, n: r.uniform(0.05, 0.95, n)),
    "z-score-inv-gaussian-cdf": (
        [0.0, 1.0],
        lambda r, n: r.uniform(0.05, 0.95, n),
    ),
    "zscore-inv-gaussian-cdf": (
        [0.0, 1.0],
        lambda r, n: r.uniform(0.05, 0.95, n),
    ),
    "log-z-score": ([0.1, 4.0], lambda r, n: r.uniform(0.2, 3.8, n)),
    "log-standardise": ([0.1, 4.0], lambda r, n: r.uniform(0.2, 3.8, n)),
    "angle": (
        [0.0, 2 * np.pi],
        lambda r, n: r.uniform(0, 2 * np.pi, n),
    ),
    "angle-pi": ([0.0, np.pi], lambda r, n: r.uniform(0, np.pi, n)),
    "angle-2pi": (
        [0.0, 2 * np.pi],
        lambda r, n: r.uniform(0, 2 * np.pi, n),
    ),
    "angle-sine": ([0.0, np.pi], lambda r, n: r.uniform(0, np.pi, n)),
    "angle-cosine": ([0.0, np.pi], lambda r, n: r.uniform(0, np.pi, n)),
    "periodic": (
        [0.0, 2 * np.pi],
        lambda r, n: r.uniform(0, 2 * np.pi, n),
    ),
    "to-cartesian": ([0.2, 0.9], lambda r, n: r.uniform(0.2, 0.9, n)),
    "dequantise": (
        [0, 4],
        lambda r, n: r.integers(0, 5, n).astype(float),
    ),
    "dequantise-logit": (
        [0, 4],
        lambda r, n: r.integers(0, 5, n).astype(float),
    ),
    "none": ([-1.0, 1.0], lambda r, n: r.uniform(-1, 1, n)),
    "null": ([-1.0, 1.0], lambda r, n: r.uniform(-1, 1, n)),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_registry_alias_roundtrip(name, rng):
    bounds, gen = CASES[name]
    cls, kwargs = get_reparameterisation(name)
    kwargs.setdefault("prior_bounds", {"p": np.asarray(bounds, float)})
    if name == "scaleandshift":
        kwargs.setdefault("scale", 2.0)
    r = cls(parameters=["p"], rng=rng, **kwargs)
    n = 100
    all_params = ["p"] + [
        a for a in getattr(r, "auxiliary_parameters", [])
    ]
    x = empty_structured_array(n, names=all_params)
    x["p"] = gen(rng, n)
    r.update(x)
    x_prime = np.zeros(
        n, dtype=[(pp, "f8") for pp in r.prime_parameters]
    )
    log_j = np.zeros(n)
    x1, x_prime, log_j = r.reparameterise(x.copy(), x_prime, log_j)
    m = len(x_prime)
    x_out = empty_structured_array(m, names=all_params)
    log_j_inv = np.zeros(m)
    x_out, _, log_j_inv = r.inverse_reparameterise(
        x_out, x_prime, log_j_inv
    )
    k = m // n
    # duplicating modes already return x expanded to length m
    if len(x1) == m:
        expected = np.asarray(x1["p"], float)
    else:
        expected = np.tile(np.asarray(x1["p"], float), k)
    if name.startswith("dequantise"):
        # inverse floors back to the original integers
        base = (
            np.asarray(x1["p"], float)
            if len(x1) == m
            else np.tile(np.asarray(x["p"], float), k)
        )
        np.testing.assert_allclose(
            x_out["p"], np.floor(base), atol=1e-8
        )
    else:
        np.testing.assert_allclose(x_out["p"], expected, atol=1e-8)
    np.testing.assert_allclose(log_j, -log_j_inv[: len(log_j)], atol=1e-8)


@pytest.mark.parametrize("name", sorted(CASES))
def test_registry_alias_jax_inverse_matches(name, rng):
    """Where the alias provides a device inverse, it must match the host
    inverse on the prime samples produced by the forward pass."""
    import jax.numpy as jnp

    bounds, gen = CASES[name]
    cls, kwargs = get_reparameterisation(name)
    kwargs.setdefault("prior_bounds", {"p": np.asarray(bounds, float)})
    if name == "scaleandshift":
        kwargs.setdefault("scale", 2.0)
    r = cls(parameters=["p"], rng=rng, **kwargs)
    built = r.jax_inverse()
    if built is None:
        pytest.skip("no device inverse for this alias")
    fn, fingerprint = built
    n = 100
    all_params = ["p"] + [
        a for a in getattr(r, "auxiliary_parameters", [])
    ]
    x = empty_structured_array(n, names=all_params)
    x["p"] = gen(rng, n)
    r.update(x)
    x_prime = np.zeros(
        n, dtype=[(pp, "f8") for pp in r.prime_parameters]
    )
    x1, x_prime, _ = r.reparameterise(
        x.copy(), x_prime, np.zeros(n)
    )
    m = len(x_prime)
    x_host = empty_structured_array(m, names=all_params)
    lj_host = np.zeros(m)
    x_host, _, lj_host = r.inverse_reparameterise(
        x_host, x_prime, lj_host
    )
    cols = {
        pp: jnp.asarray(np.asarray(x_prime[pp]), jnp.float32)
        for pp in x_prime.dtype.names
    }
    updates, lj_dev = fn(cols, r.jax_inverse_consts())
    for p in updates:
        np.testing.assert_allclose(
            np.asarray(updates[p], np.float64),
            np.asarray(x_host[p], np.float64),
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"{name}:{p}",
        )
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(lj_dev, np.float64), (m,)),
        lj_host,
        rtol=1e-4,
        atol=1e-3,
    )


def test_registry_covers_reference_alias_count():
    """The registry carries the reference's alias surface."""
    assert len(default_reparameterisations) >= 34
