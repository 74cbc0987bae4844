"""Adapters for externally-defined flows.

The reference's ``GlasflowWrapper`` (``nessai/experimental/flows/
glasflow.py:13``) adapts external (glasflow/nflows) architectures so
they can be selected via ``ftype``. In this torch-free build the same
capability is provided by:

- :func:`nessai_tpu.flows.register_flow` — register any builder
  callable under an ``ftype`` name (``flow_config={'ftype': 'my-flow'}``);
- the ``flow`` config key — pass the builder callable directly;
- :class:`ExternalBijector` below — wrap plain ``(init, forward,
  inverse)`` functions as a bijector usable inside any chain.

The glasflow-prefixed names (``glasflow-realnvp`` etc.) resolve to the
native JAX builders (``nessai_tpu/flows/utils.py``).
"""

import jax.numpy as jnp

from ...flows.bijectors import Bijector
from ...flows.utils import get_native_flow_class, register_flow

__all__ = [
    "ExternalBijector",
    "get_native_flow_class",
    "register_flow",
]


class ExternalBijector(Bijector):
    """Wrap externally-defined pure functions as a bijector.

    Parameters
    ----------
    init_fn : callable
        ``init_fn(key) -> params`` returning any parameter pytree.
    forward_fn : callable
        ``forward_fn(params, x, context) -> (z, log_det)`` — data to
        latent with the log-Jacobian determinant of the applied
        direction, per sample.
    inverse_fn : callable
        ``inverse_fn(params, z, context) -> (x, log_det)``.

    The wrapped functions must be jittable (traced into the training and
    populate device programs). This is the functional analogue of the
    reference's ``GlasflowWrapper``: any external bijection satisfying
    the pure-function contract slots into a
    :class:`~nessai_tpu.flows.bijectors.Chain` or a full
    :class:`~nessai_tpu.flows.base.Flow`.
    """

    def __init__(self, init_fn, forward_fn, inverse_fn):
        if not all(callable(f) for f in (init_fn, forward_fn, inverse_fn)):
            raise TypeError("init_fn, forward_fn and inverse_fn must be callable")
        self._init_fn = init_fn
        self._forward_fn = forward_fn
        self._inverse_fn = inverse_fn

    def init(self, key):
        return self._init_fn(key)

    def forward(self, params, x, context=None, rng=None):
        z, log_det = self._forward_fn(params, x, context)
        return z, jnp.asarray(log_det)

    def inverse(self, params, z, context=None, rng=None):
        x, log_det = self._inverse_fn(params, z, context)
        return x, jnp.asarray(log_det)


def get_glasflow_class(name: str):
    """Resolve a ``glasflow-``-prefixed flow name to its builder.

    Name-level parity with the reference resolver
    (``nessai/experimental/flows/glasflow.py:72-84``): the name must
    contain ``glasflow`` and the short name must be known; here the
    glasflow architectures map to the native JAX builders registered
    under the same prefixed names.
    """
    name = name.lower()
    if "glasflow" not in name:
        raise ValueError("'glasflow' missing from name")
    try:
        return get_native_flow_class(name)
    except ValueError:
        raise ValueError(f"{name} is not a known glasflow flow")


__all__.append("get_glasflow_class")
