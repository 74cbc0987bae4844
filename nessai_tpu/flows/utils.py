"""Flow construction registry and parameter-reset visitors.

Reference: ``nessai/flows/utils.py`` (``configure_model:208``,
flow-name registry ``:168``, base-distribution registry ``:35-102``,
``get_n_neurons:105``, ``reset_weights:249``, ``reset_permutations:277``).
"""

import copy
import logging
from typing import Optional

import jax

from .base import Flow
from .bijectors import Permutation
from .distributions import (
    MultivariateNormal,
    MultivariateUniform,
    ResampledGaussian,
    StandardNormal,
)
from .maf import build_maf_bijector
from .nsf import build_nsf_bijector
from .realnvp import build_realnvp_bijector

logger = logging.getLogger(__name__)

__all__ = [
    "get_n_neurons",
    "get_native_flow_class",
    "get_flow_class",
    "get_activation_function",
    "get_base_distribution",
    "create_linear_transform",
    "create_pre_transform",
    "register_flow",
    "configure_model",
    "reset_weights",
    "reset_permutations",
]

_BUILDERS = {
    "realnvp": build_realnvp_bijector,
    "frealnvp": build_realnvp_bijector,
    "spline": build_nsf_bijector,
    "nsf": build_nsf_bijector,
    "rq-nsf": build_nsf_bijector,
    "maf": build_maf_bijector,
    # glasflow-prefixed names map to the same native builders
    "glasflow-realnvp": build_realnvp_bijector,
    "glasflow-nsf": build_nsf_bijector,
}


def get_n_neurons(
    n_neurons=None, n_inputs: Optional[int] = None, default: int = 8
) -> int:
    """Resolve the conditioner width. Reference:
    ``nessai/flows/utils.py:105``."""
    if n_neurons is None:
        return 2 * n_inputs if n_inputs else default
    if isinstance(n_neurons, str):
        if n_inputs is None:
            raise ValueError(
                "Could not get number of neurons: n_inputs is required "
                f"for n_neurons={n_neurons!r}"
            )
        if n_neurons == "auto" or n_neurons == "double":
            return 2 * n_inputs
        if n_neurons == "equal":
            return n_inputs
        if n_neurons == "half":
            return max(n_inputs // 2, 1)
        raise ValueError(
            f"Could not get number of neurons: unknown value {n_neurons!r}"
        )
    return int(n_neurons)


def get_activation_function(name: str):
    """Resolve an activation by name (relu/tanh/silu/swish). Reference:
    ``nessai/flows/utils.py`` activations."""
    from .nets import ACTIVATIONS

    if name not in ACTIVATIONS:
        raise ValueError(f"Unknown activation: {name}")
    return ACTIVATIONS[name]


def silu(x):
    """SiLU / swish activation, ``x * sigmoid(x)``. Reference:
    ``nessai/flows/utils.py:24`` (torch); here the jax.nn primitive."""
    import jax.nn

    return jax.nn.silu(x)


def create_linear_transform(linear_transform, features: int):
    """Linear transform(s) between coupling blocks by name. Reference:
    ``nessai/flows/utils.py:295``."""
    from .realnvp import make_linear_transform

    return make_linear_transform(linear_transform, features)


def create_pre_transform(pre_transform, features: int, **kwargs):
    """Pre-transform by name (logit / batch_norm->actnorm). Reference:
    ``nessai/flows/utils.py:332``."""
    from .bijectors import ActNorm, Logit

    if pre_transform == "logit":
        return Logit(**kwargs)
    if pre_transform == "batch_norm":
        # actnorm is the jit-friendly stand-in for batch norm
        return ActNorm(features)
    raise ValueError(f"Unknown pre-transform: {pre_transform}")


def get_base_distribution(n_inputs: int, distribution, **kwargs):
    """Base distribution by name/instance. Reference:
    ``nessai/flows/utils.py:35``."""
    if distribution is None:
        return _make_base_distribution(None, n_inputs, kwargs or None)
    if isinstance(distribution, str):
        return _make_base_distribution(
            distribution.lower(), n_inputs, kwargs or None
        )
    if isinstance(distribution, type):
        # a class: instantiate with the dimension and kwargs
        # (reference ``flows/utils.py:74-78``)
        return distribution(n_inputs, **kwargs)
    return distribution


def get_native_flow_class(name: str):
    name = name.lower()
    if name not in _BUILDERS:
        raise ValueError(
            f"Unknown flow: {name}. Known flows are: {sorted(_BUILDERS)}"
        )
    return _BUILDERS[name]


#: reference-name alias (``nessai/flows/utils.py:168``)
def get_flow_class(name: str):
    """Alias of :func:`get_native_flow_class` matching the reference
    name."""
    return get_native_flow_class(name)


def register_flow(name: str, builder) -> None:
    """Register an externally-defined flow architecture under an
    ``ftype`` name (the role of the reference's experimental
    ``GlasflowWrapper``, ``nessai/experimental/flows/glasflow.py:13`` /
    ``nessai/flows/utils.py:187-206``).

    ``builder(dim, n_blocks=..., n_neurons=..., n_layers=..., **kwargs)``
    must return either a :class:`~nessai_tpu.flows.bijectors.Bijector`
    (combined with the configured base distribution) or a complete
    :class:`~nessai_tpu.flows.base.Flow`.
    """
    if not callable(builder):
        raise TypeError("builder must be callable")
    _BUILDERS[name.lower()] = builder


def _make_base_distribution(name, dim, kwargs):
    if name is None or name == "normal" or name == "mvn":
        var = kwargs.pop("var", 1.0) if isinstance(kwargs, dict) else 1.0
        if var != 1.0:
            return MultivariateNormal(dim, var=var)
        return StandardNormal(dim)
    if name in ("lars", "resampled"):
        dist_kwargs = kwargs or {}
        return ResampledGaussian(dim, **dist_kwargs)
    if name == "uniform":
        return MultivariateUniform(dim)
    raise ValueError(f"Unknown distribution: {name}")


def configure_model(config: dict):
    """Build a :class:`Flow` and initial params from a flow config dict.

    Accepts the reference's config keys (``nessai/flows/utils.py:208``):
    ``n_inputs, n_blocks, n_layers, n_neurons, ftype, distribution,
    distribution_kwargs, kwargs`` (mask, net, linear_transform,
    batch_norm_between_layers, num_bins, tail_bound, pre_transform,
    volume_preserving, context_features, activation).

    Returns ``(flow, params, key)`` where ``key`` is an unused PRNG key
    derived from ``config['seed']`` (default 0).
    """
    config = copy.deepcopy(config)
    dim = config.get("n_inputs")
    if not isinstance(dim, int):
        raise TypeError(
            f"Number of inputs (n_inputs) must be an int, got: {dim}"
        )
    ftype = config.get("ftype", "realnvp")
    if ftype is None and config.get("flow") is None:
        raise RuntimeError("Must specify either 'flow' or 'ftype'.")
    ftype = (ftype or "realnvp").lower()
    if "activation" in config:
        # validate eagerly so a bad name fails here, not at build time
        get_activation_function(config["activation"])
    n_blocks = config.get("n_blocks", 4)
    n_layers = config.get("n_layers", 2)
    n_neurons = get_n_neurons(config.get("n_neurons"), n_inputs=dim)
    extra = dict(config.get("kwargs") or {})
    for k in (
        "mask",
        "net",
        "linear_transform",
        "batch_norm_between_layers",
        "num_bins",
        "tail_bound",
        "tails",
        "pre_transform",
        "volume_preserving",
        "context_features",
        "activation",
        "dropout_probability",
    ):
        if k in config:
            extra[k] = config[k]

    # a callable 'flow' key overrides ftype (reference:
    # ``nessai/flows/utils.py:231-237`` accepts a class directly)
    builder = config.get("flow")
    if builder is not None and not callable(builder):
        raise TypeError(f"'flow' must be callable, got {type(builder)}")
    if builder is None:
        builder = get_native_flow_class(ftype)
    built = builder(
        dim,
        n_blocks=n_blocks,
        n_neurons=n_neurons,
        n_layers=n_layers,
        **extra,
    )
    if isinstance(built, Flow):
        flow = built
    else:
        base = _make_base_distribution(
            config.get("distribution"), dim, config.get("distribution_kwargs")
        )
        flow = Flow(built, base, dim)
    #: static flag the training loop uses to decide whether to thread a
    #: dropout PRNG key through ``log_prob`` (train mode)
    flow.dropout_probability = float(extra.get("dropout_probability", 0.0))
    seed = config.get("seed", 0)
    key = jax.random.PRNGKey(seed)
    init_key, key = jax.random.split(key)
    params = flow.init(init_key)
    return flow, params, key


def reset_weights(flow: Flow, params, key):
    """Fresh parameters for every bijector except permutations (which keep
    their ordering unless :func:`reset_permutations` is used).

    Reference: ``nessai/flows/utils.py:249``.
    """
    new_params = flow.init(key)
    # Keep existing permutations stable.
    bijs = getattr(flow.bijector, "bijectors", [])
    out_bij = []
    for i, b in enumerate(bijs):
        if isinstance(b, Permutation):
            out_bij.append(params["bijector"][i])
        else:
            out_bij.append(new_params["bijector"][i])
    return {"bijector": out_bij, "base": new_params["base"]}


def reset_permutations(flow: Flow, params, key):
    """Redraw permutations (and LU transforms' init). Reference:
    ``nessai/flows/utils.py:277``."""
    new_params = flow.init(key)
    bijs = getattr(flow.bijector, "bijectors", [])
    out_bij = []
    for i, b in enumerate(bijs):
        if isinstance(b, Permutation):
            out_bij.append(new_params["bijector"][i])
        else:
            out_bij.append(params["bijector"][i])
    return {"bijector": out_bij, "base": params["base"]}
