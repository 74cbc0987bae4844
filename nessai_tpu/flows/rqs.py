"""Rational-quadratic spline transforms (Durkan et al. 2019,
arXiv:1906.04032) implemented in pure JAX.

Replaces glasflow's ``PiecewiseRationalQuadraticCouplingTransform`` used by
the reference (``nessai/flows/nsf.py:98``). Written branch-free for XLA:
the bin search is a vectorised comparison-sum, the in/out-of-tail split is
a ``where`` mask — no data-dependent control flow, so the whole transform
fuses into the surrounding coupling layer.
"""

import jax
import jax.numpy as jnp

__all__ = ["rational_quadratic_spline", "DEFAULT_MIN_BIN_WIDTH"]

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _normalise_bins(unnorm, num_bins, total, min_size):
    probs = jnp.exp(unnorm - jnp.max(unnorm, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = min_size + (1 - min_size * num_bins) * probs
    return probs * total


def rational_quadratic_spline(
    inputs,
    unnormalised_widths,
    unnormalised_heights,
    unnormalised_derivatives,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    tails: str = "linear",
):
    """Monotone RQ spline.

    With ``tails='linear'`` (default) the spline lives on
    ``[-tail_bound, tail_bound]`` with identity tails and
    ``unnormalised_derivatives`` holding the ``K - 1`` interior knots
    (boundary derivatives fixed to 1). With ``tails=None`` the spline
    maps ``[0, 1] -> [0, 1]`` (nflows semantics for couplings defined on
    the unit hypercube) and ``unnormalised_derivatives`` holds all
    ``K + 1`` knot derivatives; out-of-domain inputs pass through
    unchanged.

    Parameters
    ----------
    inputs : [...,]
    unnormalised_widths / heights : [..., K]
    unnormalised_derivatives : [..., K - 1] ('linear') or [..., K + 1]
        (``tails=None``)

    Returns ``(outputs, log_abs_det)`` of the same shape as ``inputs``.
    """
    num_bins = unnormalised_widths.shape[-1]
    if tails == "linear":
        left = bottom = -tail_bound
        right = top = tail_bound
    else:
        left = bottom = 0.0
        right = top = 1.0

    inside = (inputs >= left) & (inputs <= right)
    # Clamp out-of-range inputs to a safe value so spline math stays finite.
    x = jnp.where(inside, inputs, 0.5 * (left + right))

    widths = _normalise_bins(
        unnormalised_widths, num_bins, right - left, min_bin_width
    )
    heights = _normalise_bins(
        unnormalised_heights, num_bins, top - bottom, min_bin_height
    )
    cumwidths = jnp.concatenate(
        [
            jnp.full(widths.shape[:-1] + (1,), left, widths.dtype),
            left + jnp.cumsum(widths, axis=-1),
        ],
        axis=-1,
    )
    cumheights = jnp.concatenate(
        [
            jnp.full(heights.shape[:-1] + (1,), bottom, heights.dtype),
            bottom + jnp.cumsum(heights, axis=-1),
        ],
        axis=-1,
    )
    # Pin the endpoints exactly.
    cumwidths = cumwidths.at[..., -1].set(right)
    cumheights = cumheights.at[..., -1].set(top)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # Shift so that zero-valued raw params give derivative exactly 1
    # (identity spline at zero-init, matching the zero-init conditioners).
    shift = jnp.log(jnp.expm1(1.0 - min_derivative))
    derivatives = min_derivative + jax.nn.softplus(
        unnormalised_derivatives + shift
    )
    if tails == "linear":
        ones = jnp.ones(derivatives.shape[:-1] + (1,), derivatives.dtype)
        derivatives = jnp.concatenate([ones, derivatives, ones], axis=-1)

    # Vectorised bin search: index of the bin containing x.
    ref = cumheights if inverse else cumwidths
    idx = jnp.sum(x[..., None] >= ref[..., 1:-1], axis=-1)

    def take(a):
        return jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]

    in_w = take(widths)
    in_cw = take(cumwidths)
    in_h = take(heights)
    in_ch = take(cumheights)
    d_k = take(derivatives[..., :-1])
    d_k1 = take(derivatives[..., 1:])
    s = in_h / in_w  # bin slope

    if inverse:
        # Solve the quadratic for theta given y (eq. 6-8 of the NSF paper).
        y_rel = x - in_ch
        a = in_h * (s - d_k) + y_rel * (d_k + d_k1 - 2 * s)
        b = in_h * d_k - y_rel * (d_k + d_k1 - 2 * s)
        c = -s * y_rel
        disc = b**2 - 4 * a * c
        disc = jnp.maximum(disc, 0.0)
        theta = (2 * c) / (-b - jnp.sqrt(disc))
        theta = jnp.clip(theta, 0.0, 1.0)
        outputs = theta * in_w + in_cw
        denom = s + (d_k + d_k1 - 2 * s) * theta * (1 - theta)
        dydx_num = s**2 * (
            d_k1 * theta**2 + 2 * s * theta * (1 - theta) + d_k * (1 - theta) ** 2
        )
        log_det = -(jnp.log(dydx_num) - 2 * jnp.log(denom))
    else:
        theta = (x - in_cw) / in_w
        theta = jnp.clip(theta, 0.0, 1.0)
        denom = s + (d_k + d_k1 - 2 * s) * theta * (1 - theta)
        outputs = in_ch + in_h * (
            s * theta**2 + d_k * theta * (1 - theta)
        ) / denom
        dydx_num = s**2 * (
            d_k1 * theta**2 + 2 * s * theta * (1 - theta) + d_k * (1 - theta) ** 2
        )
        log_det = jnp.log(dydx_num) - 2 * jnp.log(denom)

    if tails != "linear":
        # float rounding can land outputs a few ulp outside the box,
        # which a uniform base distribution maps to -inf — pin them
        lo, hi = (left, right) if inverse else (bottom, top)
        outputs = jnp.clip(outputs, lo, hi)
    outputs = jnp.where(inside, outputs, inputs)
    log_det = jnp.where(inside, log_det, 0.0)
    return outputs, log_det
