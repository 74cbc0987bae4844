"""Pallas TPU kernel for the rational-quadratic spline transform.

The RQS transform (``nessai_tpu/flows/rqs.py``) is the most
compute-dense elementwise op in the flow stack (bin normalisation, bin
search, rational-quadratic evaluation, log-derivative). This kernel runs
it tile-by-tile entirely in VMEM with a VPU-friendly layout — the batch
axis rides the 128-wide lane dimension and the K spline bins ride the
sublanes — and uses **one-hot select-sums instead of gathers** for the
bin lookup (dynamic gathers lower poorly on the TPU VPU; K is small so
the one-hot contraction is cheap and fully vectorised).

Numerically identical (to float32) to the jnp reference implementation —
see ``tests/test_ops.py``.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..flows.rqs import (
    DEFAULT_MIN_BIN_WIDTH,
    DEFAULT_MIN_BIN_HEIGHT,
    DEFAULT_MIN_DERIVATIVE,
)

__all__ = ["rqs_pallas"]


def _spline_math_kt(x, w_raw, h_raw, d_raw, inverse, B, min_w, min_h, min_d):
    """RQS on a [K, cols] tile: bins along sublanes, batch along lanes."""
    K = w_raw.shape[0]

    def norm_bins(raw, min_size):
        p = jnp.exp(raw - jnp.max(raw, axis=0, keepdims=True))
        p = p / jnp.sum(p, axis=0, keepdims=True)
        return (min_size + (1 - min_size * K) * p) * (2 * B)

    widths = norm_bins(w_raw, min_w)  # [K, cols]
    heights = norm_bins(h_raw, min_h)

    def prefix_sum(a):
        # cumsum is not lowerable in Pallas TPU; K is small and static,
        # so unroll the prefix sum explicitly.
        rows = [a[0:1, :]]
        for i in range(1, a.shape[0]):
            rows.append(rows[-1] + a[i : i + 1, :])
        return jnp.concatenate(rows, axis=0)

    cumw = -B + prefix_sum(widths)  # right edges
    cumh = -B + prefix_sum(heights)
    leftw = cumw - widths
    lefth = cumh - heights

    import math

    # constant shift so zero raw params give derivative 1 (expm1/softplus
    # are not lowerable in Pallas TPU; use python math + a stable manual
    # softplus built from supported primitives)
    shift = math.log(math.expm1(1.0 - min_d))
    v = d_raw + shift
    softplus = jnp.maximum(v, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(v)))
    d_int = min_d + softplus  # [K-1, cols]
    ones = jnp.ones((1, d_int.shape[1]), d_int.dtype)
    derivs = jnp.concatenate([ones, d_int, ones], axis=0)  # [K+1, cols]

    inside = (x >= -B) & (x <= B)  # [cols]
    xc = jnp.where(inside, x, 0.0)

    ref_edges = cumh if inverse else cumw
    # count interior right-edges below xc -> bin index in [0, K-1]
    idx = jnp.sum(
        (xc[None, :] >= ref_edges[:-1, :]).astype(jnp.int32), axis=0
    )
    one_hot = (
        jax.lax.broadcasted_iota(jnp.int32, widths.shape, 0) == idx[None, :]
    ).astype(x.dtype)

    def pick(a):
        return jnp.sum(one_hot * a, axis=0)

    in_w = pick(widths)
    in_cw = pick(leftw)
    in_h = pick(heights)
    in_ch = pick(lefth)
    d_k = pick(derivs[:-1, :])
    d_k1 = pick(derivs[1:, :])
    s = in_h / in_w

    if inverse:
        y_rel = xc - in_ch
        a = in_h * (s - d_k) + y_rel * (d_k + d_k1 - 2 * s)
        b = in_h * d_k - y_rel * (d_k + d_k1 - 2 * s)
        c = -s * y_rel
        disc = jnp.maximum(b**2 - 4 * a * c, 0.0)
        theta = (2 * c) / (-b - jnp.sqrt(disc))
        theta = jnp.clip(theta, 0.0, 1.0)
        out = theta * in_w + in_cw
        denom = s + (d_k + d_k1 - 2 * s) * theta * (1 - theta)
        num = s**2 * (
            d_k1 * theta**2
            + 2 * s * theta * (1 - theta)
            + d_k * (1 - theta) ** 2
        )
        log_det = -(jnp.log(num) - 2 * jnp.log(denom))
    else:
        theta = jnp.clip((xc - in_cw) / in_w, 0.0, 1.0)
        denom = s + (d_k + d_k1 - 2 * s) * theta * (1 - theta)
        out = in_ch + in_h * (s * theta**2 + d_k * theta * (1 - theta)) / denom
        num = s**2 * (
            d_k1 * theta**2
            + 2 * s * theta * (1 - theta)
            + d_k * (1 - theta) ** 2
        )
        log_det = jnp.log(num) - 2 * jnp.log(denom)

    out = jnp.where(inside, out, x)
    log_det = jnp.where(inside, log_det, 0.0)
    return out, log_det


def _kernel(
    x_ref, w_ref, h_ref, d_ref, out_ref, ld_ref, *, inverse, B, min_w, min_h, min_d
):
    out, ld = _spline_math_kt(
        x_ref[0, :], w_ref[:], h_ref[:], d_ref[:], inverse, B, min_w, min_h, min_d
    )
    out_ref[0, :] = out
    ld_ref[0, :] = ld


@partial(
    jax.jit,
    static_argnames=("inverse", "tail_bound", "block_cols", "interpret"),
)
def rqs_pallas(
    inputs,
    unnormalised_widths,
    unnormalised_heights,
    unnormalised_derivatives,
    inverse: bool = False,
    tail_bound: float = 5.0,
    block_cols: int = 2048,
    interpret: bool = False,
):
    """Pallas-accelerated RQS; same semantics as
    :func:`nessai_tpu.flows.rqs.rational_quadratic_spline` with the
    element axes flattened.

    ``inputs``: [...]; ``unnormalised_widths/heights``: [..., K];
    ``unnormalised_derivatives``: [..., K-1].
    """
    orig_shape = inputs.shape
    K = unnormalised_widths.shape[-1]
    x = inputs.reshape(1, -1).astype(jnp.float32)
    w = unnormalised_widths.reshape(-1, K).T.astype(jnp.float32)
    h = unnormalised_heights.reshape(-1, K).T.astype(jnp.float32)
    d = unnormalised_derivatives.reshape(-1, K - 1).T.astype(jnp.float32)
    n = x.shape[1]
    block = min(block_cols, max(128, n))
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
        h = jnp.pad(h, ((0, 0), (0, pad)))
        d = jnp.pad(d, ((0, 0), (0, pad)))
    m = x.shape[1]
    grid = (m // block,)

    kernel = partial(
        _kernel,
        inverse=inverse,
        B=float(tail_bound),
        min_w=DEFAULT_MIN_BIN_WIDTH,
        min_h=DEFAULT_MIN_BIN_HEIGHT,
        min_d=DEFAULT_MIN_DERIVATIVE,
    )
    out, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (K - 1, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ],
        interpret=interpret,
    )(x, w, h, d)
    out = out[0, :n].reshape(orig_shape)
    ld = ld[0, :n].reshape(orig_shape)
    return out, ld


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def rqs_pallas_vjp(
    inputs, w, h, d, inverse=False, tail_bound=5.0, interpret=False
):
    """RQS with the Pallas forward and an autodiff backward (via the jnp
    reference implementation), so the kernel can sit on the training
    path. ``interpret`` runs the kernel in Pallas interpret mode (CPU
    tests)."""
    return rqs_pallas(
        inputs, w, h, d, inverse=inverse, tail_bound=tail_bound,
        interpret=interpret,
    )


def _rqs_fwd(inputs, w, h, d, inverse, tail_bound, interpret):
    out = rqs_pallas(
        inputs, w, h, d, inverse=inverse, tail_bound=tail_bound,
        interpret=interpret,
    )
    return out, (inputs, w, h, d)


def _rqs_bwd(inverse, tail_bound, interpret, residuals, cotangents):
    from ..flows.rqs import rational_quadratic_spline

    inputs, w, h, d = residuals
    _, vjp = jax.vjp(
        lambda x, w_, h_, d_: rational_quadratic_spline(
            x, w_, h_, d_, inverse=inverse, tail_bound=tail_bound
        ),
        inputs,
        w,
        h,
        d,
    )
    return vjp(cotangents)


rqs_pallas_vjp.defvjp(_rqs_fwd, _rqs_bwd)
