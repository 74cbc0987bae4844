"""Pallas TPU kernel: fused affine-coupling transform.

Fuses the soft-clamped log-scale, the affine transform and the per-row
log-determinant reduction of an affine coupling layer
(``nessai_tpu/flows/bijectors.py:AffineCoupling``) into one VMEM-resident
kernel, avoiding intermediate HBM traffic for large pools.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["affine_coupling_transform", "affine_coupling_pallas_vjp"]


def _kernel(x_ref, s_ref, t_ref, out_ref, ld_ref, *, inverse, clamp):
    s = clamp * jnp.tanh(s_ref[:] / clamp)
    if inverse:
        out_ref[:] = (x_ref[:] - t_ref[:]) * jnp.exp(-s)
        ld_ref[:, 0] = -jnp.sum(s, axis=1)
    else:
        out_ref[:] = x_ref[:] * jnp.exp(s) + t_ref[:]
        ld_ref[:, 0] = jnp.sum(s, axis=1)


@partial(
    jax.jit, static_argnames=("inverse", "clamp", "block_rows", "interpret")
)
def affine_coupling_transform(
    x,
    raw_scale,
    shift,
    inverse: bool = False,
    clamp: float = 5.0,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """(x, raw_s, t) -> (y, log_det_row) with
    ``y = x * exp(clamp*tanh(raw_s/clamp)) + t`` (or the inverse).

    Shapes: [n, d] inputs, [n] log-det.
    """
    n, d = x.shape
    block = min(block_rows, max(8, n))
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        raw_scale = jnp.pad(raw_scale, ((0, pad), (0, 0)))
        shift = jnp.pad(shift, ((0, pad), (0, 0)))
    m = x.shape[0]
    grid = (m // block,)
    kernel = partial(_kernel, inverse=inverse, clamp=float(clamp))
    out, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, d), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        raw_scale.astype(jnp.float32),
        shift.astype(jnp.float32),
    )
    return out[:n], ld[:n, 0]


def _reference_transform(x, raw_scale, shift, inverse, clamp):
    """jnp reference used for the autodiff backward (identical math to
    the kernel and to ``AffineCoupling``'s soft-clamped transform)."""
    s = clamp * jnp.tanh(raw_scale / clamp)
    if inverse:
        return (x - shift) * jnp.exp(-s), -jnp.sum(s, axis=-1)
    return x * jnp.exp(s) + shift, jnp.sum(s, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def affine_coupling_pallas_vjp(
    x, raw_scale, shift, inverse=False, clamp=5.0, interpret=False
):
    """Affine coupling with the Pallas forward and an autodiff backward
    (via the jnp reference), so the kernel can sit on the training
    path — same pattern as ``rqs_pallas_vjp``. ``interpret`` runs the
    kernel in Pallas interpret mode (CPU tests)."""
    return affine_coupling_transform(
        x, raw_scale, shift, inverse=inverse, clamp=clamp,
        interpret=interpret,
    )


def _ac_fwd(x, raw_scale, shift, inverse, clamp, interpret):
    out = affine_coupling_transform(
        x, raw_scale, shift, inverse=inverse, clamp=clamp,
        interpret=interpret,
    )
    return out, (x, raw_scale, shift)


def _ac_bwd(inverse, clamp, interpret, residuals, cotangents):
    x, raw_scale, shift = residuals
    _, vjp = jax.vjp(
        lambda xx, ss, tt: _reference_transform(xx, ss, tt, inverse, clamp),
        x,
        raw_scale,
        shift,
    )
    return vjp(cotangents)


affine_coupling_pallas_vjp.defvjp(_ac_fwd, _ac_bwd)
