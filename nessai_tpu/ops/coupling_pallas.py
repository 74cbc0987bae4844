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

__all__ = ["affine_coupling_transform"]


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
