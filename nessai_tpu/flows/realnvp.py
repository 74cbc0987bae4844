"""RealNVP-style coupling flow (arXiv:1605.08803).

Builder for the flagship architecture, mirroring the reference's options
(``nessai/flows/realnvp.py:20-215``): alternating or custom binary masks,
MLP or residual conditioners, a linear transform (permutation / LU) between
couplings, actnorm between layers (replacing train/eval-stateful
BatchNorm, see SURVEY.md §7), optional volume-preserving (additive)
couplings, and an optional logit pre-transform.
"""

from typing import Optional

import numpy as np

from .bijectors import (
    ActNorm,
    AffineCoupling,
    Chain,
    Logit,
    LULinear,
    Permutation,
    SVDLinear,
)

__all__ = ["build_realnvp_bijector", "alternating_masks", "make_linear_transform"]


def alternating_masks(dim: int, n_blocks: int):
    masks = []
    base = np.arange(dim) % 2
    for i in range(n_blocks):
        masks.append(base if i % 2 == 0 else 1 - base)
    return masks


def make_linear_transform(kind: Optional[str], dim: int):
    """Linear transform inserted between coupling blocks.

    Reference: ``nessai/flows/utils.py:295-329`` (permutation / LU /
    Householder-parameterised SVD).
    """
    if kind is None or kind == "none":
        return []
    if kind == "permutation":
        return [Permutation(dim)]
    if kind == "lu":
        return [Permutation(dim), LULinear(dim)]
    if kind == "svd":
        return [Permutation(dim), SVDLinear(dim)]
    raise ValueError(f"Unknown linear transform: {kind}")


def build_realnvp_bijector(
    dim: int,
    n_blocks: int = 4,
    n_neurons: int = 8,
    n_layers: int = 2,
    mask=None,
    net: str = "resnet",
    activation: str = "relu",
    linear_transform: Optional[str] = "permutation",
    batch_norm_between_layers: bool = True,
    volume_preserving: bool = False,
    pre_transform: Optional[str] = None,
    context_features: Optional[int] = None,
    dropout_probability: float = 0.0,
    **kwargs,
):
    if mask is None:
        masks = alternating_masks(dim, n_blocks)
    else:
        mask = np.asarray(mask)
        if mask.ndim == 1:
            masks = [mask if i % 2 == 0 else 1 - mask for i in range(n_blocks)]
        else:
            if len(mask) != n_blocks:
                raise ValueError("Mask does not match number of blocks")
            masks = list(mask)

    bijectors = []
    if pre_transform == "logit":
        bijectors.append(Logit())
    for i in range(n_blocks):
        bijectors += make_linear_transform(linear_transform, dim)
        bijectors.append(
            AffineCoupling(
                masks[i],
                n_neurons=n_neurons,
                n_layers=n_layers,
                net=net,
                activation=activation,
                volume_preserving=volume_preserving,
                context_features=context_features,
                dropout_probability=dropout_probability,
            )
        )
        if batch_norm_between_layers:
            bijectors.append(ActNorm(dim))
    return Chain(bijectors)
