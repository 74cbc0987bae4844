"""Neural spline flow (arXiv:1906.04032).

Mirrors the reference's NSF configuration
(``nessai/flows/nsf.py:20-130``): RQS couplings with 8 bins and linear
tails (tail bound 5.0), alternating masks, permutations between blocks.
"""

from typing import Optional

import numpy as np

from .bijectors import ActNorm, Chain, Logit, RQSCoupling
from .realnvp import alternating_masks, make_linear_transform

__all__ = ["build_nsf_bijector"]


def build_nsf_bijector(
    dim: int,
    n_blocks: int = 4,
    n_neurons: int = 8,
    n_layers: int = 2,
    num_bins: int = 8,
    tail_bound: float = 5.0,
    tails: Optional[str] = "linear",
    mask=None,
    net: str = "resnet",
    activation: str = "relu",
    linear_transform: Optional[str] = "permutation",
    batch_norm_between_layers: bool = False,
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
            masks = list(mask)

    bijectors = []
    if pre_transform == "logit":
        bijectors.append(Logit())
    for i in range(n_blocks):
        bijectors += make_linear_transform(linear_transform, dim)
        bijectors.append(
            RQSCoupling(
                masks[i],
                n_neurons=n_neurons,
                n_layers=n_layers,
                num_bins=num_bins,
                tail_bound=tail_bound,
                tails=tails,
                net=net,
                activation=activation,
                context_features=context_features,
                dropout_probability=dropout_probability,
            )
        )
        if batch_norm_between_layers:
            bijectors.append(ActNorm(dim))
    return Chain(bijectors)
