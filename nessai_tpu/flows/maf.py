"""Masked autoregressive flow (arXiv:1705.07057).

Mirrors the reference MAF (``nessai/flows/maf.py:25-104``): stacked masked
affine autoregressive transforms with permutations between blocks.
"""

from .bijectors import ActNorm, Chain, MaskedAffineAutoregressive, Permutation

__all__ = ["build_maf_bijector"]


def build_maf_bijector(
    dim: int,
    n_blocks: int = 4,
    n_neurons: int = 8,
    n_layers: int = 2,
    activation: str = "relu",
    batch_norm_between_layers: bool = False,
    dropout_probability: float = 0.0,
    **kwargs,
):
    bijectors = []
    for i in range(n_blocks):
        if i > 0:
            bijectors.append(Permutation(dim))
        bijectors.append(
            MaskedAffineAutoregressive(
                dim,
                n_neurons=n_neurons,
                n_layers=n_layers,
                activation=activation,
                dropout_probability=dropout_probability,
            )
        )
        if batch_norm_between_layers:
            bijectors.append(ActNorm(dim))
    return Chain(bijectors)
