"""Latent-space ensemble MCMC proposal.

Reference: ``nessai/experimental/proposal/mcmc/``.
"""

from .proposal import MCMCFlowProposal
from .steps import KNOWN_STEPS, DifferentialEvolutionStep, GaussianStep, StretchStep

__all__ = [
    "MCMCFlowProposal",
    "GaussianStep",
    "DifferentialEvolutionStep",
    "StretchStep",
    "KNOWN_STEPS",
]
