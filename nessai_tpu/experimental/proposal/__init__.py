"""Experimental proposals."""

from .clustering import ClusteringFlowProposal
from .mcmc import MCMCFlowProposal

__all__ = ["MCMCFlowProposal", "ClusteringFlowProposal"]
