"""Proposals. Reference: ``nessai/proposal/``."""

from .analytic import AnalyticProposal
from .base import Proposal
from .flowproposal import FlowProposal
from .rejection import RejectionProposal

__all__ = [
    "AnalyticProposal",
    "Proposal",
    "FlowProposal",
    "RejectionProposal",
]


def __getattr__(name):
    if name == "AugmentedFlowProposal":
        from .augmented import AugmentedFlowProposal

        return AugmentedFlowProposal
    if name == "ImportanceFlowProposal":
        from .importance import ImportanceFlowProposal

        return ImportanceFlowProposal
    raise AttributeError(name)
