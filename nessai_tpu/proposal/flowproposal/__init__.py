"""Flow-based proposals. Reference: ``nessai/proposal/flowproposal/``."""

from .base import BaseFlowProposal
from .flowproposal import FlowProposal
from .truncation import (
    TRUNCATION_REGISTRY,
    LatentRadiusTruncation,
    LikelihoodThresholdTruncation,
    MinLogQTruncation,
    TruncationScheme,
)

__all__ = [
    "BaseFlowProposal",
    "FlowProposal",
    "TruncationScheme",
    "LatentRadiusTruncation",
    "MinLogQTruncation",
    "LikelihoodThresholdTruncation",
    "TRUNCATION_REGISTRY",
]
