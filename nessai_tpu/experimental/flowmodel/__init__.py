"""Experimental flow models."""

from .clustering import ClusteringFlowModel

__all__ = ["ClusteringFlowModel"]
