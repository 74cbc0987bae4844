"""Samplers. Reference: ``nessai/samplers/``."""

from .base import BaseNestedSampler
from .nestedsampler import NestedSampler

__all__ = ["BaseNestedSampler", "NestedSampler"]


def __getattr__(name):
    if name == "ImportanceNestedSampler":
        from .importancesampler import ImportanceNestedSampler

        return ImportanceNestedSampler
    raise AttributeError(name)
