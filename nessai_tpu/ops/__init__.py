"""Pallas TPU kernels for the hot flow ops."""

from .coupling_pallas import affine_coupling_transform
from .rqs_pallas import rqs_pallas

__all__ = ["rqs_pallas", "affine_coupling_transform"]
