"""Reparameterisation registry helpers and user-config parsing.

Reference: ``nessai/reparameterisations/utils.py`` (``KnownReparameterisation
:26``, entry-point loading ``:71``, ``parse_reparameterisations:236``,
``resolve_reparameterisation_parameters:271``).
"""

import copy
import logging
from dataclasses import dataclass, field
from typing import Type

from .base import Reparameterisation

logger = logging.getLogger(__name__)

__all__ = [
    "KnownReparameterisation",
    "ReparameterisationDict",
    "get_reparameterisation",
]


@dataclass
class KnownReparameterisation:
    name: str
    class_fn: Type[Reparameterisation]
    keyword_arguments: dict = field(default_factory=dict)


class ReparameterisationDict(dict):
    """Registry of named reparameterisations (+ entry-point plugins)."""

    def add_reparameterisation(self, name, class_fn, keyword_arguments=None):
        if keyword_arguments is None:
            keyword_arguments = {}
        if name in self:
            raise ValueError(f"Reparameterisation {name} already registered")
        self[name] = KnownReparameterisation(name, class_fn, keyword_arguments)

    def add_external_reparameterisations(self, group: str):
        from ..utils.entry_points import get_entry_points

        try:
            eps = get_entry_points(group)
        except Exception:  # pragma: no cover
            eps = {}
        for ep in eps.values():
            known = ep.load()
            if not isinstance(known, KnownReparameterisation):
                logger.warning(
                    "Skipping entry point %s: not a KnownReparameterisation",
                    ep,
                )
                continue
            if known.name in self:
                raise ValueError(
                    f"Reparameterisation {known.name} already registered"
                )
            self[known.name] = known


def get_reparameterisation(reparameterisation, defaults=None):
    """Resolve a reparameterisation name/class to ``(class, kwargs)``.

    Reference: ``nessai/reparameterisations/utils.py:100``.
    """
    if defaults is None:
        from . import default_reparameterisations

        defaults = default_reparameterisations
    if reparameterisation is None or isinstance(reparameterisation, str):
        known = defaults.get(reparameterisation)
        if known is None:
            raise ValueError(
                f"Unknown reparameterisation: {reparameterisation}"
            )
        return known.class_fn, copy.deepcopy(known.keyword_arguments)
    if isinstance(reparameterisation, type) and issubclass(
        reparameterisation, Reparameterisation
    ):
        return reparameterisation, {}
    raise TypeError(
        "Reparameterisation must be a str, None, or class; got "
        f"{reparameterisation}"
    )
