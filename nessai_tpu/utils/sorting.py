"""Dependency-aware ordering of reparameterisations.

Reference: ``nessai/utils/sorting.py:12``.
"""

from typing import List

__all__ = ["sort_reparameterisations"]


def sort_reparameterisations(
    reparameterisations: List,
    existing_parameters: List[str] = None,
    known_parameters: List[str] = None,
) -> List:
    """Topologically order reparameterisations so every one's required
    (inverse-input) parameters are produced by earlier entries.

    Each entry must expose ``parameters`` and ``requires`` lists. Raises if
    no valid ordering exists.
    """
    if existing_parameters is None:
        existing_parameters = []
    available = list(existing_parameters)
    if known_parameters:
        available += [p for p in known_parameters if p not in available]

    queue = list(reparameterisations)
    ordered = []
    produced = list(existing_parameters)
    stall = 0
    while queue:
        r = queue.pop(0)
        requires = list(getattr(r, "requires", []) or [])
        if all(req in produced for req in requires):
            ordered.append(r)
            produced += [p for p in r.parameters if p not in produced]
            # also expose prime parameters if defined
            for p in getattr(r, "prime_parameters", []) or []:
                if p not in produced:
                    produced.append(p)
            stall = 0
        else:
            queue.append(r)
            stall += 1
            if stall > len(queue):
                missing = [
                    req for req in requires if req not in produced
                ]
                raise ValueError(
                    "Could not sort reparameterisations: "
                    f"{r} requires inputs {missing} which are never produced"
                )
    return ordered
