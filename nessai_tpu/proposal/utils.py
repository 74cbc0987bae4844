"""Proposal class resolution and kwarg validation.

Reference: ``nessai/proposal/utils.py`` (``get_flow_proposal_class:112``,
``check_proposal_kwargs:15``).
"""

import inspect
import logging

logger = logging.getLogger(__name__)

__all__ = [
    "available_base_flow_proposal_classes",
    "available_external_flow_proposal_classes",
    "get_flow_proposal_class",
    "check_proposal_kwargs",
]


def _known_classes():
    from .augmented import AugmentedFlowProposal
    from .flowproposal import FlowProposal

    classes = {
        None: FlowProposal,
        "flowproposal": FlowProposal,
        "defaultflowproposal": FlowProposal,
        "augmentedflowproposal": AugmentedFlowProposal,
    }
    try:
        from ..experimental.proposal.mcmc import MCMCFlowProposal

        classes["mcmcflowproposal"] = MCMCFlowProposal
    except ImportError:  # pragma: no cover
        pass
    try:
        from ..experimental.proposal.clustering import ClusteringFlowProposal

        classes["clusteringflowproposal"] = ClusteringFlowProposal
    except ImportError:  # pragma: no cover
        pass
    return classes


def available_base_flow_proposal_classes() -> dict:
    """Name -> class map of the bundled proposal classes. Reference:
    ``nessai/proposal/utils.py:82``."""
    return {k: v for k, v in _known_classes().items() if k is not None}


#: Entry-point groups scanned for plugin proposals. The reference group
#: name (``nessai.proposals``, ``nessai/proposal/utils.py:98``) is
#: scanned as well so plugins written against the reference are
#: discovered unchanged; the native group wins on name clashes.
PROPOSAL_ENTRY_POINT_GROUPS = (
    "nessai.proposals",
    "nessai_tpu.proposals",
)


def _external_proposal_entry_points() -> dict:
    from ..utils.entry_points import get_entry_points

    external = {}
    for group in PROPOSAL_ENTRY_POINT_GROUPS:
        external.update(get_entry_points(group))
    return external


def available_external_flow_proposal_classes(load: bool = False) -> dict:
    """Entry-point (plugin) proposal classes (groups
    ``nessai_tpu.proposals`` and the reference-compatible
    ``nessai.proposals``). Reference: ``nessai/proposal/utils.py:97``."""
    external = _external_proposal_entry_points()
    logger.debug("Found external proposals: %s", list(external))
    if load:
        for key in external:
            external[key] = external[key].load()
    return external


def get_flow_proposal_class(proposal_class):
    """Resolve a proposal class from a name/class/None, including
    entry-point plugins (group ``nessai_tpu.proposals``).
    Reference: ``nessai/proposal/utils.py:112``."""
    from .flowproposal.base import BaseFlowProposal

    if proposal_class is None:
        return _known_classes()[None]
    if isinstance(proposal_class, type) and issubclass(
        proposal_class, BaseFlowProposal
    ):
        return proposal_class
    if isinstance(proposal_class, str):
        name = proposal_class.lower()
        classes = _known_classes()
        if name in classes:
            return classes[name]
        try:
            eps = _external_proposal_entry_points()
            if name in eps:
                return eps[name].load()
        except Exception:  # pragma: no cover
            pass
        raise ValueError(f"Unknown flow class: {proposal_class}")
    raise TypeError(f"Invalid flow class: {proposal_class}")


def check_proposal_kwargs(ProposalClass, kwargs, strict: bool = False) -> dict:
    """Keep only kwargs accepted by ``ProposalClass`` (walking its MRO);
    warn about or reject the rest.
    Reference: ``nessai/proposal/utils.py:15``.
    """
    kwargs = dict(kwargs)
    accepted = set()
    for klass in inspect.getmro(ProposalClass):
        init = getattr(klass, "__init__", None)
        if init is None:
            continue
        try:
            sig = inspect.signature(init)
        except (TypeError, ValueError):  # pragma: no cover
            continue
        accepted |= set(sig.parameters)
    out = {}
    dropped = {}
    for k, v in kwargs.items():
        if k in accepted:
            out[k] = v
        else:
            dropped[k] = v
    if dropped:
        default_kwargs = {
            k: v
            for k, v in dropped.items()
            if v is None or v == {} or v == []
        }
        real = {k: v for k, v in dropped.items() if k not in default_kwargs}
        if real:
            if strict:
                raise RuntimeError(
                    f"Keyword arguments contain unknown keys: {set(real)}"
                )
            # keys valid for OTHER proposal classes are dropped with a
            # warning; truly unknown keys are an error (reference
            # ``nessai/proposal/utils.py:59-75``)
            allowed_extra = set()
            for other in _known_proposal_classes():
                if other is ProposalClass:
                    continue
                for klass in inspect.getmro(other):
                    init = getattr(klass, "__init__", None)
                    if init is None:
                        continue
                    try:
                        allowed_extra |= set(
                            inspect.signature(init).parameters
                        )
                    except (TypeError, ValueError):  # pragma: no cover
                        continue
            invalid = set(real) - allowed_extra
            if invalid:
                raise RuntimeError(
                    f"Unknown kwargs for {ProposalClass.__name__}: {invalid}."
                )
            logger.warning(
                "Removing unused keyword arguments (%s) from kwargs for "
                "%s. These are valid keyword arguments but correspond to "
                "other proposal classes.",
                set(real),
                ProposalClass.__name__,
            )
    return out


def _known_proposal_classes():
    """The registered proposal classes whose kwargs are tolerated (and
    dropped) when configuring a different class. Reference:
    ``nessai/proposal/utils.py:28-38``."""
    from ..experimental.proposal.clustering import ClusteringFlowProposal
    from .augmented import AugmentedFlowProposal
    from .flowproposal import FlowProposal

    return [FlowProposal, AugmentedFlowProposal, ClusteringFlowProposal]
