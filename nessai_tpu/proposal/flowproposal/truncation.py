"""Pluggable truncation rules for flow-proposal pool population.

Reference: ``nessai/proposal/flowproposal/truncation.py`` —
``latent_radius`` (``:201-365``), ``min_log_q`` (``:368``),
``likelihood_threshold`` (``:398``), ``TruncationScheme`` staged
application (``:447-508``), registry (``:432``).
"""

import logging
from typing import List, Optional

import numpy as np

from ...utils.sampling import (
    NDimensionalTruncatedGaussian,
    compute_radius,
)

logger = logging.getLogger(__name__)

__all__ = [
    "TruncationRule",
    "LatentRadiusTruncation",
    "MinLogQTruncation",
    "LikelihoodThresholdTruncation",
    "TruncationScheme",
    "TRUNCATION_REGISTRY",
    "DEFAULT_TRUNCATION_METHODS",
    "DEFAULT_TRUNCATION_KWARGS",
    "LEGACY_LATENT_RADIUS_ARGUMENTS",
    "get_truncation_rule",
    "get_truncation_rule_class",
    "normalise_truncation_methods",
    "normalise_truncation_kwargs",
    "should_enable_latent_radius",
    "build_truncation_methods",
    "apply_default_truncation_config",
    "get_deprecated_latent_radius_arguments",
    "get_deprecated_latent_radius_kwargs",
]

#: default truncation configuration (reference ``truncation.py:15-21``);
#: kwargs use this package's canonical rule-constructor names
DEFAULT_TRUNCATION_METHODS = ["latent_radius"]
DEFAULT_TRUNCATION_KWARGS = {
    "latent_radius": {"mode": "constant_volume", "q": 0.95}
}

#: proposal-level kwargs that configure the latent-radius rule
#: (reference ``truncation.py:23-33``)
LEGACY_LATENT_RADIUS_ARGUMENTS = (
    "constant_volume_mode",
    "volume_fraction",
    "fuzz",
    "expansion_fraction",
    "fixed_radius",
    "radius_mode",
    "min_radius",
    "max_radius",
    "compute_radius_with_all",
)


def get_deprecated_latent_radius_arguments(**kwargs) -> List[str]:
    """Deprecated latent-radius proposal arguments that were explicitly
    set. Reference: ``truncation.py:36-42``."""
    return [
        name
        for name in LEGACY_LATENT_RADIUS_ARGUMENTS
        if kwargs.get(name) is not None
    ]


def get_deprecated_latent_radius_kwargs(**kwargs) -> dict:
    """Sparse latent-radius kwargs built from deprecated proposal
    arguments. Reference: ``truncation.py:45-51``."""
    return {
        name: kwargs[name]
        for name in LEGACY_LATENT_RADIUS_ARGUMENTS
        if kwargs.get(name) is not None
    }


def normalise_truncation_methods(
    truncation_method=None, truncation_methods=None
) -> List[str]:
    """Normalise truncation-method input into an ordered unique list.

    Reference: ``truncation.py:54-67``.
    """
    methods = (
        truncation_methods
        if truncation_methods is not None
        else truncation_method
    )
    if methods is None:
        return []
    if isinstance(methods, str):
        methods = [methods]
    return list(dict.fromkeys(methods))


def should_enable_latent_radius(latent_radius_kwargs=None) -> bool:
    """Whether latent-radius truncation should be enabled from kwargs.

    Reference: ``truncation.py:70-72``.
    """
    return bool(latent_radius_kwargs)


def build_truncation_methods(
    truncation_method=None,
    truncation_methods=None,
    truncate_log_q: bool = False,
    enforce_likelihood_threshold: bool = False,
    latent_radius_kwargs=None,
    default_latent_radius: bool = False,
) -> List[str]:
    """Build the effective truncation-method list from legacy and new
    inputs. Reference: ``truncation.py:75-105``."""
    if truncation_method is not None and truncation_methods is not None:
        raise ValueError(
            "Specify only one of truncation_method or truncation_methods"
        )
    methods = normalise_truncation_methods(
        truncation_method, truncation_methods
    )
    if (
        default_latent_radius
        or should_enable_latent_radius(latent_radius_kwargs)
    ) and "latent_radius" not in methods:
        methods.insert(0, "latent_radius")
    if truncate_log_q and "min_log_q" not in methods:
        methods.append("min_log_q")
    if (
        enforce_likelihood_threshold
        and "likelihood_threshold" not in methods
    ):
        methods.append("likelihood_threshold")
    return methods


def apply_default_truncation_config(
    methods,
    truncation_kwargs=None,
    *,
    default_latent_radius: bool = False,
):
    """Apply the canonical default truncation configuration.

    Returns ``(methods, kwargs)`` with rule defaults filled in.
    Reference: ``truncation.py:107-130``.
    """
    from copy import deepcopy

    if default_latent_radius and not methods:
        methods = list(DEFAULT_TRUNCATION_METHODS)
    else:
        methods = list(methods)
    kwargs = deepcopy(truncation_kwargs or {})
    for name, default_kwargs in DEFAULT_TRUNCATION_KWARGS.items():
        if name not in methods:
            continue
        kwargs.setdefault(name, {})
        if not isinstance(kwargs[name], dict):
            continue
        for key, value in default_kwargs.items():
            kwargs[name].setdefault(key, value)
    return methods, kwargs


def normalise_truncation_kwargs(
    truncation_method=None,
    truncation_methods=None,
    truncation_kwargs=None,
) -> dict:
    """Normalise truncation kwargs into the canonical method-keyed form
    (flat kwargs for a single method get nested under its name).

    Reference: ``truncation.py:133-152``.
    """
    from copy import deepcopy

    if truncation_kwargs is None:
        return {}
    kwargs = deepcopy(truncation_kwargs)
    if (
        isinstance(truncation_method, str)
        and truncation_methods is None
        and truncation_method not in kwargs
        and not any(isinstance(value, dict) for value in kwargs.values())
    ):
        return {truncation_method: kwargs}
    return kwargs


class TruncationRule:
    #: registry name of the rule (reference ``truncation.py:158``)
    name = "base"
    """Base truncation rule; rules hook into one or more of three stages
    of :meth:`FlowProposal.populate`."""

    requires_log_likelihood = False

    def prepare(self, proposal, worst_point, radius=None) -> None:
        """Called once at the start of populate."""

    def apply_latent(self, proposal, z):
        return z

    def apply_after_backward(self, proposal, x, log_q, z):
        return x, log_q, z

    def apply_after_likelihood(self, proposal, x, log_q, z):
        return x, log_q, z

    def sample_latent(self, proposal, n: int):
        """Optional override of latent sampling (e.g. truncated draws)."""
        return None

    def configure(self, proposal) -> None:
        """Apply any proposal-level configuration needed by the rule.
        Reference: ``truncation.py:169-171``."""

    def reset(self) -> None:
        pass


class LatentRadiusTruncation(TruncationRule):
    name = "latent_radius"
    """Truncate latent samples to a ball of radius ``r * fuzz``.

    Modes (reference ``truncation.py:201-365``):
    - ``adaptive``: r = max latent radius of the worst point's (or
      training data's) latent images, scaled by ``expansion_fraction``;
    - ``fixed``: constant user radius;
    - ``constant_volume``: chi-PPF radius containing ``q`` of the mass.

    Sampling inside the ball is exact (inverse-CDF truncated Gaussian),
    not rejection — so no latent draws are wasted.
    """

    def __init__(
        self,
        mode: str = "adaptive",
        radius: Optional[float] = None,
        fuzz: float = 1.0,
        expansion_fraction: float = 4.0,
        q: float = 0.95,
        min_radius: float = 0.0,
        max_radius: float = 50.0,
        rng=None,
        # reference-style aliases (``truncation.py:23-33``) so
        # reference truncation_kwargs dicts work unchanged
        radius_mode: Optional[str] = None,
        fixed_radius=None,
        constant_volume_mode: Optional[bool] = None,
        volume_fraction: Optional[float] = None,
        compute_radius_with_all=None,
    ):
        if volume_fraction is not None:
            q = volume_fraction
        if fixed_radius not in (None, False):
            mode = "fixed"
            radius = float(fixed_radius)
        if constant_volume_mode:
            mode = "constant_volume"
        if radius_mode is not None:
            mode = radius_mode
        if compute_radius_with_all is not None:
            logger.warning(
                "compute_radius_with_all is ignored: the adaptive latent "
                "radius always encloses the full training set"
            )
        if mode not in ("adaptive", "fixed", "constant_volume"):
            raise ValueError(f"Unknown latent_radius mode: {mode}")
        self.mode = mode
        self.radius = radius
        self.fuzz = float(fuzz)
        self.expansion_fraction = expansion_fraction
        self.q = q
        self.min_radius = float(min_radius)
        self.max_radius = float(max_radius)
        self.rng = rng
        self.r = radius
        self._dist = None

    def prepare(self, proposal, worst_point, radius=None) -> None:
        dims = proposal.prime_dims
        if self.rng is None:
            self.rng = proposal.rng
        if radius is not None:
            self.r = float(radius)
        elif self.mode == "fixed":
            if self.radius is None:
                raise RuntimeError("fixed mode requires a radius")
            self.r = float(self.radius)
        elif self.mode == "constant_volume":
            self.r = compute_radius(dims, self.q)
        else:  # adaptive: radius enclosing the latent images of the
            # current training data (worst point's contour)
            z_train = proposal.training_latent
            if z_train is None:
                raise RuntimeError(
                    "adaptive latent radius requires trained proposal"
                )
            radii = np.linalg.norm(z_train, axis=1)
            r = float(np.max(radii))
            if self.expansion_fraction:
                # expand the enclosed volume by (1 + expansion_fraction)
                fuzz = (1 + self.expansion_fraction) ** (1 / dims)
                self.fuzz = fuzz
            self.r = r
        if self.max_radius and self.r > self.max_radius:
            self.r = self.max_radius
        if self.min_radius and self.r < self.min_radius:
            self.r = self.min_radius
        proposal.r = self.r
        self._dist = NDimensionalTruncatedGaussian(
            dims, self.r, fuzz=self.fuzz, rng=self.rng
        )
        logger.debug("Latent radius: %.3f (fuzz %.3f)", self.r, self.fuzz)

    def sample_latent(self, proposal, n: int):
        return self._dist.sample(n)

    def apply_latent(self, proposal, z):
        keep = np.linalg.norm(z, axis=1) <= self.r * self.fuzz
        return z[keep]

    def reset(self) -> None:
        self._dist = None
        if self.mode != "fixed":
            self.r = None

    @property
    def radius_mode(self) -> str:
        """Reference name for :attr:`mode`
        (``truncation.py:253-271``)."""
        return self.mode

    @property
    def constant_volume_mode(self) -> bool:
        """Reference: ``truncation.py:274-276``."""
        return self.mode == "constant_volume"

    @property
    def volume_fraction(self) -> float:
        """Reference name for :attr:`q`."""
        return self.q

    @property
    def fixed_radius(self):
        """The fixed radius, or ``False`` when not in fixed mode.
        Reference: ``truncation.py:23-33`` legacy-argument contract."""
        return self.radius if self.mode == "fixed" else False

    @property
    def threshold(self):
        """Effective latent-radius cut ``r * fuzz`` (``None`` before
        :meth:`prepare`). Reference: ``truncation.py:239-241``."""
        return None if self.r is None else self.r * self.fuzz

    def to_kwargs(self) -> dict:
        """Keyword arguments that reconstruct the rule.

        Reference: ``truncation.py:278-290`` (keys are this package's
        canonical constructor names).
        """
        return {
            "mode": self.mode,
            "radius": self.radius,
            "fuzz": self.fuzz,
            "expansion_fraction": self.expansion_fraction,
            "q": self.q,
            "min_radius": self.min_radius,
            "max_radius": self.max_radius,
        }

    def configure(self, proposal) -> None:
        """Apply proposal-level configuration: fold
        ``expansion_fraction`` into the fuzz factor using the prime-space
        dimensionality. Reference: ``truncation.py:292-301``.

        :meth:`prepare` applies the same adjustment on every populate in
        adaptive mode; calling this is only needed for the reference's
        configure-once contract.
        """
        if self.expansion_fraction:
            self.fuzz = (1 + self.expansion_fraction) ** (
                1 / proposal.prime_dims
            )
            logger.debug("Latent-radius fuzz factor: %.4f", self.fuzz)


class MinLogQTruncation(TruncationRule):
    name = "min_log_q"
    """Drop samples whose log_q is below the minimum log_q of the training
    data. Reference: ``truncation.py:368-395``."""

    def __init__(self, threshold: Optional[float] = None, **kwargs):
        self.threshold = threshold
        self._min_log_q = None

    def prepare(self, proposal, worst_point, radius=None) -> None:
        if self.threshold is not None:
            self._min_log_q = self.threshold
        else:
            log_q = proposal.training_log_q
            if log_q is None:
                raise RuntimeError("min_log_q requires trained proposal")
            self._min_log_q = float(np.min(log_q))

    def apply_after_backward(self, proposal, x, log_q, z):
        keep = log_q >= self._min_log_q
        return x[keep], log_q[keep], z[keep]

    @property
    def min_log_q(self):
        """The active log_q cut (``None`` before :meth:`prepare`).
        Reference: ``truncation.py:374-376``."""
        return self._min_log_q

    def reset(self) -> None:
        self._min_log_q = None


class LikelihoodThresholdTruncation(TruncationRule):
    name = "likelihood_threshold"
    """Drop samples below the worst point's log-likelihood.

    Requires evaluating likelihoods during population.
    Reference: ``truncation.py:398-429``.
    """

    requires_log_likelihood = True

    def __init__(self, **kwargs):
        self._threshold = -np.inf

    def prepare(self, proposal, worst_point, radius=None) -> None:
        if worst_point is not None:
            self._threshold = float(np.atleast_1d(worst_point["logL"])[0])
        else:
            self._threshold = -np.inf

    def apply_after_likelihood(self, proposal, x, log_q, z):
        keep = x["logL"] > self._threshold
        return x[keep], log_q[keep], z[keep]

    @property
    def threshold(self) -> float:
        """The active log-likelihood cut.
        Reference: ``truncation.py:408-410``."""
        return self._threshold


TRUNCATION_REGISTRY = {
    "latent_radius": LatentRadiusTruncation,
    "min_log_q": MinLogQTruncation,
    "likelihood_threshold": LikelihoodThresholdTruncation,
}


def get_truncation_rule(name: str):
    if name not in TRUNCATION_REGISTRY:
        raise ValueError(
            f"Unknown truncation rule: {name}. "
            f"Known: {sorted(TRUNCATION_REGISTRY)}"
        )
    return TRUNCATION_REGISTRY[name]


def get_truncation_rule_class(name: str):
    """Reference name for :func:`get_truncation_rule`
    (``truncation.py:439``)."""
    return get_truncation_rule(name)


class TruncationScheme:
    """Ordered application of truncation rules at the three population
    stages. Reference: ``truncation.py:447-508``."""

    def __init__(self, rules: Optional[List] = None):
        self.rules = list(rules) if rules else []

    @classmethod
    def from_config(cls, config, rng=None):
        """Build from None, a str, a list of strs, or a dict of
        name -> kwargs."""
        if config is None:
            return cls([])
        if isinstance(config, TruncationScheme):
            return config
        if isinstance(config, str):
            config = {config: {}}
        if isinstance(config, (list, tuple)):
            config = {name: {} for name in config}
        rules = []
        for name, kwargs in config.items():
            rule_cls = get_truncation_rule(name)
            kwargs = dict(kwargs or {})
            if name == "latent_radius":
                kwargs.setdefault("rng", rng)
            rules.append(rule_cls(**kwargs))
        return cls(rules)

    @property
    def rule_names(self):
        """Reference: ``truncation.py:456``."""
        return [rule.name for rule in self.rules]

    def has_rule(self, name: str) -> bool:
        """Reference: ``truncation.py:463``."""
        return any(rule.name == name for rule in self.rules)

    def get_rule(self, name: str):
        """Reference: ``truncation.py:466``."""
        for rule in self.rules:
            if rule.name == name:
                return rule
        return None

    def add_rule(self, rule, index=None) -> None:
        """Reference: ``truncation.py:472``."""
        if self.has_rule(rule.name):
            raise ValueError(f"Duplicate truncation rule: {rule.name}")
        if index is None:
            self.rules.append(rule)
        else:
            self.rules.insert(index, rule)

    @property
    def requires_log_likelihood(self) -> bool:
        return any(r.requires_log_likelihood for r in self.rules)

    def configure(self, proposal) -> None:
        """Apply proposal-level configuration to every rule.
        Reference: ``truncation.py:482``."""
        for r in self.rules:
            r.configure(proposal)

    def prepare(self, proposal, worst_point, radius=None) -> None:
        for r in self.rules:
            r.prepare(proposal, worst_point, radius=radius)

    def sample_latent(self, proposal, n: int):
        """First rule providing a latent sampler wins; None means use the
        flow's base distribution."""
        for r in self.rules:
            z = r.sample_latent(proposal, n)
            if z is not None:
                return z
        return None

    def apply_latent(self, proposal, z):
        for r in self.rules:
            z = r.apply_latent(proposal, z)
        return z

    def apply_after_backward(self, proposal, x, log_q, z):
        for r in self.rules:
            x, log_q, z = r.apply_after_backward(proposal, x, log_q, z)
        return x, log_q, z

    def apply_after_likelihood(self, proposal, x, log_q, z):
        for r in self.rules:
            x, log_q, z = r.apply_after_likelihood(proposal, x, log_q, z)
        return x, log_q, z

    def reset(self) -> None:
        for r in self.rules:
            r.reset()


#: Reference class-name alias (``nessai/proposal/flowproposal/
#: truncation.py:155`` calls the rule base ``BaseTruncationRule``;
#: custom rules subclass it before registering)
BaseTruncationRule = TruncationRule

__all__.append("BaseTruncationRule")
