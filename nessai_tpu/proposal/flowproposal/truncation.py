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
    "get_truncation_rule",
]


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
    ):
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
