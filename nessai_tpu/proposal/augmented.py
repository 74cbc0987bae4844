"""Augmented flow proposal (arXiv:2002.07101): append Gaussian auxiliary
dimensions to the flow input.

Reference: ``nessai/proposal/augmented.py:21-269``.
"""

import logging

import numpy as np
from scipy.special import logsumexp
from scipy.stats import norm

from .flowproposal import FlowProposal

logger = logging.getLogger(__name__)

__all__ = ["AugmentedFlowProposal"]


class AugmentedFlowProposal(FlowProposal):
    """FlowProposal with ``augment_dims`` auxiliary N(0,1) dimensions.

    The flow is trained on [x', e] where e is Gaussian noise; the coupling
    mask is fixed so the augmented dimensions are always transformed
    conditioned on the real ones (reference ``augmented.py:91``).
    """

    def __init__(
        self,
        model,
        augment_dims: int = 1,
        generate_augment: str = "gaussian",
        marginalise_augment: bool = False,
        n_marg: int = 50,
        **kwargs,
    ):
        super().__init__(model, **kwargs)
        self.augment_dims = int(augment_dims)
        if generate_augment not in ("gaussian", "zeros", "zeroes"):
            raise RuntimeError(f"Unknown generate_augment: {generate_augment}")
        self.generate_augment = generate_augment
        self.marginalise_augment = marginalise_augment
        self.n_marg = int(n_marg)

    def set_rescaling(self) -> None:
        super().set_rescaling()
        self.augment_names = [f"e_{i}" for i in range(self.augment_dims)]
        self.parameters = self.parameters + self.augment_names
        self.prime_parameters = self.prime_parameters + self.augment_names
        self._base_dims = self.prime_dims - self.augment_dims

    def update_flow_config(self, flow_config: dict) -> dict:
        """Fix the coupling mask: real dims identity, augment dims
        transformed (reference ``augmented.py:91``)."""
        flow_config = dict(flow_config)
        if "mask" not in flow_config:
            m = np.ones(self.prime_dims, dtype=int)
            m[-self.augment_dims :] = -1
            flow_config["mask"] = m
        return flow_config

    def rescale(self, x, compute_radius: bool = False):
        """Rescale then append the augment values.

        Training data gets fresh Gaussian (or zero) augment draws each
        call (reference ``augmented.py:98-160``)."""
        x_prime, log_j = super().rescale(x, compute_radius=compute_radius)
        n = len(x_prime)
        if self.generate_augment == "gaussian" and not compute_radius:
            e = self.rng.standard_normal((n, self.augment_dims))
        else:
            e = np.zeros((n, self.augment_dims))
        # x_prime dtype already includes the augment fields
        for i, name in enumerate(self.augment_names):
            x_prime[name] = e[:, i]
        return x_prime, log_j

    def inverse_rescale(self, x_prime, **kwargs):
        x, log_j = super().inverse_rescale(x_prime, **kwargs)
        for name in self.augment_names:
            x[name] = x_prime[name]
        return x, log_j

    @property
    def x_prime_dtype(self):
        return np.dtype([(p, "f8") for p in self.prime_parameters])

    def augmented_prior(self, x):
        """N(0,1) prior on the augment fields. Reference:
        ``augmented.py:162-178``."""
        log_p = 0.0
        for name in self.augment_names:
            log_p = log_p + norm.logpdf(x[name])
        return log_p

    def log_prior(self, x):
        if self.marginalise_augment:
            return super().log_prior(x)
        return super().log_prior(x) + self.augmented_prior(x)

    def _marginalise_augment(self, x_prime_array):
        """MC-marginalise log q over the augment dims.

        Reference: ``augmented.py:180``."""
        n = len(x_prime_array)
        real = np.repeat(
            x_prime_array[:, : self._base_dims], self.n_marg, axis=0
        )
        e = self.rng.standard_normal((n * self.n_marg, self.augment_dims))
        full = np.concatenate([real, e], axis=1)
        _, log_prob = self.flow.forward_and_log_prob(full)
        log_prob_e = norm.logpdf(e).sum(axis=1)
        return -np.log(self.n_marg) + logsumexp(
            (log_prob - log_prob_e).reshape(n, self.n_marg), axis=1
        )

    def backward_pass(
        self,
        z,
        rescale: bool = True,
        discard_nans: bool = True,
        return_z: bool = False,
        return_unit_hypercube=None,
    ):
        x, log_q, z_out = super().backward_pass(
            z,
            rescale=rescale,
            discard_nans=discard_nans,
            return_z=True,
            return_unit_hypercube=return_unit_hypercube,
        )
        if self.marginalise_augment and len(x):
            x_prime_array = np.stack(
                [np.asarray(x[p], float) for p in self.model.names], axis=-1
            )
            # rebuild prime array from x via rescale for marginalisation
            x_prime, _ = super().rescale(x)
            arr = np.stack(
                [np.asarray(x_prime[p], float) for p in self.prime_parameters],
                axis=-1,
            )
            log_q = self._marginalise_augment(arr)
        if return_z:
            return x, log_q, z_out
        return x, log_q
