"""Clustering flow proposal.

Reference: ``nessai/experimental/proposal/clustering.py:17`` — a
FlowProposal whose flow is conditioned on k-means cluster labels; pool
population samples labels from the cluster weights and conditions the
flow on them; log_q marginalises over labels.
"""

import logging

import numpy as np

from ...livepoint import live_points_to_array
from ...proposal.flowproposal import FlowProposal
from ..flowmodel.clustering import ClusteringFlowModel

logger = logging.getLogger(__name__)

__all__ = ["ClusteringFlowProposal"]


class ClusteringFlowProposal(FlowProposal):
    """FlowProposal with a cluster-conditional flow."""

    def __init__(
        self, model, max_clusters: int = 8, max_n_clusters=None, **kwargs
    ):
        super().__init__(model, **kwargs)
        # max_n_clusters is the reference kwarg name
        # (``experimental/proposal/clustering.py:37``)
        if max_n_clusters is not None:
            max_clusters = max_n_clusters
        self.max_clusters = int(max_clusters)

    @property
    def max_n_clusters(self) -> int:
        """Reference alias for :attr:`max_clusters`."""
        return self.max_clusters

    def initialise(self, resumed: bool = False) -> None:
        # Build everything as usual, then swap in the clustering model.
        if self.initialised:
            return
        import os

        os.makedirs(self.output, exist_ok=True)
        self.set_rescaling()
        if not resumed:
            self.verify_rescaling()
        flow_config = dict(self.flow_config or {})
        flow_config["n_inputs"] = self.prime_dims
        flow_config = self.update_flow_config(flow_config)
        self.flow = ClusteringFlowModel(
            flow_config=flow_config,
            training_config=self.training_config,
            output=self.output,
            rng=self.rng,
            max_clusters=self.max_clusters,
        )
        self.flow.initialise()
        if self._truncation_scheme is None:
            from ...proposal.flowproposal.truncation import TruncationScheme

            self._truncation_scheme = TruncationScheme.from_config(
                self._truncation_config, rng=self.rng
            )
        self.initialised = True

    def train(self, x, plot: bool = True) -> None:
        """Cluster in prime space, then train conditionally."""
        if not self.initialised:
            raise RuntimeError("Proposal must be initialised before training")
        x = np.asarray(x).copy()
        if self.map_to_unit_hypercube:
            x = self.model.to_unit_hypercube(x)
        x = self._convert_to_x(x)
        self.training_data = x.copy()
        self._reparameterisation.update(x)
        x_prime, _ = self.rescale(x)
        x_prime_array = live_points_to_array(x_prime, self.prime_parameters)
        conditional = self.flow.train_clustering(x_prime_array)
        self.flow.train(x_prime_array, conditional=conditional)
        z, log_q_prime = self.flow.forward_and_log_prob(
            x_prime_array, conditional=conditional
        )
        self.training_latent = z
        self.training_log_q = log_q_prime
        self.training_count += 1
        self.populated = False

    def backward_pass(self, z, rescale=True, discard_nans=True, return_z=False):
        """Inverse pass conditioned on sampled cluster labels; log_q
        marginalises over labels."""
        labels = self.flow.sample_labels(len(z))
        conditional = self.flow.one_hot(labels)
        x_prime_array, log_j_flow = self.flow.inverse(z, conditional=conditional)
        log_q_prime = self.flow.log_prob_marginalised(x_prime_array)
        x_prime = np.zeros(len(x_prime_array), dtype=self.x_prime_dtype)
        for i, p in enumerate(self.prime_parameters):
            x_prime[p] = x_prime_array[:, i]
        x, log_j_inv = self.inverse_rescale(x_prime)
        log_q = log_q_prime - log_j_inv
        if self.map_to_unit_hypercube:
            in_bounds = self.model.in_unit_hypercube(x)
        else:
            in_bounds = self.model.in_bounds(x)
        keep = in_bounds
        if discard_nans:
            keep = keep & np.isfinite(log_q)
        x, log_q, z = x[keep], log_q[keep], z[keep]
        if return_z:
            return x, log_q, z
        return x, log_q
