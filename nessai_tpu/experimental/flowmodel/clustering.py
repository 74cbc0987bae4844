"""Flow model with k-means clustering as a conditional input.

Reference: ``nessai/experimental/flowmodel/clustering.py:13`` — k-means
over prime samples (k chosen by silhouette score), cluster label as a
one-hot conditional input to the flow; ``log_prob`` marginalises over
labels with the cluster weights.

The reference uses faiss; here k-means runs as a jitted JAX Lloyd
iteration (batched distance matrix on device).
"""

import logging
import jax
import jax.numpy as jnp
import numpy as np

from ...flowmodel.base import FlowModel

logger = logging.getLogger(__name__)

__all__ = ["ClusteringFlowModel", "kmeans", "silhouette_score"]


def _kmeans_step(x, centres):
    d = jnp.sum((x[:, None, :] - centres[None, :, :]) ** 2, axis=-1)
    labels = jnp.argmin(d, axis=1)
    one_hot = jax.nn.one_hot(labels, centres.shape[0], dtype=x.dtype)
    counts = one_hot.sum(axis=0)
    sums = one_hot.T @ x
    new_centres = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centres
    )
    return new_centres, labels


@jax.jit
def _kmeans_run(x, centres):
    def body(i, c):
        c, _ = _kmeans_step(x, c)
        return c

    centres = jax.lax.fori_loop(0, 25, body, centres)
    _, labels = _kmeans_step(x, centres)
    return centres, labels


def kmeans(x: np.ndarray, k: int, rng=None):
    """Lloyd's algorithm with random init, 25 iterations on device."""
    if rng is None:
        rng = np.random.default_rng()
    idx = rng.choice(len(x), k, replace=False)
    centres = jnp.asarray(x[idx], jnp.float32)
    centres, labels = _kmeans_run(jnp.asarray(x, jnp.float32), centres)
    return np.asarray(centres), np.asarray(labels)


def silhouette_score(x: np.ndarray, labels: np.ndarray) -> float:
    """Mean silhouette coefficient (simplified, centroid-based)."""
    ks = np.unique(labels)
    if len(ks) < 2:
        return -1.0
    centres = np.stack([x[labels == k].mean(axis=0) for k in ks])
    d = np.linalg.norm(x[:, None, :] - centres[None, :, :], axis=-1)
    order = np.argsort(d, axis=1)
    a = d[np.arange(len(x)), order[:, 0]]
    b = d[np.arange(len(x)), order[:, 1]]
    s = (b - a) / np.maximum(np.maximum(a, b), 1e-12)
    return float(np.mean(s))


class ClusteringFlowModel(FlowModel):
    """FlowModel conditioned on k-means cluster labels.

    Reference: ``nessai/experimental/flowmodel/clustering.py``.
    """

    def __init__(
        self,
        flow_config=None,
        training_config=None,
        output=None,
        rng=None,
        max_clusters: int = 8,
    ):
        flow_config = dict(flow_config or {})
        self.max_clusters = int(
            flow_config.pop("max_clusters", max_clusters)
        )
        flow_config["context_features"] = self.max_clusters
        super().__init__(
            flow_config=flow_config,
            training_config=training_config,
            output=output,
            rng=rng,
        )
        self.n_clusters = 1
        self.cluster_centres = None
        self.cluster_weights = np.ones(1)

    def train_clustering(self, samples: np.ndarray) -> np.ndarray:
        """Choose k by silhouette score over 2..max_clusters and return
        the one-hot labels. Reference: ``clustering.py:52``."""
        best = (-np.inf, 1, None, None)
        for k in range(2, self.max_clusters + 1):
            if k >= len(samples):
                break
            centres, labels = kmeans(samples, k, rng=self.rng)
            score = silhouette_score(samples, labels)
            if score > best[0]:
                best = (score, k, centres, labels)
        score, k, centres, labels = best
        if centres is None:
            self.n_clusters = 1
            self.cluster_centres = samples.mean(axis=0, keepdims=True)
            labels = np.zeros(len(samples), dtype=int)
        else:
            logger.debug("Selected %d clusters (silhouette %.3f)", k, score)
            self.n_clusters = k
            self.cluster_centres = centres
        counts = np.bincount(labels, minlength=self.n_clusters)
        self.cluster_weights = counts / counts.sum()
        return self.one_hot(labels)

    def one_hot(self, labels: np.ndarray) -> np.ndarray:
        out = np.zeros((len(labels), self.max_clusters), dtype=np.float32)
        out[np.arange(len(labels)), labels] = 1.0
        return out

    def assign_labels(self, samples: np.ndarray) -> np.ndarray:
        d = np.linalg.norm(
            samples[:, None, :] - self.cluster_centres[None, :, :], axis=-1
        )
        return np.argmin(d, axis=1)

    def get_cluster_labels(
        self, samples: np.ndarray, clusterer=None
    ) -> np.ndarray:
        """Cluster labels for a set of samples as an ``(n, 1)`` column,
        matching the reference return shape.

        ``clusterer`` may be another object exposing ``cluster_centres``
        or a raw ``(k, dims)`` centre array; defaults to this model's
        centres. Reference: ``clustering.py:91-98`` (there via a faiss
        index search; here nearest-centre assignment).
        """
        samples = np.asarray(samples)
        if clusterer is None:
            return self.assign_labels(samples).reshape(-1, 1)
        centres = np.asarray(
            getattr(clusterer, "cluster_centres", clusterer)
        )
        d = np.linalg.norm(
            samples[:, None, :] - centres[None, :, :], axis=-1
        )
        return np.argmin(d, axis=1).reshape(-1, 1)

    def sample_cluster_labels(self, n: int) -> np.ndarray:
        """Sample ``n`` random cluster labels as an ``(n, 1)`` column.

        Reference: ``clustering.py:100-104``.
        """
        return self.rng.choice(
            self.n_clusters, size=(int(n), 1), p=self.cluster_weights
        )

    def train(self, samples, conditional=None, **kwargs):
        if conditional is None:
            conditional = self.train_clustering(np.asarray(samples))
        return super().train(samples, conditional=conditional, **kwargs)

    def sample_labels(self, n: int) -> np.ndarray:
        return self.rng.choice(
            self.n_clusters, size=n, p=self.cluster_weights
        )

    def log_prob_marginalised(self, x) -> np.ndarray:
        """log p(x) = logsumexp_k log p(x|k) + log w_k.

        Reference: ``clustering.py:118``."""
        from scipy.special import logsumexp

        parts = []
        for k in range(self.n_clusters):
            labels = self.one_hot(np.full(len(x), k, dtype=int))
            parts.append(
                self.log_prob(x, conditional=labels)
                + np.log(self.cluster_weights[k])
            )
        return logsumexp(np.stack(parts, axis=1), axis=1)
