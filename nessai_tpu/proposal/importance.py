"""Meta-proposal for the importance nested sampler.

Reference: ``nessai/proposal/importance.py:35`` — an ordered list of
flows plus the prior, each with a weight; operates in the unit hypercube
with a global logit/sigmoid reparameterisation; trains a new flow per
level; meta-density ``log_Q = logsumexp(log_q, b=weights)``.
"""

import logging
import os
from typing import Optional, Tuple

import numpy as np
from scipy.special import logsumexp

from .. import config as global_config
from ..flowmodel.importance import ImportanceFlowModel
from ..livepoint import (
    empty_structured_array,
    get_dtype,
    live_points_to_array,
    numpy_array_to_live_points,
)
from ..utils.rescaling import logit, sigmoid
from .base import Proposal

logger = logging.getLogger(__name__)

__all__ = ["ImportanceFlowProposal"]


class ImportanceFlowProposal(Proposal):
    """Meta-proposal: prior + one flow per level, with weights."""

    def __init__(
        self,
        model,
        output: str = "./",
        flow_config: Optional[dict] = None,
        training_config: Optional[dict] = None,
        reparameterisation: str = "logit",
        weighted_kl: bool = True,
        reset_flow: bool = True,
        clip: bool = False,
        plot_training: bool = False,
        rng=None,
        mesh=None,
    ):
        super().__init__(model, rng=rng)
        self.output = output
        self.level_count = -1
        self.weighted_kl = weighted_kl
        # int: reset every N levels; bool: always/never
        # (reference ``nessai/proposal/importance.py:93,130-135``)
        self.reset_flow = int(reset_flow)
        self.clip = clip
        self.plot_training = plot_training
        if reparameterisation not in ("logit", None, "none"):
            raise ValueError(
                f"Unknown reparameterisation: {reparameterisation}"
            )
        self.reparameterisation = reparameterisation
        self.flow_config = flow_config
        self.training_config = training_config
        self.mesh = mesh
        self.flow = ImportanceFlowModel(
            flow_config=self.flow_config,
            training_config=training_config,
            output=output,
            rng=self.rng,
            mesh=mesh,
        )
        #: proposal weights keyed by level (-1 = prior)
        self._weights = {-1: 1.0}
        self.dtype = get_dtype(model.names)

    # ------------------------------------------------------------------
    @property
    def flow_config(self) -> dict:
        """Configuration for the flow (reference
        ``proposal/importance.py:117-128``); the setter injects
        ``n_inputs`` from the model."""
        return self._flow_config

    @flow_config.setter
    def flow_config(self, config) -> None:
        config = dict(config or {})
        config["n_inputs"] = self.model.dims
        self._flow_config = config

    @property
    def _reset_flow(self) -> bool:
        """Reset the flow this level? ``reset_flow`` may be an int N
        (reset every N levels) or a bool. Reference:
        ``nessai/proposal/importance.py:130-135``."""
        if not self.reset_flow or self.level_count % self.reset_flow:
            return False
        return True

    # legacy alias used by earlier versions of this package
    _should_reset_flow = _reset_flow

    @property
    def n_proposals(self) -> int:
        """Number of proposals in the meta-proposal (prior + flows).
        Reference: ``nessai/proposal/importance.py:115``."""
        return len(self._weights)

    @property
    def weights(self) -> dict:
        return self._weights

    @property
    def weights_array(self) -> np.ndarray:
        return np.fromiter(self._weights.values(), dtype=float)

    def update_proposal_weights(self, weights: dict) -> None:
        """Update the proposal weights; they must sum to one after the
        update. Reference: ``nessai/proposal/importance.py:279-290``."""
        self._weights.update(weights)
        w_sum = np.sum(np.fromiter(self._weights.values(), float))
        if not np.isclose(w_sum, 1.0):
            raise RuntimeError(
                f"Weights must sum to 1! Actual value: {w_sum}"
            )

    def initialise(self) -> None:
        os.makedirs(self.output, exist_ok=True)
        self._check_fields()
        self.flow.initialise()
        self.verify_rescaling()
        super().initialise()

    def update_output(self, output: str) -> None:
        """Update the output directory and the flow weights path.
        Reference: ``nessai/proposal/base.py:64`` (the flow path update
        is needed here because checkpoints store per-level weights)."""
        super().update_output(output)
        self.flow.update_weights_path(self.output)

    @staticmethod
    def _check_fields() -> None:
        """Ensure the INS live-point fields are registered.

        Reference: ``nessai/proposal/importance.py:139-152``."""
        from .. import config as _config

        for field in ("logQ", "logW", "logU"):
            if field not in _config.livepoints.non_sampling_parameters:
                raise RuntimeError(
                    f"{field} field missing in non-sampling parameters."
                )

    def verify_rescaling(
        self, n: int = 1000, rtol: float = 1e-08, atol: float = 1e-08
    ) -> None:
        """Check the full rescale/inverse_rescale pair round-trips;
        tolerances are passed to ``numpy.allclose``.

        Reference: ``nessai/proposal/importance.py:170-196``."""
        from ..utils.testing import assert_structured_arrays_equal

        x_in = self.model.sample_unit_hypercube(n)
        x_prime, log_j = self.rescale(x_in)
        x_re, log_j_inv = self.inverse_rescale(x_prime)
        try:
            assert_structured_arrays_equal(x_re, x_in, atol=atol, rtol=rtol)
        except AssertionError as e:
            raise RuntimeError(f"Rescaling is not invertible. Error: {e}")
        if not np.allclose(log_j, -log_j_inv, rtol=rtol, atol=atol):
            raise RuntimeError(
                "Forward and inverse Jacobian determinants are not equal"
            )

    def _log_prob_initial(self, x: np.ndarray) -> np.ndarray:
        """Log-probability of the initial (prior) proposal in prime
        space. Reference: ``nessai/proposal/importance.py:577-581``."""
        return np.zeros(x.shape[0])

    def get_proposal_log_prob(self, it: int):
        """Single-argument callable for the log-prob of the proposal at
        iteration ``it`` in prime space (Jacobian NOT included).

        Reference: ``nessai/proposal/importance.py:583-590``."""
        if it == -1:
            return self._log_prob_initial
        if it < self.flow.n_models:
            return lambda x_prime: self.flow.log_prob_ith(x_prime, it)
        raise ValueError(f"No proposal for iteration {it}")

    def compute_kl_between_proposals(
        self,
        x: np.ndarray,
        p_it: Optional[int] = None,
        q_it: Optional[int] = None,
    ) -> float:
        """MC KL divergence between two proposal levels evaluated on
        structured hypercube samples (drawn from p). Defaults to the
        current and previous proposals.
        Reference: ``nessai/proposal/importance.py:592-628``."""
        x_prime, log_j = self.rescale(x)
        if p_it is None:
            p_it = self.flow.n_models - 1
        if q_it is None:
            q_it = self.flow.n_models - 2
        if p_it == q_it:
            raise ValueError("p and q must be different")
        if p_it < -1 or q_it < -1:
            raise ValueError(f"Invalid p_it or q_it: {p_it}, {q_it}")
        log_p = self.get_proposal_log_prob(p_it)(x_prime)
        log_q = self.get_proposal_log_prob(q_it)(x_prime)
        # the prior proposal lives in the hypercube: no Jacobian term
        if p_it > -1:
            log_p = log_p + log_j
        if q_it > -1:
            log_q = log_q + log_j
        kl = float(np.mean(log_p - log_q))
        logger.info("KL between %s and %s is: %.3g", p_it, q_it, kl)
        return kl

    # ------------------------------------------------------------------
    # Unit-hypercube <-> prime (logit) space
    # ------------------------------------------------------------------
    def to_prime(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[n, d] hypercube -> logit space with log|dx'/dx|.

        Reference: ``nessai/proposal/importance.py:203``.
        """
        if self.reparameterisation == "logit":
            x_prime, log_j = logit(x, eps=global_config.general.eps)
            return x_prime, log_j.sum(axis=-1)
        if self.reparameterisation is None or self.reparameterisation == "none":
            return x.copy(), np.zeros(len(x))
        raise ValueError(
            f"Unknown reparameterisation: '{self.reparameterisation}'"
        )

    def from_prime(self, x_prime: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """logit space -> hypercube with log|dx/dx'|.

        Reference: ``nessai/proposal/importance.py:231``.
        """
        if self.reparameterisation == "logit":
            x, log_j = sigmoid(x_prime)
            return x, log_j.sum(axis=-1)
        if self.reparameterisation is None or self.reparameterisation == "none":
            return x_prime.copy(), np.zeros(len(x_prime))
        raise ValueError(
            f"Unknown reparameterisation: '{self.reparameterisation}'"
        )

    def rescale(self, x) -> Tuple[np.ndarray, np.ndarray]:
        """Structured hypercube samples -> prime array + log_j."""
        arr = live_points_to_array(x, self.model.names)
        return self.to_prime(arr)

    def inverse_rescale(self, x_prime: np.ndarray):
        arr, log_j = self.from_prime(x_prime)
        if self.clip:
            # reference ``nessai/proposal/importance.py:254-256``
            arr = np.clip(arr, 0.0, 1.0)
        samples = numpy_array_to_live_points(arr, self.model.names)
        return samples, log_j

    # ------------------------------------------------------------------
    def train(
        self,
        samples: np.ndarray,
        plot: bool = False,
        output: Optional[str] = None,
        weights: Optional[np.ndarray] = None,
        **kwargs,
    ) -> None:
        """Train a new flow level. Reference:
        ``nessai/proposal/importance.py:292-380``.
        """
        self.level_count += 1
        self._weights[self.level_count] = np.nan
        output = self.output if output is None else output
        level_output = os.path.join(output, f"level_{self.level_count}", "")
        training_data = samples.copy()
        x_prime, _ = self.rescale(training_data)

        if plot:
            from ..plot import (
                plot_1d_comparison,
                plot_histogram,
                plot_live_points,
            )

            os.makedirs(level_output, exist_ok=True)
            plot_live_points(
                training_data,
                filename=os.path.join(level_output, "training_data.png"),
            )
            plot_1d_comparison(
                x_prime,
                convert_to_live_points=True,
                filename=os.path.join(
                    level_output, "prime_training_data.png"
                ),
            )

        if self.weighted_kl or weights is not None:
            if weights is not None:
                weights = np.asarray(weights, dtype=float)
                weights = weights / np.sum(weights)
            else:
                log_w = np.asarray(training_data["logW"], dtype=float).copy()
                log_w -= logsumexp(log_w)
                weights = np.exp(log_w)
            if np.isnan(weights).any():
                raise ValueError("Weights contain NaN(s)")
            if not np.isfinite(weights).all():
                raise ValueError("Weights contain Inf(s)")
            if plot:
                plot_histogram(
                    weights,
                    filename=os.path.join(
                        level_output, "training_weights.png"
                    ),
                )
        else:
            weights = None

        self.flow.add_new_flow(reset=self._reset_flow)
        logger.debug(
            "Training level %d with %d samples",
            self.level_count,
            len(x_prime),
        )
        # sync=False: the level's log_Q evaluation that follows queues
        # behind the training program instead of paying an extra
        # host-device roundtrip (ignored when training plots are on)
        kwargs.setdefault("sync", False)
        self.flow.train(
            x_prime,
            weights=weights,
            plot=plot or self.plot_training,
            **kwargs,
        )
        self.training_count += 1

        if plot:
            test_samples_prime, log_prob = self.flow.sample_and_log_prob(2000)
            test_samples, log_j_inv = self.inverse_rescale(
                test_samples_prime
            )
            log_prob = log_prob - log_j_inv
            test_samples["logQ"] = log_prob
            plot_live_points(
                test_samples,
                filename=os.path.join(
                    level_output, "generated_samples.png"
                ),
            )

    # ------------------------------------------------------------------
    def compute_log_Q(
        self, x_prime: np.ndarray, log_j: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Meta-proposal density (in the hypercube) for prime samples.

        Returns (log_Q, log_q_all [n, n_proposals]). Column 0 is the
        prior (uniform hypercube → 0); flow columns are
        ``flow.log_prob(x') + log|dx'/dx|``.
        Reference: ``nessai/proposal/importance.py:382-441``.
        """
        if np.isnan(x_prime).any():
            logger.warning("NaNs in samples when computing log_Q")
        if any(np.isnan(w) for w in self.weights.values()):
            raise RuntimeError("Some weights are not set!")
        n = len(x_prime)
        log_q_all = np.zeros((n, self.n_proposals))
        n_flows = self.flow.n_models
        if self.n_proposals > 1 and log_j is None:
            raise RuntimeError(
                "Must specify log_j! Meta-proposal includes flows"
            )
        if n_flows >= 1:
            log_q_all[:, 1:] = self.flow.log_prob_all(x_prime) + log_j[:, None]
        if np.isnan(log_q_all).any():
            raise ValueError("log_q contains NaNs")
        log_Q = logsumexp(log_q_all, b=self.weights_array[None, :], axis=1)
        return log_Q, log_q_all

    def compute_meta_proposal_from_log_q(self, log_q: np.ndarray) -> np.ndarray:
        """Reference: ``nessai/proposal/importance.py:545``."""
        return logsumexp(log_q, b=self.weights_array[None, :], axis=1)

    def compute_meta_proposal_samples(self, samples) -> Tuple[np.ndarray, np.ndarray]:
        """Meta-proposal log-prob for structured hypercube samples.
        Reference: ``nessai/proposal/importance.py:550-576``."""
        if self.level_count not in self.weights or np.isnan(
            self.weights[self.level_count]
        ):
            raise RuntimeError(
                "Weight(s) missing or not set. "
                f"Current weights: {self.weights}."
            )
        x_prime, log_j = self.rescale(samples)
        return self.compute_log_Q(x_prime, log_j=log_j)

    # ------------------------------------------------------------------
    def draw(self, n: int, flow_number: Optional[int] = None, update_counts: bool = True):
        """Draw n hypercube samples from the newest flow (with finiteness
        rejection) and compute their meta-proposal density.

        Returns (samples struct, log_q [n, n_proposals]).
        Reference: ``nessai/proposal/importance.py:443-526``.
        """
        if flow_number is None:
            flow_number = self.flow.n_models - 1
        samples = empty_structured_array(0, names=self.model.names)
        log_q = np.empty((0, self.n_proposals))
        n_accepted = 0
        n_draws = 0
        while n_accepted < n:
            prime, _ = self.flow.sample_and_log_prob_ith(flow_number, N=n)
            n_draws += n
            x_arr, _ = self.from_prime(prime)
            finite = (
                np.isfinite(prime).all(axis=1)
                & np.isfinite(x_arr).all(axis=1)
                & (x_arr > 0.0).all(axis=1)
                & (x_arr < 1.0).all(axis=1)
            )
            prime = prime[finite]
            if not len(prime):
                if n_draws > 100 * n:
                    raise RuntimeError("Failed to draw finite samples")
                continue
            # log|dx'/dx| = -log|dx/dx'|
            _, log_j_from = self.from_prime(prime)
            log_Q_batch, log_q_batch = self.compute_log_Q(
                prime, log_j=-log_j_from
            )
            ok = np.isfinite(log_Q_batch)
            x_batch, _ = self.from_prime(prime[ok])
            new = numpy_array_to_live_points(x_batch, self.model.names)
            new["logQ"] = log_Q_batch[ok]
            new["logU"] = self.model.batch_evaluate_log_prior_unit_hypercube(
                new
            )
            new["logW"] = new["logU"] - new["logQ"]
            samples = np.concatenate([samples, new])
            log_q = np.concatenate([log_q, log_q_batch[ok]])
            n_accepted += len(new)
            if n_draws > 100 * n:
                logger.warning("Drawing is very inefficient")
                break
        samples = samples[:n]
        log_q = log_q[:n]
        return samples, log_q

    def update_log_q(self, samples: np.ndarray, log_q: np.ndarray) -> np.ndarray:
        """Append the newest flow's log_q column for existing samples.

        Reference: ``nessai/proposal/importance.py:528``.
        """
        if log_q.shape[1] == self.n_proposals:
            raise ValueError("log_q array already contains current proposal")
        x_prime, log_j = self.rescale(samples)
        log_prob_fn = self.get_proposal_log_prob(self.level_count)
        new_col = log_prob_fn(x_prime) + log_j
        return np.concatenate([log_q, new_col[:, None]], axis=1)

    def draw_from_prior(self, n: int):
        """Prior draws (via the model, so non-uniform hypercube priors
        are honoured) with their log_q matrix.
        Reference: ``nessai/proposal/importance.py:630-641``."""
        samples = self.model.sample_unit_hypercube(n)
        samples["logU"] = self.model.batch_evaluate_log_prior_unit_hypercube(
            samples
        )
        x_prime, log_j = self.rescale(samples)
        log_Q, log_q = self.compute_log_Q(x_prime, log_j=log_j)
        samples["logQ"] = log_Q
        samples["logW"] = samples["logU"] - log_Q
        return samples, log_q

    def draw_from_flows(
        self, n: int, weights: Optional[np.ndarray] = None, counts=None
    ):
        """Draw from the whole mixture (multinomial over proposals) —
        used for the final unbiased redraw and bootstrap.

        Reference: ``nessai/proposal/importance.py:642-745``.
        """
        if weights is None:
            weights = self.weights_array
        weights = np.asarray(weights, dtype=float)
        weights = weights / weights.sum()
        if counts is None:
            counts = self.rng.multinomial(n, weights)
        all_prime = []
        for i, c in enumerate(counts):
            if c == 0:
                continue
            if i == 0:
                u = self.rng.uniform(size=(int(c), self.model.dims))
                prime, _ = self.to_prime(u)
            else:
                prime, _ = self.flow.sample_and_log_prob_ith(i - 1, N=int(c))
            all_prime.append(prime)
        prime = np.concatenate(all_prime, axis=0)
        x_arr, _ = self.from_prime(prime)
        finite = (
            np.isfinite(x_arr).all(axis=1)
            & (x_arr > 0).all(axis=1)
            & (x_arr < 1).all(axis=1)
        )
        prime = prime[finite]
        x_arr = x_arr[finite]
        _, log_j = self.to_prime(x_arr)
        log_Q, log_q = self.compute_log_Q(prime, log_j)
        samples = numpy_array_to_live_points(x_arr, self.model.names)
        samples["logQ"] = log_Q
        samples["logU"] = 0.0
        samples["logW"] = -log_Q
        return samples, log_q

    # ------------------------------------------------------------------
    def resume(
        self, model, flow_config=None, training_config=None,
        weights_path=None,
    ) -> None:
        """Reference: ``nessai/proposal/importance.py`` resume logic."""
        super().resume(model)
        if flow_config is not None:
            self.flow_config = dict(flow_config)
            self.flow_config["n_inputs"] = model.dims
        if training_config is not None:
            self.training_config = dict(training_config)
        self.flow = ImportanceFlowModel(
            flow_config=self.flow_config,
            training_config=self.training_config,
            output=self.output,
            rng=self.rng,
        )
        self.flow.initialise()
        self.flow.load_all_weights(weights_path or self.output)

    def __getstate__(self):
        state = super().__getstate__()
        state["flow"] = None
        return state
