"""Evidence integration.

Reference: ``nessai/evidence.py`` — ``_NSIntegralState`` (streaming
logsumexp rectangle rule with shrinkage ``logt = -1/nlive``, trapezoid
re-integration at finalise, ``:120-266``) and ``_INSIntegralState``
(``:269-441``).
"""

import logging
from typing import List, Optional

import numpy as np
from scipy.special import logsumexp

logger = logging.getLogger(__name__)

__all__ = [
    "logsubexp",
    "log_integrate_log_trap",
    "_NSIntegralState",
    "_INSIntegralState",
    "log_evidence_from_ins_samples",
]


def logsubexp(x, y):
    """log(exp(x) - exp(y)), elementwise, requires x >= y.

    Reference: ``nessai/evidence.py:20``.
    """
    if np.any(x < y):
        raise RuntimeError("cannot take log of negative number")
    return x + np.log1p(-np.exp(y - x))


def log_integrate_log_trap(log_func, log_support):
    """Trapezoid rule in log space.

    Reference: ``nessai/evidence.py:40``.
    """
    log_func_sum = np.logaddexp(log_func[:-1], log_func[1:]) - np.log(2)
    log_dxs = logsubexp(log_support[:-1], log_support[1:])
    return logsumexp(log_func_sum + log_dxs)


class _NSIntegralState:
    """Streaming nested-sampling evidence state.

    Reference: ``nessai/evidence.py:120``.
    """

    #: class-level defaults so pre-round-3 pickles resume cleanly
    expectation = "logt"
    nonmonotonic_count = 0

    def __init__(
        self,
        nlive: int,
        track_gradients: bool = True,
        expand_factor=None,
        expectation: str = "logt",
    ):
        self.base_nlive = int(nlive)
        self.track_gradients = track_gradients
        if expectation.lower() not in ("t", "logt"):
            raise ValueError(
                f"Expectation must be t or logt, got: {expectation}"
            )
        #: Shrinkage expectation: 'logt' uses <log t> = -1/N, 't' uses
        #: <t> = N/(N+1) (reference ``evidence.py:115-128,160-171``)
        self.expectation = expectation.lower()
        self.reset()

    def reset(self) -> None:
        self.logZ = -np.inf
        self.oldZ = -np.inf
        self.logw = 0.0
        self.nonmonotonic_count = 0
        self.info = [0.0]
        # logLs[0] = -inf ; log_vols[0] = 0 (X=1)
        self.logLs: List[float] = [-np.inf]
        self.log_vols: List[float] = [0.0]
        self.gradients = [0]
        #: per-iteration nlive (the finalise tail decrements it); needed
        #: to simulate the volume-contraction distribution exactly
        self.nlives: List[int] = []

    def increment(self, logL, nlive: Optional[int] = None) -> None:
        """Update the evidence with the next dead point's logL.

        Scalar ``math`` ops rather than numpy: this runs once per NS
        iteration on the host (~10⁴ calls per run) and numpy scalar
        dispatch is ~10× slower. Reference: ``nessai/evidence.py:
        151-191``.
        """
        import math

        logL = float(np.atleast_1d(logL)[0])
        if nlive is None:
            nlive = self.base_nlive
        if logL <= self.logLs[-1]:
            # rate-limited: f32 device likelihoods tie at large |logL|
            # (quantisation ~1e-4 at logL ~ -2000), which would otherwise
            # emit thousands of lines per GW-scale run
            self.nonmonotonic_count += 1
            if self.nonmonotonic_count <= 5:
                logger.warning(
                    "NS integrator received non-monotonic logL: "
                    "%.5f -> %.5f",
                    self.logLs[-1],
                    logL,
                )
            elif self.nonmonotonic_count % 1000 == 0:
                logger.warning(
                    "NS integrator received %d non-monotonic logL values "
                    "so far (ties are expected with float32 device "
                    "likelihoods at large |logL|)",
                    self.nonmonotonic_count,
                )
        if self.expectation == "logt":
            logt = -1.0 / nlive  # <log t> = -1/N
        else:
            logt = -math.log1p(1.0 / nlive)  # <t> = N/(N+1)
        # log(1 - exp(logt)), logt < 0
        Wt = self.logw + logL + math.log(-math.expm1(logt))
        if Wt > self.logZ:
            self.logZ = Wt + math.log1p(math.exp(self.logZ - Wt))
        elif Wt == -math.inf:
            pass  # logaddexp(-inf, -inf) = -inf
        else:
            self.logZ = self.logZ + math.log1p(math.exp(Wt - self.logZ))
        # information (H) update, cpnest-style
        if math.isfinite(self.oldZ):
            info = (
                math.exp(Wt - self.logZ) * logL
                + math.exp(self.oldZ - self.logZ) * (self.info[-1] + self.oldZ)
                - self.logZ
            )
            if math.isnan(info):
                info = 0.0
            self.info.append(info)
        else:
            self.info.append(0.0)
        self.oldZ = self.logZ
        self.logw += logt
        self.logLs.append(logL)
        self.log_vols.append(self.logw)
        try:
            self.nlives.append(int(nlive))
        except AttributeError:  # resumed pre-0.4.3 pickle
            self.nlives = [int(nlive)]
        if self.track_gradients:
            self.gradients.append(
                (self.logLs[-1] - self.logLs[-2])
                / (self.log_vols[-1] - self.log_vols[-2])
            )

    def get_logx_live_points(self, nlive: int) -> np.ndarray:
        """Log-prior volumes of the current live points, assuming the
        run terminated now. Reference: ``nessai/evidence.py:193``."""
        nlive_per_iteration = np.arange(nlive, 0, -1, dtype=float)
        if self.expectation == "logt":
            logt = -1.0 / nlive_per_iteration
        else:
            logt = -np.log1p(1.0 / nlive_per_iteration)
        return self.logw + np.cumsum(logt)

    @property
    def log_evidence(self) -> float:
        return float(self.logZ)

    @property
    def log_evidence_error(self) -> float:
        """sqrt(H / nlive). Reference: ``nessai/evidence.py:147-149``."""
        return float(np.sqrt(max(self.info[-1], 0.0) / self.base_nlive))

    def finalise(self) -> float:
        """Re-integrate with the trapezoid rule, closing the integral at
        X=0 with an extra point at max(L) (as the reference does).

        Reference: ``nessai/evidence.py:217-227``.
        """
        finalised = log_integrate_log_trap(
            np.array(self.logLs + [self.logLs[-1]]),
            np.array(self.log_vols + [-np.inf]),
        )
        self.logZ = float(finalised)
        return self.logZ

    def _nlive_schedule(self) -> np.ndarray:
        """Per-iteration nlive as an array aligned with
        ``logLs[1:]``. Runs resumed from pre-0.4.3 pickles are missing
        the head of the schedule; pad it with ``base_nlive`` (exact —
        only the finalise tail ever deviates)."""
        n_iter = len(self.logLs) - 1
        nlives = list(getattr(self, "nlives", []) or [])
        if len(nlives) < n_iter:
            nlives = [self.base_nlive] * (n_iter - len(nlives)) + nlives
        return np.asarray(nlives[:n_iter], dtype=float)

    def simulate_log_evidence(
        self, n_simulations: int = 500, rng=None
    ) -> np.ndarray:
        """Monte-Carlo draws of logZ under simulated prior-volume
        contractions.

        Each nested-sampling iteration contracts the prior volume by
        ``t_i = max of nlive_i uniforms``, i.e. ``log t_i =
        -Exp(1)/nlive_i``. Re-drawing the contractions and
        re-integrating (same trapezoid rule as :meth:`finalise`) gives
        the full, non-Gaussian statistical distribution of the
        evidence — the simulated-weights method of Skilling (2006) /
        Higson et al. (2018), beyond the first-order
        ``sqrt(H / nlive)`` estimate the sampler reports during the
        run. This captures stochastic volume uncertainty only; flow
        proposal systematics (curved degenerate posteriors, see
        ``docs/further-details.md``) are invisible to every
        single-run estimate.

        Vectorised over simulations: one [S, n_iter] exponential
        draw + cumsum + a batched log-trapezoid, no Python loop.

        Returns the array of logZ draws (``std`` of which is the
        simulated error). The deterministic state is not modified.
        """
        if rng is None:
            rng = np.random.default_rng()
        log_L = np.asarray(self.logLs + [self.logLs[-1]])
        n_iter = len(self.logLs) - 1
        if n_iter < 1:
            return np.full(int(n_simulations), -np.inf)
        nlives = self._nlive_schedule()
        log_f_sum = np.logaddexp(log_L[:-1], log_L[1:]) - np.log(2)
        # The batched log-trapezoid ``logsumexp(log_f_sum + log_dxs)``
        # is computed in scaled linear space: with M = max(log_f_sum),
        # w = exp(log_f_sum - M) and dx = -diff(exp(cumsum)), each row
        # reduces to a BLAS matvec ``dx @ w`` — one exp pass + one
        # matvec instead of four transcendental passes. Terms that
        # underflow in w sit > 700 nats below the peak and contribute
        # nothing. logZ = M + log(dx @ w).
        M = float(np.max(log_f_sum))
        w = np.exp(log_f_sum - M)
        # telescoped: with X = [1, exp(cumsum(logt)), 0] per row and
        # dx_j = X_j - X_{j+1}, the row sum dx @ w equals
        # w_0 + X_inner @ (w[1:] - w[:-1]) — no dx materialisation
        w0 = float(w[0])
        dw = w[1:] - w[:-1]
        neg_inv_nlives = -1.0 / nlives
        # chunk over simulations so the [S, n_iter] scratch stays
        # bounded (~80 MB) for long runs
        n_simulations = int(n_simulations)
        max_elems = int(getattr(self, "_sim_chunk_elems", 1e7))
        chunk = max(1, min(n_simulations, max_elems // max(n_iter, 1)))
        # float32 scratch: the draw/cumsum/exp passes are memory-bound
        # (n_iter × S elements — ~0.7 s of a warm 16-D finalise in
        # f64), and an error *estimate* needs nowhere near f64 — the
        # f32 cumsum's rounding (~sqrt(n_iter) · eps relative) is
        # orders of magnitude below the estimate's own ~1/sqrt(2S)
        # sampling noise. The matvec accumulates in f64.
        dw32 = dw.astype(np.float32)
        out = np.empty(n_simulations)
        for s0 in range(0, n_simulations, chunk):
            s = min(chunk, n_simulations - s0)
            e = rng.standard_exponential(
                (s, n_iter), dtype=np.float32
            )
            e *= neg_inv_nlives.astype(np.float32)
            np.cumsum(e, axis=1, out=e)
            np.exp(e, out=e)
            out[s0 : s0 + s] = M + np.log(
                w0 + e @ dw32, dtype=np.float64
            )
        return out

    def log_evidence_error_simulated(
        self, n_simulations: int = 500, rng=None
    ) -> float:
        """Standard deviation of :meth:`simulate_log_evidence` draws."""
        return float(
            np.std(self.simulate_log_evidence(n_simulations, rng=rng))
        )

    def log_posterior_weights(self):
        """Posterior weight of every dead point.

        Reference-exact (``nessai/evidence.py:258-266``): trapezoid logZ
        including the closing X=0 point, rectangle widths
        ``X_{i-1} - X_i``, normalised by logZ.
        """
        log_L = np.array(self.logLs + [self.logLs[-1]])
        log_vols = np.array(self.log_vols + [-np.inf])
        log_Z = log_integrate_log_trap(log_L, log_vols)
        log_w = logsubexp(log_vols[:-1], log_vols[1:])
        return log_L[1:-1] + log_w[:-1] - log_Z

    def plot(self, filename=None):
        """logX vs logL diagnostic plot. Reference:
        ``nessai/evidence.py:230``."""
        import matplotlib.pyplot as plt

        fig = plt.figure()
        plt.plot(self.log_vols, self.logLs)
        plt.title(
            f"logZ={self.logZ:.2f} "
            f"H={self.info[-1] * np.log2(np.e):.2f} bits"
        )
        plt.grid(which="both")
        plt.xlabel("log prior-volume")
        plt.ylabel("log-likelihood")
        plt.xlim([self.log_vols[-1], self.log_vols[0]])
        if filename is not None:
            fig.savefig(filename, bbox_inches="tight")
            plt.close(fig)
            return None
        return fig


class _INSIntegralState:
    """Evidence state for the importance nested sampler: the evidence is a
    simple MC sum over all samples, ``Z = mean(exp(logL + logW))`` where
    ``logW = -logQ`` are the meta-proposal weights.

    Reference: ``nessai/evidence.py:269-441``.
    """

    def __init__(self):
        self._weights_nested = None
        self._weights_live = None
        self._previous_logZ = -np.inf

    def update_evidence(self, nested_samples, live_points=None) -> None:
        """Recompute from the full sample sets.

        Reference: ``nessai/evidence.py:348``.
        """
        self._previous_logZ = self.log_evidence if self.n else -np.inf
        log_z_nested = nested_samples["logL"] + nested_samples["logW"]
        self._weights_nested = np.asarray(log_z_nested, dtype=np.longdouble)
        if live_points is not None:
            log_z_live = live_points["logL"] + live_points["logW"]
            self._weights_live = np.asarray(log_z_live, dtype=np.longdouble)
        else:
            self._weights_live = None

    @property
    def _all_weights(self):
        if self._weights_nested is None:
            return None
        if self._weights_live is not None:
            return np.concatenate([self._weights_nested, self._weights_live])
        return self._weights_nested

    @property
    def n(self) -> int:
        w = self._all_weights
        return len(w) if w is not None else 0

    @property
    def log_posterior_weights(self) -> np.ndarray:
        """Log-posterior weight of every sample (live points included
        when set). Reference: ``nessai/evidence.py:330-336``."""
        w = self._all_weights
        if w is None:
            return np.empty(0)
        return np.asarray(w, dtype=float) - self.log_evidence

    @property
    def log_evidence(self) -> float:
        w = self._all_weights
        if w is None or not len(w):
            return -np.inf
        return float(logsumexp(w.astype(float)) - np.log(len(w)))

    logZ = log_evidence

    @property
    def evidence(self) -> float:
        """Reference: ``nessai/evidence.py:298``."""
        return float(np.exp(self.log_evidence))

    @property
    def log_evidence_nested_samples(self) -> float:
        """Per-part evidence normalised by the nested-sample count.

        Reference: ``nessai/evidence.py:315``."""
        w = self._weights_nested
        if w is None or not len(w):
            return -np.inf
        return float(logsumexp(w.astype(float)) - np.log(len(w)))

    @property
    def log_evidence_live_points(self) -> float:
        """Reference: ``nessai/evidence.py:308`` — raises if the live
        points have not been set."""
        w = self._weights_live
        if w is None:
            raise RuntimeError("Live points are not set")
        if not len(w):
            return -np.inf
        return float(logsumexp(w.astype(float)) - np.log(len(w)))

    @property
    def log_evidence_error(self) -> float:
        return self.compute_uncertainty()

    @property
    def evidence_error(self) -> float:
        """Linear-space standard error. Reference:
        ``nessai/evidence.py:303``."""
        return self.compute_uncertainty(log_evidence=False)

    @property
    def fractional_error(self) -> float:
        """Reference: ``nessai/evidence.py:320``."""
        return float(self.evidence_error / self.evidence)

    @property
    def difference_log_evidence(self) -> float:
        """|logZ - previous logZ| across evidence updates.

        Reference: ``nessai/evidence.py:325``."""
        return float(np.abs(self.logZ - self._previous_logZ))

    def compute_uncertainty(self, log_evidence: bool = True) -> float:
        """Standard error of the MC evidence estimate (relative/log-space
        if ``log_evidence``, else linear), longdouble accumulation.
        Reference: ``nessai/evidence.py:423``.
        """
        w = self._all_weights
        if w is None or len(w) < 2:
            return np.inf
        n = len(w)
        Z_hat = np.exp(logsumexp(w) - np.log(n), dtype=np.longdouble)
        u = np.exp(w, dtype=np.longdouble)
        se = np.sqrt(np.sum((u - Z_hat) ** 2) / (n * (n - 1)))
        if log_evidence:
            return float(se / Z_hat)
        return float(se)

    def compute_log_evidence_ratio(self, ns_only: bool = False) -> float:
        """log(Z_live / Z_nested-or-total). Reference:
        ``nessai/evidence.py:380``."""
        if ns_only:
            return (
                self.log_evidence_live_points
                - self.log_evidence_nested_samples
            )
        return self.log_evidence_live_points - self.log_evidence

    def compute_evidence_ratio(self, ns_only: bool = False) -> float:
        """Deprecated alias for :meth:`compute_log_evidence_ratio`.

        Reference: ``nessai/evidence.py:406-421``."""
        import warnings

        warnings.warn(
            "compute_evidence_ratio is deprecated, "
            "use compute_log_evidence_ratio instead",
            DeprecationWarning,
            stacklevel=2,
        )
        return self.compute_log_evidence_ratio(ns_only=ns_only)

    @property
    def log_evidence_ratio(self) -> float:
        """log(Z_live / Z_total) — the INS stopping quantity.

        Reference: ``nessai/evidence.py:339``.
        """
        return float(self.compute_log_evidence_ratio(ns_only=False))

    @property
    def log_evidence_ratio_nested_samples(self) -> float:
        """Reference: ``nessai/evidence.py:344``."""
        return float(self.compute_log_evidence_ratio(ns_only=True))

    @property
    def effective_n_posterior_samples(self) -> float:
        """Kish ESS of the posterior weights. Reference:
        ``nessai/evidence.py:410``."""
        from .utils.stats import effective_sample_size

        w = self._all_weights
        if w is None or not len(w):
            return 0.0
        return effective_sample_size(w.astype(float))

    ess = effective_n_posterior_samples
    """Alias for :attr:`effective_n_posterior_samples` (reference
    ``nessai/evidence.py:100``)."""


def log_evidence_from_ins_samples(samples) -> float:
    """Evidence from a set of INS samples. Reference:
    ``nessai/evidence.py:444``."""
    return float(
        logsumexp(samples["logL"] + samples["logW"]) - np.log(len(samples))
    )
