"""Rescaling reparameterisations.

Reference: ``nessai/reparameterisations/rescale.py`` — ``ScaleAndShift``
(z-score, ``:119-318``), ``Rescale``, and ``RescaleToBounds`` with live
bound updates, offsets, pre/post rescaling and boundary inversion
(``:321-731``).
"""

import logging

import numpy as np

from ..utils.rescaling import (
    configure_edge_detection,
    detect_edge,
    rescaling_functions,
)
from .base import Reparameterisation

logger = logging.getLogger(__name__)

__all__ = ["ScaleAndShift", "Rescale", "RescaleToBounds"]


class PrePostMixin:
    """Optional elementwise pre/post rescaling functions with log-Jacobians
    (logit, log, gaussian_cdf, ...). Reference:
    ``nessai/reparameterisations/rescale.py:24-116``."""

    pre_rescaling = None
    post_rescaling = None

    def _set_rescaling(self, attr, value):
        if value is None:
            setattr(self, attr, None)
            return
        if isinstance(value, str):
            pair = rescaling_functions.get(value)
            if pair is None:
                raise RuntimeError(f"Unknown rescaling function: {value}")
            setattr(self, attr, pair)
        elif isinstance(value, (tuple, list)) and len(value) == 2:
            setattr(self, attr, tuple(value))
        else:
            raise RuntimeError(f"Invalid rescaling: {value}")

    def _apply_pre(self, x):
        if self.pre_rescaling is None:
            return x, np.zeros_like(x)
        return self.pre_rescaling[0](x)

    def _apply_pre_inv(self, x):
        if self.pre_rescaling is None:
            return x, np.zeros_like(x)
        return self.pre_rescaling[1](x)

    def _apply_post(self, x):
        if self.post_rescaling is None:
            return x, np.zeros_like(x)
        return self.post_rescaling[0](x)

    def _apply_post_inv(self, x):
        if self.post_rescaling is None:
            return x, np.zeros_like(x)
        return self.post_rescaling[1](x)


class ScaleAndShift(Reparameterisation, PrePostMixin):
    """x' = (pre(x) - shift) / scale, optionally estimated (z-score) from
    the training data on each :meth:`update`.

    Reference: ``nessai/reparameterisations/rescale.py:119``.
    """

    def __init__(
        self,
        parameters=None,
        prior_bounds=None,
        scale=None,
        shift=None,
        estimate: bool = False,
        estimate_scale: bool = False,
        estimate_shift: bool = False,
        pre_rescaling=None,
        post_rescaling=None,
        rng=None,
    ):
        super().__init__(parameters=parameters, prior_bounds=prior_bounds, rng=rng)
        self.estimate_scale = estimate_scale or estimate
        self.estimate_shift = estimate_shift or estimate
        self.estimate = self.estimate_scale or self.estimate_shift
        self._set_rescaling("pre_rescaling", pre_rescaling)
        self._set_rescaling("post_rescaling", post_rescaling)
        if scale is None and not self.estimate_scale:
            raise RuntimeError("Must specify a scale or enable estimate_scale")
        self.scale = self._per_param(scale, 1.0)
        self.shift = self._per_param(shift, 0.0)

    def _per_param(self, value, default):
        if value is None:
            return {p: float(default) for p in self.parameters}
        if isinstance(value, dict):
            return {p: float(value[p]) for p in self.parameters}
        if np.isscalar(value):
            return {p: float(value) for p in self.parameters}
        value = np.asarray(value, dtype=float).ravel()
        return {p: float(v) for p, v in zip(self.parameters, value)}

    def update(self, x) -> None:
        if not self.estimate:
            return
        for p in self.parameters:
            vals, _ = self._apply_pre(np.asarray(x[p], dtype=float))
            if self.estimate_scale:
                self.scale[p] = float(np.std(vals)) or 1.0
            if self.estimate_shift:
                self.shift[p] = float(np.mean(vals))

    def as_affine(self):
        """Per-parameter (scale, shift) of the *inverse* map
        ``x = x' * scale + shift`` when this reparameterisation is purely
        affine (no pre/post rescaling); else None. Used by the fused
        device-side populate path."""
        if self.pre_rescaling is not None or self.post_rescaling is not None:
            return None
        return {
            p: (float(self.scale[p]), float(self.shift[p]))
            for p in self.parameters
        }

    def reparameterise(self, x, x_prime, log_j, **kwargs):
        for p, pp in zip(self.parameters, self.prime_parameters):
            vals, lj_pre = self._apply_pre(np.asarray(x[p], dtype=float))
            out = (vals - self.shift[p]) / self.scale[p]
            lj = -np.log(abs(self.scale[p])) * np.ones_like(out)
            out, lj_post = self._apply_post(out)
            x_prime[pp] = out
            log_j = log_j + lj_pre + lj + lj_post
        return x, x_prime, log_j

    def inverse_reparameterise(self, x, x_prime, log_j, **kwargs):
        for p, pp in zip(self.parameters, self.prime_parameters):
            vals, lj_post = self._apply_post_inv(
                np.asarray(x_prime[pp], dtype=float)
            )
            out = vals * self.scale[p] + self.shift[p]
            lj = np.log(abs(self.scale[p])) * np.ones_like(out)
            out, lj_pre = self._apply_pre_inv(out)
            x[p] = out
            log_j = log_j + lj_post + lj + lj_pre
        return x, x_prime, log_j


class Rescale(ScaleAndShift):
    """Scale-only variant (shift = 0). Reference:
    ``nessai/reparameterisations/rescale.py:300``."""

    def __init__(self, parameters=None, prior_bounds=None, scale=None, rng=None):
        if scale is None:
            raise RuntimeError("Must specify a scale")
        super().__init__(
            parameters=parameters,
            prior_bounds=prior_bounds,
            scale=scale,
            shift=None,
            estimate=False,
            rng=rng,
        )


class RescaleToBounds(Reparameterisation, PrePostMixin):
    """Map prior bounds to ``rescale_bounds`` (default [-1, 1]) with
    optional live bound updates, per-parameter offsets, pre/post rescaling
    and boundary inversion.

    Reference: ``nessai/reparameterisations/rescale.py:321``.
    """

    requires_bounded_prior = True

    def __init__(
        self,
        parameters=None,
        prior_bounds=None,
        rescale_bounds=None,
        update_bounds: bool = True,
        offset: bool = False,
        boundary_inversion=None,
        detect_edges: bool = False,
        detect_edges_kwargs=None,
        inversion_type: str = "split",
        prior=None,
        pre_rescaling=None,
        post_rescaling=None,
        rng=None,
    ):
        super().__init__(parameters=parameters, prior_bounds=prior_bounds, rng=rng)
        if rescale_bounds is None:
            rescale_bounds = [-1.0, 1.0]
        if isinstance(rescale_bounds, dict):
            self.rescale_bounds = {
                p: list(map(float, rescale_bounds[p])) for p in self.parameters
            }
        else:
            self.rescale_bounds = {
                p: list(map(float, rescale_bounds)) for p in self.parameters
            }
        self._set_rescaling("pre_rescaling", pre_rescaling)
        self._set_rescaling("post_rescaling", post_rescaling)

        if boundary_inversion is None:
            boundary_inversion = []
        elif boundary_inversion is True:
            boundary_inversion = list(self.parameters)
        elif isinstance(boundary_inversion, str):
            boundary_inversion = [boundary_inversion]
        self.boundary_inversion = list(boundary_inversion)
        unknown = set(self.boundary_inversion) - set(self.parameters)
        if unknown:
            raise RuntimeError(f"Unknown inversion parameters: {unknown}")
        # Inversion parameters are always rescaled to [0, 1]
        # (reference ``rescale.py:447-449``)
        for p in self.boundary_inversion:
            self.rescale_bounds[p] = [0.0, 1.0]
        if inversion_type not in ("split", "duplicate"):
            raise RuntimeError(f"Unknown inversion type: {inversion_type}")
        self.inversion_type = inversion_type
        self.detect_edges = detect_edges
        if detect_edges and not self.boundary_inversion:
            raise RuntimeError(
                "detect_edges requires boundary_inversion parameters"
            )
        self.detect_edges_kwargs = configure_edge_detection(
            detect_edges_kwargs, detect_edges
        )
        self._edges = {p: None for p in self.parameters}
        self.update_bounds_enabled = update_bounds or bool(
            self.boundary_inversion
        )
        self.prior = prior
        self.has_prime_prior = (
            prior == "uniform"
            and not self.boundary_inversion
            and not self.update_bounds_enabled
        )

        # pre-rescaled prior bounds
        self.pre_prior_bounds = {
            p: self._apply_pre(self.prior_bounds[p])[0]
            for p in self.parameters
        }
        if offset:
            self.offsets = {
                p: float(
                    self.pre_prior_bounds[p][0]
                    + 0.5 * np.ptp(self.pre_prior_bounds[p])
                )
                for p in self.parameters
            }
        else:
            self.offsets = {p: 0.0 for p in self.parameters}
        self.bounds = {
            p: self.pre_prior_bounds[p] - self.offsets[p]
            for p in self.parameters
        }

    # ------------------------------------------------------------------
    def _rescale_to_bounds(self, x, p):
        lo, hi = self.bounds[p]
        rb = self.rescale_bounds[p]
        out = (rb[1] - rb[0]) * (x - lo) / (hi - lo) + rb[0]
        log_j = np.log(rb[1] - rb[0]) - np.log(hi - lo)
        return out, log_j * np.ones_like(out)

    def _inverse_rescale_to_bounds(self, x, p):
        lo, hi = self.bounds[p]
        rb = self.rescale_bounds[p]
        out = (hi - lo) * (x - rb[0]) / (rb[1] - rb[0]) + lo
        log_j = np.log(hi - lo) - np.log(rb[1] - rb[0])
        return out, log_j * np.ones_like(out)

    def update(self, x) -> None:
        """Refresh data-driven bounds and reset edge detection.

        Reference: ``nessai/reparameterisations/rescale.py:293,651``."""
        if not self.update_bounds_enabled:
            return
        for p in self.parameters:
            vals, _ = self._apply_pre(np.asarray(x[p], dtype=float))
            vals = vals - self.offsets[p]
            self.bounds[p] = np.array([vals.min(), vals.max()])
        self._edges = {p: None for p in self.parameters}

    update_bounds = update

    def reset(self) -> None:
        self._edges = {p: None for p in self.parameters}
        self.bounds = {
            p: self.pre_prior_bounds[p] - self.offsets[p]
            for p in self.parameters
        }

    def reset_inversion(self) -> None:
        """Clear detected edges only. Reference:
        ``nessai/reparameterisations/rescale.py:690``."""
        self._edges = {p: None for p in self.parameters}

    def set_bounds(self, prior_bounds: dict) -> None:
        """Set bounds explicitly from prior bounds. Reference:
        ``nessai/reparameterisations/rescale.py:700``."""
        self.pre_prior_bounds = {
            p: self._apply_pre(np.asarray(prior_bounds[p], dtype=float))[0]
            for p in self.parameters
        }
        self.bounds = {
            p: self.pre_prior_bounds[p] - self.offsets[p]
            for p in self.parameters
        }

    # ------------------------------------------------------------------
    def reparameterise(self, x, x_prime, log_j, compute_radius=False, **kwargs):
        for p, pp in zip(self.parameters, self.prime_parameters):
            vals, lj_pre = self._apply_pre(np.asarray(x[p], dtype=float))
            vals = vals - self.offsets[p]
            if p in self.boundary_inversion:
                (
                    x,
                    x_prime,
                    log_j,
                    vals_out,
                    lj,
                ) = self._apply_inversion(
                    x, x_prime, log_j, p, vals, compute_radius
                )
                x_prime[pp] = vals_out
                log_j = log_j + lj + self._tile(lj_pre, len(log_j))
            else:
                out, lj = self._rescale_to_bounds(vals, p)
                out, lj_post = self._apply_post(out)
                x_prime[pp] = out
                log_j = log_j + lj_pre + lj + lj_post
        return x, x_prime, log_j

    @staticmethod
    def _tile(arr, n):
        arr = np.asarray(arr)
        if len(arr) == n:
            return arr
        reps = n // len(arr)
        return np.tile(arr, reps)

    def _apply_inversion(self, x, x_prime, log_j, p, vals, compute_radius):
        """Boundary inversion: rescale to [0, 1], then reflect at the
        detected edge ('split': random half negated in place;
        'duplicate': append the mirrored copy, doubling the arrays).
        When no edge is detected the parameter falls through to a plain
        [-1, 1] rescale, mirrored exactly by the inverse.

        Reference: ``nessai/reparameterisations/rescale.py:541-585``.
        """
        lo, hi = self.bounds[p]
        if self._edges[p] is None:
            self._edges[p] = detect_edge(
                (vals - lo) / (hi - lo), **self.detect_edges_kwargs
            )
        edge = self._edges[p]
        if not edge:
            # reference ``rescale.py:575-583``: plain [-1, 1] rescale
            out = 2.0 * (vals - lo) / (hi - lo) - 1.0
            lj = (np.log(2.0) - np.log(hi - lo)) * np.ones_like(out)
            return x, x_prime, log_j, out, lj
        out = (vals - lo) / (hi - lo)
        lj = -np.log(hi - lo) * np.ones_like(out)
        if edge == "upper":
            out = 1.0 - out
        if self.inversion_type == "duplicate" or compute_radius:
            x = np.concatenate([x, x])
            x_prime = np.concatenate([x_prime, x_prime])
            log_j = np.concatenate([log_j, log_j])
            lj = np.concatenate([lj, lj])
            out = np.concatenate([out, -out])
        else:
            mask = self.rng.random(len(out)) < 0.5
            out[mask] *= -1.0
        return x, x_prime, log_j, out, lj

    def inverse_reparameterise(self, x, x_prime, log_j, **kwargs):
        for p, pp in zip(self.parameters, self.prime_parameters):
            vals = np.asarray(x_prime[pp], dtype=float).copy()
            if p in self.boundary_inversion and self._edges.get(p):
                vals = np.abs(vals)
                if self._edges[p] == "upper":
                    vals = 1.0 - vals
                lo, hi = self.bounds[p]
                out = vals * (hi - lo) + lo
                lj = np.log(hi - lo) * np.ones_like(out)
            elif p in self.boundary_inversion:
                # no edge detected: mirror of the plain [-1, 1] rescale
                # (reference ``rescale.py:597-601``)
                lo, hi = self.bounds[p]
                out = (vals + 1.0) * (hi - lo) / 2.0 + lo
                lj = (np.log(hi - lo) - np.log(2.0)) * np.ones_like(out)
            else:
                vals, lj_post = self._apply_post_inv(vals)
                out, lj = self._inverse_rescale_to_bounds(vals, p)
                lj = lj + lj_post
            out = out + self.offsets[p]
            out, lj_pre = self._apply_pre_inv(out)
            x[p] = out
            log_j = log_j + lj + lj_pre
        return x, x_prime, log_j

    # ------------------------------------------------------------------
    def x_prime_log_prior(self, x_prime):
        """Uniform prime prior when bounds are fixed (prior='uniform').

        Reference: ``nessai/reparameterisations/rescale.py:500``."""
        if not self.has_prime_prior:
            raise RuntimeError(
                "Prime prior not available (requires prior='uniform' and "
                "no boundary inversion)"
            )
        log_p = 0.0
        for p, pp in zip(self.parameters, self.prime_parameters):
            rb = self.rescale_bounds[p]
            vals = x_prime[pp]
            inside = (vals >= rb[0]) & (vals <= rb[1])
            log_p = log_p + np.where(
                inside, -np.log(rb[1] - rb[0]), -np.inf
            )
        return log_p
