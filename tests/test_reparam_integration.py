"""Reparameterisation integration sweep through a real FlowProposal.

Analogue of the reference's
``tests/test_proposal/test_flowproposal/test_reparam_integration.py``
(597 LoC): for each registry spec, configure a proposal on a suitable
model, verify the rescaling is invertible, and check the prime
parameters. Uses real (tiny) flows, not mocks.
"""

import numpy as np
import pytest

from nessai_tpu.model import Model
from nessai_tpu.proposal.flowproposal import FlowProposal


class BoxModel(Model):
    """2-D box on asymmetric bounds (suits affine-style reparams)."""

    def __init__(self, bounds=None):
        self.names = ["x", "y"]
        self.bounds = bounds or {"x": [-5.0, 5.0], "y": [0.0, 10.0]}

    def log_prior(self, x):
        lp = np.log(self.in_bounds(x), dtype=float)
        for n in self.names:
            lp -= np.log(np.ptp(self.bounds[n]))
        return lp

    def log_likelihood(self, x):
        x = np.atleast_1d(x)
        u = self.unstructured_view(x).reshape(len(x), -1)
        return -0.5 * np.sum((u - 1.0) ** 2, axis=-1)


class AngleModel(BoxModel):
    def __init__(self):
        super().__init__(
            bounds={"x": [0.0, 2 * np.pi], "y": [0.0, np.pi]}
        )


def _make_proposal(model, reparameterisations, tmp_path, rng):
    p = FlowProposal(
        model,
        output=str(tmp_path),
        poolsize=50,
        rng=rng,
        reparameterisations=reparameterisations,
        flow_config=dict(n_blocks=2, n_neurons=4, n_layers=1),
        training_config=dict(max_epochs=3, patience=2, batch_size=50),
    )
    p.initialise()
    return p


@pytest.mark.parametrize(
    "spec",
    [
        "default",
        "rescaletobounds",
        "zscore",
        "z-score",
        "logit",
        "zscore-gaussian-cdf",
        "offset",
        None,
    ],
)
def test_affine_style_specs(spec, tmp_path, rng):
    """Each spec configures, passes verify_rescaling and produces
    invertible forward/inverse passes on prior draws."""
    model = BoxModel()
    model.set_rng(rng)
    if spec is None:
        reparams = None
    else:
        reparams = {"x": spec, "y": spec}
    p = _make_proposal(model, reparams, tmp_path, rng)
    x = model.new_point(N=32)
    # production always updates state before rescaling (z-score estimates
    # are reset to identity by verify_rescaling's final reset)
    p.check_state(x)
    x_prime, log_j = p.rescale(x)
    x_back, log_j_inv = p.inverse_rescale(x_prime)
    keep = slice(0, len(x))
    for n in model.names:
        np.testing.assert_allclose(
            np.sort(np.asarray(x_back[n])[keep]),
            np.sort(np.asarray(x[n])),
            atol=1e-6,
            err_msg=f"{spec}:{n}",
        )


@pytest.mark.parametrize("spec", ["inversion", "inversion-duplicate"])
def test_boundary_inversion_specs(spec, tmp_path, rng):
    """Boundary inversion on one parameter (as in half_gaussian):
    verify_rescaling passes (handling split/duplicate modes) and the
    proposal initialises."""
    model = BoxModel()
    model.set_rng(rng)
    p = _make_proposal(model, {"x": spec, "y": "default"}, tmp_path, rng)
    x = model.new_point(N=32)
    p._reparameterisation.update(x)
    x_prime, log_j = p.rescale(x)
    x_back, log_j_inv = p.inverse_rescale(x_prime)
    k = len(x_back) // len(x)
    np.testing.assert_allclose(
        np.asarray(np.tile(x, k)["x"]),
        np.asarray(x_back["x"]),
        atol=1e-8,
    )


def test_scaleandshift_explicit_scale(tmp_path, rng):
    """scaleandshift requires an explicit scale (or estimation), as in
    the reference (``nessai/reparameterisations/rescale.py``)."""
    model = BoxModel()
    model.set_rng(rng)
    p = _make_proposal(
        model,
        {
            "x": {"reparameterisation": "scaleandshift", "scale": 5.0},
            "y": {
                "reparameterisation": "scaleandshift",
                "estimate": True,
            },
        },
        tmp_path,
        rng,
    )
    x = model.new_point(N=32)
    p._reparameterisation.update(x)
    x_prime, _ = p.rescale(x)
    x_back, _ = p.inverse_rescale(x_prime)
    for n in model.names:
        np.testing.assert_allclose(
            np.asarray(x_back[n])[: len(x)], np.asarray(x[n]), atol=1e-8
        )


def test_zscore_logit_unit_bounds(tmp_path, rng):
    """z-score-logit pre-rescales with a logit, so it applies to
    (0, 1)-bounded parameters."""
    model = BoxModel(bounds={"x": [0.0, 1.0], "y": [0.0, 1.0]})
    model.set_rng(rng)
    p = _make_proposal(
        model, {"x": "z-score-logit", "y": "z-score-logit"}, tmp_path, rng
    )
    x = model.new_point(N=32)
    x_prime, _ = p.rescale(x)
    x_back, _ = p.inverse_rescale(x_prime)
    for n in model.names:
        np.testing.assert_allclose(
            np.asarray(x_back[n])[: len(x)], np.asarray(x[n]), atol=1e-6
        )


@pytest.mark.parametrize(
    "spec", ["angle-2pi", "periodic", "angle-sine", "angle-cosine"]
)
def test_angle_specs(spec, tmp_path, rng):
    model = AngleModel()
    model.set_rng(rng)
    reparams = {"x": spec}
    if spec in ("angle-sine", "angle-cosine"):
        # sine/cosine convention needs bounds of width pi
        reparams = {"y": spec}
    p = _make_proposal(model, reparams, tmp_path, rng)
    x = model.new_point(N=32)
    x_prime, _ = p.rescale(x)
    x_back, _ = p.inverse_rescale(x_prime)
    name = list(reparams)[0]
    np.testing.assert_allclose(
        np.sort(np.mod(np.asarray(x_back[name])[: len(x)], 2 * np.pi)),
        np.sort(np.mod(np.asarray(x[name]), 2 * np.pi)),
        atol=1e-6,
    )


def test_angle_pair_spec(tmp_path, rng):
    class SkyModel(Model):
        names = ["ra", "dec", "q"]
        bounds = {
            "ra": [0.0, 2 * np.pi],
            "dec": [-np.pi / 2, np.pi / 2],
            "q": [-1.0, 1.0],
        }

        def log_prior(self, x):
            lp = np.log(self.in_bounds(x), dtype=float)
            for n in self.names:
                lp -= np.log(np.ptp(self.bounds[n]))
            return lp

        def log_likelihood(self, x):
            return np.zeros(len(np.atleast_1d(x)))

    model = SkyModel()
    model.set_rng(rng)
    p = _make_proposal(
        model,
        {
            "sky": {
                "reparameterisation": "angle-pair",
                "parameters": ["ra", "dec"],
            }
        },
        tmp_path,
        rng,
    )
    x = model.new_point(N=32)
    x_prime, _ = p.rescale(x)
    x_back, _ = p.inverse_rescale(x_prime)
    np.testing.assert_allclose(
        np.asarray(x_back["ra"])[: len(x)],
        np.asarray(x["ra"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(x_back["dec"])[: len(x)],
        np.asarray(x["dec"]),
        atol=1e-6,
    )


def test_dequantise_spec(tmp_path, rng):
    class DiscreteModel(BoxModel):
        def __init__(self):
            super().__init__(bounds={"x": [-5.0, 5.0], "y": [0.0, 10.0]})

        def log_likelihood(self, x):
            x = np.atleast_1d(x)
            return -0.5 * (x["x"] ** 2 + (np.round(x["y"]) - 5) ** 2)

        def new_point(self, N=1):
            # y is genuinely discrete (integer-valued), as dequantise
            # requires for an invertible round trip
            x = super().new_point(N=N)
            x["y"] = np.floor(x["y"])
            return x

        def new_point_log_prob(self, x):
            return super().new_point_log_prob(x)

    model = DiscreteModel()
    model.set_rng(rng)
    p = _make_proposal(
        model, {"y": "dequantise", "x": "default"}, tmp_path, rng
    )
    x = model.new_point(N=32)
    x_prime, _ = p.rescale(x)
    x_back, _ = p.inverse_rescale(x_prime)
    # dequantise floors on the way back
    np.testing.assert_array_equal(
        np.asarray(x_back["y"])[: len(x)], np.asarray(x["y"])
    )


def test_log_rescale_spec(tmp_path, rng):
    model = BoxModel(bounds={"x": [1e-3, 1e3], "y": [0.1, 10.0]})
    model.set_rng(rng)
    p = _make_proposal(
        model, {"x": "log-rescale", "y": "log-rescale"}, tmp_path, rng
    )
    x = model.new_point(N=32)
    x_prime, _ = p.rescale(x)
    x_back, _ = p.inverse_rescale(x_prime)
    for n in model.names:
        np.testing.assert_allclose(
            np.asarray(x_back[n])[: len(x)],
            np.asarray(x[n]),
            rtol=1e-6,
        )


def test_mixed_specs_end_to_end(tmp_path, rng):
    """Different reparameterisations per parameter, trained and
    populated end-to-end."""
    model = AngleModel()
    model.set_rng(rng)
    p = _make_proposal(
        model,
        {"x": "angle-2pi", "y": "default"},
        tmp_path,
        rng,
    )
    data = model.new_point(N=100)
    data["logL"] = model.batch_evaluate_log_likelihood(data)
    p.train(data)
    worst = data[np.argsort(data["logL"])][0]
    p.populate(worst, n_samples=30)
    assert p.populated
    assert model.in_bounds(p.samples).all()


def test_unknown_spec_raises(tmp_path, rng):
    model = BoxModel()
    model.set_rng(rng)
    with pytest.raises(Exception):
        _make_proposal(model, {"x": "not-a-reparam"}, tmp_path, rng)
