"""Deep tests for CombinedReparameterisation and the dependency sort.

Mirrors the reference's ``tests/test_reparameterisations/
test_combined.py`` (442 LoC): ordering, requirements checking,
aggregate update/reset/priors, forward/inverse composition and the
reverse-order mode.
"""

import numpy as np
import pytest

from nessai_tpu.livepoint import empty_structured_array
from nessai_tpu.reparameterisations import get_reparameterisation
from nessai_tpu.reparameterisations.base import Reparameterisation
from nessai_tpu.reparameterisations.combined import CombinedReparameterisation
from nessai_tpu.utils.sorting import sort_reparameterisations


def _make(name, parameters, bounds=None, cls="default", **kwargs):
    rcls, default_kwargs = get_reparameterisation(cls)
    default_kwargs.update(kwargs)
    if bounds is None:
        bounds = {p: [-1.0, 1.0] for p in parameters}
    return rcls(
        parameters=parameters, prior_bounds=bounds, **default_kwargs
    )


@pytest.fixture()
def combined():
    c = CombinedReparameterisation()
    c.add_reparameterisations(
        [_make("r0", ["a"]), _make("r1", ["b"])]
    )
    return c


class TestConstruction:
    def test_parameters_aggregated(self, combined):
        assert set(combined.parameters) == {"a", "b"}
        assert len(combined.prime_parameters) == 2

    def test_add_single_instance(self):
        c = CombinedReparameterisation()
        c.add_reparameterisation(_make("r0", ["a"]))
        assert "a" in c.parameters

    def test_one_to_one_property(self, combined):
        assert combined.one_to_one is True

    def test_has_prime_prior_all_false(self, combined):
        # default rescale-to-bounds has no closed-form prime prior
        assert isinstance(combined.has_prime_prior, bool)


class TestOrdering:
    def test_requires_satisfied_by_earlier(self):
        """A reparameterisation requiring another's output must be
        sorted after it (the sort requeues until satisfied)."""

        class Requires(Reparameterisation):
            requires = ["x_prime_0"]

            def reparameterise(self, x, x_prime, log_j, **kwargs):
                return x, x_prime, log_j

            def inverse_reparameterise(self, x, x_prime, log_j, **kwargs):
                return x, x_prime, log_j

        first = _make("first", ["x"], bounds={"x": [0, 1]})
        first.prime_parameters = ["x_prime_0"]
        second = Requires(
            parameters=["y"], prior_bounds={"y": [0, 1]}
        )
        out = sort_reparameterisations([second, first])
        assert out[0] is first
        assert out[1] is second

    def test_unsatisfiable_requirement_raises(self):
        class Requires(Reparameterisation):
            requires = ["not_produced"]

            def reparameterise(self, x, x_prime, log_j, **kwargs):
                return x, x_prime, log_j

            def inverse_reparameterise(self, x, x_prime, log_j, **kwargs):
                return x, x_prime, log_j

        r = Requires(parameters=["y"], prior_bounds={"y": [0, 1]})
        with pytest.raises(Exception):
            CombinedReparameterisation([r])

    def test_reverse_order(self):
        c = CombinedReparameterisation(
            [_make("r0", ["a"]), _make("r1", ["b"])], reverse_order=True
        )
        order = [r.name for r in c._order()]
        assert order == list(reversed(list(c.keys())))


class TestApplication:
    @staticmethod
    def _arrays(combined, rng, n=32):
        x = empty_structured_array(n, names=combined.parameters)
        for p in combined.parameters:
            x[p] = rng.uniform(-1, 1, n)
        x_prime = empty_structured_array(
            n, names=combined.prime_parameters
        )
        return x, x_prime, np.zeros(n)

    def test_roundtrip(self, combined, rng):
        x, x_prime, log_j = self._arrays(combined, rng)
        combined.update(x)
        x1, x_prime1, log_j1 = combined.reparameterise(
            x.copy(), x_prime.copy(), log_j.copy()
        )
        x2 = empty_structured_array(len(x1), names=combined.parameters)
        x_back, _, log_j2 = combined.inverse_reparameterise(
            x2, x_prime1.copy(), np.zeros(len(x1))
        )
        for p in combined.parameters:
            np.testing.assert_allclose(x_back[p], x[p], atol=1e-10)
        np.testing.assert_allclose(log_j1 + log_j2, 0.0, atol=1e-10)

    def test_update_and_reset(self, combined, rng):
        x, _, _ = self._arrays(combined, rng)
        combined.update(x)
        combined.reset()

    def test_update_bounds_alias(self, combined):
        assert combined.update_bounds == combined.update

    def test_log_prior_no_aux(self, combined, rng):
        x, _, _ = self._arrays(combined, rng)
        assert combined.log_prior(x) == 0.0

    def test_aux_parameters_empty(self, combined):
        assert combined.auxiliary_parameters == []


class TestWithAngles:
    def test_angle_and_rescale_combination(self, rng):
        """An angle reparameterisation (auxiliary radius, has_prior) and
        a rescale combine: aggregate log_prior includes the chi prior."""
        angle_cls, angle_kwargs = get_reparameterisation("angle-2pi")
        angle = angle_cls(
            parameters=["phi"],
            prior_bounds={"phi": [0, 2 * np.pi]},
            **angle_kwargs,
        )
        resc = _make("r", ["a"])
        c = CombinedReparameterisation([resc, angle])
        n = 16
        names = list(c.parameters) + list(c.auxiliary_parameters)
        x = empty_structured_array(n, names=names)
        x["a"] = rng.uniform(-1, 1, n)
        x["phi"] = rng.uniform(0, 2 * np.pi, n)
        x_prime = empty_structured_array(n, names=c.prime_parameters)
        c.update(x)
        x1, xp1, lj1 = c.reparameterise(
            x.copy(), x_prime.copy(), np.zeros(n)
        )
        x2 = empty_structured_array(n, names=names)
        x_back, _, lj2 = c.inverse_reparameterise(
            x2, xp1.copy(), np.zeros(n)
        )
        # the angle reparameterisation introduces a radial auxiliary
        # whose chi prior contributes to the aggregate log_prior (the
        # radial is recovered by the inverse pass)
        assert c.auxiliary_parameters == ["phi_radial"]
        lp = c.log_prior(x_back)
        assert np.isfinite(lp).all()
        assert not np.allclose(lp, 0.0)
        np.testing.assert_allclose(
            np.mod(x_back["phi"], 2 * np.pi),
            np.mod(x["phi"], 2 * np.pi),
            atol=1e-8,
        )
        np.testing.assert_allclose(x_back["a"], x["a"], atol=1e-10)
