"""Cross-checks for the evidence 'truth' machinery used by the
benchmark studies (``benchmarks/hard_likelihoods.py``): the transfer
integral must agree with direct quadrature where the latter is
feasible."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "benchmarks")
)


def test_transfer_matches_quadrature_2d():
    from hard_likelihoods import quad_logz_2d, transfer_logz_rosenbrock

    def rb_ll(p):
        return -(
            100.0 * (p[..., 1] - p[..., 0] ** 2) ** 2
            + (1.0 - p[..., 0]) ** 2
        )

    direct = quad_logz_2d(rb_ll, -5.0, 5.0, n=2048)
    transfer = transfer_logz_rosenbrock(2, n=2048)
    np.testing.assert_allclose(transfer, direct, rtol=0, atol=1e-8)


def test_transfer_grid_convergence():
    from hard_likelihoods import transfer_logz_rosenbrock

    a = transfer_logz_rosenbrock(5, n=1024)
    b = transfer_logz_rosenbrock(5, n=2048)
    assert abs(a - b) < 1e-6
    # the recorded truth used in VALIDATION.md
    np.testing.assert_allclose(b, -19.7324287, atol=1e-6)


def test_eggbox_quadrature_value():
    from hard_likelihoods import quad_logz_2d

    z = quad_logz_2d(
        lambda p: (2.0 + np.prod(np.cos(p / 2.0), axis=-1)) ** 5.0,
        0.0,
        10 * np.pi,
        n=1024,
    )
    # VALIDATION.md records 235.856 from the n=4096 grid
    np.testing.assert_allclose(z, 235.856, atol=5e-3)
