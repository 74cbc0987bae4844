#!/usr/bin/env python
"""GW example with a *non-JAX* likelihood via ``jax.pure_callback``.

Real GW likelihoods usually call lalsuite (C extensions) and cannot be
traced by JAX. Setting ``likelihood_callback = True`` wraps the host
``log_likelihood`` with ``jax.pure_callback`` so it still runs *inside*
the fused populate device program (flow inverse -> de-rescaling ->
bounds -> likelihood in one call) instead of forcing a host round-trip
per stage — the SURVEY §7 escape hatch, standing in for the reference's
lalsuite examples (``examples/gw/full_gw_example.py``).

The waveform here is computed with numpy only (pretend it is lalsuite).
"""

import numpy as np

from nessai_tpu.flowsampler import FlowSampler
from nessai_tpu.model import Model
from nessai_tpu.utils import configure_logger

from basic_gw_example import DATA, DF, PSD, _waveform, freqs

output = "./outdir/callback_gw_example/"
if __name__ == "__main__":
    logger = configure_logger(output=output)


class LalStyleGWModel(Model):
    """Same Whittle likelihood as :class:`BasicGWModel`, but host-only
    (vectorised numpy standing in for a lalsuite call) + pure_callback."""

    #: run the host likelihood inside jitted device programs
    likelihood_callback = True
    #: the numpy implementation below is vectorised over the batch
    allow_vectorised = True

    def __init__(self):
        self.names = [
            "chirp_mass",
            "luminosity_distance",
            "phase",
            "geocent_time",
        ]
        self.bounds = {
            "chirp_mass": [20.0, 40.0],
            "luminosity_distance": [100.0, 1000.0],
            "phase": [0.0, 2 * np.pi],
            "geocent_time": [-0.1, 0.1],
        }

    def log_prior(self, x):
        log_p = np.log(self.in_bounds(x), dtype="float")
        for n in self.names:
            log_p -= np.log(np.ptp(self.bounds[n]))
        return log_p

    def log_likelihood(self, x):
        x = np.atleast_1d(x)
        mc = np.asarray(x["chirp_mass"], float)[:, None]
        dl = np.asarray(x["luminosity_distance"], float)[:, None]
        phase = np.asarray(x["phase"], float)[:, None]
        tc = np.asarray(x["geocent_time"], float)[:, None]
        h = _waveform(freqs[None, :], mc, dl, phase, tc, xp=np)
        r = DATA[None, :, :] - h[:, None, :]
        return -2.0 * DF * np.sum(
            np.abs(r) ** 2 / PSD[None, None, :], axis=(-2, -1)
        )


if __name__ == "__main__":
    # NB: default (zscore) reparameterisations keep the fused populate
    # path available — an angle reparameterisation would add prime
    # dimensions and fall back to the staged populate.
    fs = FlowSampler(
        LalStyleGWModel(),
        output=output,
        resume=False,
        seed=170817,
        nlive=1000,
    )
    fs.run()
