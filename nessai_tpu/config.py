"""Global configuration for nessai-tpu.

Mirrors the role of the reference's global config dataclasses
(``nessai/config.py:22-165``) but adds TPU/JAX-specific knobs (device dtype,
default mesh axis names).

The singletons at the bottom are mutable at runtime, exactly like the
reference: e.g. the importance sampler registers extra live-point fields by
mutating ``livepoints.extra_parameters``.
"""

from dataclasses import asdict as _dc_asdict, dataclass, field
from typing import List

import numpy as np

__all__ = ["livepoints", "plotting", "general", "compute"]


class _BaseConfig:
    """Shared base: ``asdict()`` parity with the reference
    (``nessai/config.py:13-18``)."""

    def asdict(self):
        """Return the config as a dictionary."""
        return _dc_asdict(self)


@dataclass
class LivepointsConfig(_BaseConfig):
    """Configuration for live-point structured arrays.

    Reference: ``nessai/config.py:22-115``.
    """

    #: Fields every live point carries besides the model parameters.
    core_parameters: List[str] = field(
        default_factory=lambda: ["logP", "logL", "it"]
    )
    #: dtypes for the core parameters.
    core_parameters_dtype: List[str] = field(
        default_factory=lambda: ["f8", "f8", "i4"]
    )
    #: Default values for the core parameters in new points.
    core_parameters_defaults: tuple = (np.nan, np.nan, 0)
    #: Extra fields (e.g. INS adds logW, logQ, logU at runtime).
    extra_parameters: List[str] = field(default_factory=list)
    extra_parameters_dtype: List[str] = field(default_factory=list)
    extra_parameters_defaults: tuple = ()
    #: Default dtype for the sampled parameters.
    default_float_dtype: str = "f8"
    #: Integer dtype for iteration field.
    it_dtype: str = "i4"

    @property
    def non_sampling_parameters(self) -> List[str]:
        return self.core_parameters + self.extra_parameters

    @property
    def non_sampling_dtype(self) -> List[str]:
        return self.core_parameters_dtype + self.extra_parameters_dtype

    @property
    def non_sampling_defaults(self) -> tuple:
        return self.core_parameters_defaults + self.extra_parameters_defaults

    def reset(self) -> None:
        """Remove all extra parameters (used by tests and INS teardown)."""
        self.extra_parameters = []
        self.extra_parameters_dtype = []
        self.extra_parameters_defaults = ()


@dataclass
class PlottingConfig(_BaseConfig):
    """Plotting configuration. Reference: ``nessai/config.py:118-153``."""

    disable_style: bool = False
    sns_style: str = "ticks"
    base_colour: str = "#02979d"
    highlight_colour: str = "#f5b754"
    line_colours: List[str] = field(
        default_factory=lambda: ["#4575b4", "#d73027", "#fad117", "#ff8c00"]
    )
    line_styles: List[str] = field(
        default_factory=lambda: ["-", "--", ":", "-."]
    )
    max_figsize: float = 50.0
    #: minimum value data is clipped to for plotting (reference
    #: ``nessai/config.py:147``)
    clip_min: float = -1e10


@dataclass
class GeneralConfig(_BaseConfig):
    """General configuration. Reference: ``nessai/config.py:156-160``."""

    eps: float = 1e-8


@dataclass
class ComputeConfig(_BaseConfig):
    """TPU/JAX compute configuration (no reference analogue; replaces the
    torch ``device_tag``/``pytorch_threads`` plumbing,
    ``nessai/flowmodel/base.py:163-173``)."""

    #: dtype used for flow parameters and device compute.
    default_dtype: str = "float32"
    #: Name of the data-parallel mesh axis used by ``nessai_tpu.parallel``.
    data_axis: str = "data"
    #: Whether to jit host-facing flow ops (disable for debugging).
    jit: bool = True
    #: Use the Pallas TPU kernels (ops/) inside the bijectors. Only valid
    #: on TPU backends; leave False on CPU. Default False BY MEASUREMENT:
    #: at nested-sampling shapes (dims <= 32, batch <= 16k) the flow
    #: programs are dispatch-bound (~0.1 ms) and XLA matches Pallas
    #: within noise — see VALIDATION.md "XLA vs Pallas" (round 3).
    use_pallas: bool = False


livepoints = LivepointsConfig()
plotting = PlottingConfig()
general = GeneralConfig()
compute = ComputeConfig()
