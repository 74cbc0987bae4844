"""nessai-tpu: TPU-native nested sampling with normalising flows.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``mj-will/nessai`` (nested sampling with artificial intelligence): a
standard nested sampler and an importance nested sampler whose proposal
distributions are normalising flows trained on the current live points.

The compute path (flows, training, latent sampling, rejection weights) is
pure JAX — jitted, vmapped, and shardable over a TPU mesh — while the
control plane (the nested-sampling loop, checkpointing, plotting) runs on
the host over NumPy structured arrays, matching the reference API.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import nessai_tpu` light.
    if name == "FlowSampler":
        from .flowsampler import FlowSampler

        return FlowSampler
    if name == "Model":
        from .model import Model

        return Model
    raise AttributeError(f"module 'nessai_tpu' has no attribute {name!r}")
