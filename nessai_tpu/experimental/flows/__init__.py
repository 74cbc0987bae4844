"""Experimental flow wrappers.

The reference's ``GlasflowWrapper`` (``nessai/experimental/flows/
glasflow.py:13``) adapts external glasflow architectures via
``ftype='glasflow-realnvp'`` etc. In nessai_tpu those names resolve to the
native builders directly (see ``nessai_tpu/flows/utils.py``), so no
wrapper class is required; this module re-exports the registry hook for
API parity.
"""

from ...flows.utils import get_native_flow_class

__all__ = ["get_native_flow_class"]
