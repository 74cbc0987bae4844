"""Batched device→host transfers.

``np.asarray`` on a jax array blocks for one device→host roundtrip per
call. On this target a roundtrip costs ~15 ms through the TPU tunnel,
so fetching a parameter pytree leaf-by-leaf (~100 leaves) costs ~1.6 s
— measured as the dominant cost of ``FlowModel.save_weights`` inside
the sampling loop. Starting asynchronous copies for *every* leaf first
overlaps the transfers into roughly a single roundtrip.
"""

import numpy as np

__all__ = ["tree_to_host", "arrays_to_host"]


def _start_async_copy(leaf) -> None:
    try:
        leaf.copy_to_host_async()
    except AttributeError:
        pass


def tree_to_host(tree):
    """Fetch every array leaf of a pytree to host numpy, transfers
    overlapped."""
    import jax

    for leaf in jax.tree.leaves(tree):
        _start_async_copy(leaf)
    return jax.tree.map(np.asarray, tree)


def arrays_to_host(*arrays):
    """Fetch several device arrays to host numpy, transfers overlapped.

    Returns a tuple of numpy arrays (``None`` entries pass through).
    """
    for a in arrays:
        if a is not None:
            _start_async_copy(a)
    return tuple(None if a is None else np.asarray(a) for a in arrays)
