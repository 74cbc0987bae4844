"""IO helpers: JSON encoding, atomic dumps, HDF5.

Reference: ``nessai/utils/io.py``.
"""

import json
import os
import pickle
import shutil
from typing import Any

import numpy as np

__all__ = [
    "NessaiJSONEncoder",
    "is_jsonable",
    "safe_file_dump",
    "save_to_json",
    "save_dict_to_hdf5",
    "add_dict_to_hdf5_file",
    "encode_for_hdf5",
]


def is_jsonable(x: Any) -> bool:
    """Reference: ``nessai/utils/io.py:24``."""
    try:
        json.dumps(x)
        return True
    except (TypeError, OverflowError):
        return False


class NessaiJSONEncoder(json.JSONEncoder):
    """JSON encoder handling numpy/jax scalars and arrays.

    Reference: ``nessai/utils/io.py:40``.
    """

    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if hasattr(obj, "tolist"):  # jax arrays
            return obj.tolist()
        if callable(obj) or isinstance(obj, type):
            return str(obj)
        if not is_jsonable(obj):
            return str(obj)
        return super().default(obj)


def safe_file_dump(data, filename, module=pickle, save_existing: bool = False):
    """Atomically dump ``data`` to ``filename`` (tmp + rename); optionally
    rotate an existing file to ``<filename>.old``.

    Reference: ``nessai/utils/io.py:90``.
    """
    filename = str(filename)
    if save_existing and os.path.exists(filename):
        shutil.move(filename, filename + ".old")
    tmp = filename + ".temp"
    with open(tmp, "wb") as f:
        module.dump(data, f)
    shutil.move(tmp, filename)


def save_to_json(d: dict, filename, **kwargs) -> None:
    """Reference: ``nessai/utils/io.py:130``."""
    kwargs.setdefault("indent", 4)
    kwargs.setdefault("cls", NessaiJSONEncoder)
    with open(filename, "w") as f:
        json.dump(d, f, **kwargs)


def encode_for_hdf5(key, value):
    """Reference: ``nessai/utils/io.py:140``."""
    if value is None:
        return "__none__"
    if isinstance(value, (int, float, str, bytes, np.ndarray, np.generic)):
        return value
    if isinstance(value, (list, tuple)):
        arr = np.asarray(value)
        if arr.dtype.kind in "ifub":
            return arr
        return str(value)
    if hasattr(value, "tolist"):
        return np.asarray(value)
    return str(value)


def add_dict_to_hdf5_file(hdf5_file, path: str, d: dict) -> None:
    """Recursively write a dict into an open h5py file.

    Reference: ``nessai/utils/io.py:160``.
    """
    for key, value in d.items():
        full = path + str(key)
        if isinstance(value, dict):
            hdf5_file.create_group(full)
            add_dict_to_hdf5_file(hdf5_file, full + "/", value)
        else:
            try:
                hdf5_file[full] = encode_for_hdf5(key, value)
            except TypeError:
                hdf5_file[full] = str(value)


def save_dict_to_hdf5(d: dict, filename) -> None:
    """Reference: ``nessai/utils/io.py:150``."""
    import h5py

    with h5py.File(filename, "w") as f:
        add_dict_to_hdf5_file(f, "/", d)


def save_live_points(live_points, filename) -> None:
    """Save live points to JSON (as a dict of arrays). Reference:
    ``nessai/utils/io.py:116``."""
    import json

    from ..livepoint import live_points_to_dict

    d = live_points_to_dict(live_points)
    with open(filename, "w") as wf:
        json.dump(d, wf, indent=4, cls=NessaiJSONEncoder)
