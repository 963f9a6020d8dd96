"""HDF5 output + option lookup.

Output layout is compatible with the reference's estimator files
(``pauxy/estimators/utils.py:279-327`` H5EstimatorHelper and
``pauxy/estimators/handler.py:60-125``): one zero-padded dataset per block
under ``<group>/<name>/NNNNNNNNN``, a ``<group>/headers`` string array, and a
``metadata`` JSON blob — so the reference's pandas extraction/reblocking
tooling (``pauxy/analysis/extraction.py:14-33``) works unchanged on our
files.
"""

from __future__ import annotations

import json

import h5py
import numpy as np


def get_input_value(inputs: dict, key: str, default=None, alias=None, verbose=False):
    """Option lookup with aliases (``pauxy/utils/io.py:304-323``)."""
    val = inputs.get(key)
    if val is None and alias is not None:
        for a in alias:
            val = inputs.get(a)
            if val is not None:
                break
    if val is None:
        val = default
        if verbose and default is not None:
            print(f"# Note: {key} not specified. Setting to default value {default}.")
    return val


class H5EstimatorHelper:
    """Push one dataset per block under ``base/name/<zero-padded index>``."""

    def __init__(self, filename: str, base: str):
        self.filename = filename
        self.base = base
        self.index = 0
        self.nzero = 9

    def push(self, data, name: str):
        padded = str(self.index).zfill(self.nzero)
        with h5py.File(self.filename, "a") as fh5:
            fh5[f"{self.base}/{name}/{padded}"] = np.asarray(data)

    def increment(self):
        self.index += 1


def create_estimates_file(filename: str, headers, metadata: dict):
    """Create the output file with headers + metadata JSON."""
    with h5py.File(filename, "w") as fh5:
        fh5["basic/headers"] = np.array(headers).astype("S")
        fh5["metadata"] = json.dumps(metadata, default=_json_default)


def _json_default(obj):
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, complex):
        return [obj.real, obj.imag]
    return str(obj)


def format_fixed_width_floats(values) -> str:
    """Fixed width row formatting (``pauxy/utils/io.py:18-30`` analogue)."""
    return "".join(f"{float(np.real(v)): 16.8e} " for v in values)
