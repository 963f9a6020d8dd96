"""Walker checkpoint / restart.

Counterpart of the reference's parallel-HDF5 walker restart
(``pauxy/walkers/handler.py:144-157, 432-500``: per-walker [weight, phase,
ot, phi] datasets, ``write_freq``/``read_file`` options). Here the whole
walker pytree is one dense dump — and, unlike the reference, the RNG key,
step counter and energy shift are included, so a restart continues the
*same* stochastic stream (the reference's restart silently reseeds).
"""

from __future__ import annotations

import dataclasses

import h5py
import numpy as np
import jax

from pauxy_tpu.utils.transfer import to_host, to_device


def save_walkers(state, filename: str, *, key=None, step: int = 0,
                 eshift: float = 0.0, extra: dict | None = None):
    """Dump a walker-state pytree (zero-T or thermal) + driver scalars."""
    with h5py.File(filename, "w") as fh5:
        grp = fh5.create_group("walkers")
        for field in dataclasses.fields(state):
            val = getattr(state, field.name)
            if val is None:
                continue
            arr = to_host(val)
            if np.iscomplexobj(arr):
                grp[field.name + "__re"] = np.real(arr)
                grp[field.name + "__im"] = np.imag(arr)
            else:
                grp[field.name] = np.asarray(arr)
        fh5["state_class"] = type(state).__name__
        fh5["step"] = step
        fh5["eshift"] = complex(eshift).real
        if key is not None:
            fh5["rng_key"] = np.asarray(jax.random.key_data(key))
        if extra:
            for k, v in extra.items():
                fh5[f"extra/{k}"] = v


def load_walkers(template, filename: str):
    """Restore a walker state matching ``template``'s structure.

    Returns (state, info) with info = {'step', 'eshift', 'rng_key' or None}.
    """
    updates = {}
    with h5py.File(filename, "r") as fh5:
        grp = fh5["walkers"]
        for field in dataclasses.fields(template):
            name = field.name
            if name in grp:
                updates[name] = np.asarray(grp[name])
            elif name + "__re" in grp:
                updates[name] = (
                    np.asarray(grp[name + "__re"])
                    + 1j * np.asarray(grp[name + "__im"])
                )
        info = {
            "step": int(fh5["step"][()]),
            "eshift": float(fh5["eshift"][()]),
            "rng_key": None,
        }
        if "rng_key" in fh5:
            info["rng_key"] = jax.random.wrap_key_data(
                np.asarray(fh5["rng_key"])
            )
    # Cast to the template's dtypes and upload (split complex transfers).
    cast = {}
    for name, arr in updates.items():
        t = getattr(template, name)
        cast[name] = to_device(np.asarray(arr).astype(t.dtype))
    return template.replace(**cast), info
