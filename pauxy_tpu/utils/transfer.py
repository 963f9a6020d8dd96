"""Device <-> host transfer helpers.

The axon TPU backend cannot transfer complex buffers device->host
(UNIMPLEMENTED), although complex *compute* works. ``to_host`` fetches the
real and imaginary parts separately (two supported real transfers) and
recombines on the host. Use it for every host-side read of possibly-complex
device data (block accumulators, trial tables, debugging).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    if isinstance(x, jax.Array) and jnp.iscomplexobj(x):
        # jnp.stack forces a fresh real buffer; a bare ``x.real`` can alias
        # the complex buffer as a strided view, which the backend also
        # refuses to transfer.
        ri = np.asarray(jnp.stack([jnp.real(x), jnp.imag(x)]))
        return ri[0] + 1j * ri[1]
    if isinstance(x, jax.Array):
        return np.asarray(x)
    return x


def to_host(tree):
    """device_get a pytree, splitting complex leaves into real transfers."""
    return jax.tree_util.tree_map(_fetch, tree)


@jax.jit
def _combine(re, im):
    return re + 1j * im


def _upload(x):
    if isinstance(x, jax.Array):
        return x
    x = np.asarray(x)
    if np.iscomplexobj(x):
        # Complex host->device transfers are also UNIMPLEMENTED (and poison
        # every downstream buffer); ship real/imag separately and combine
        # on device.
        re = jnp.asarray(np.ascontiguousarray(x.real))
        im = jnp.asarray(np.ascontiguousarray(x.imag))
        return _combine(re, im)
    return jnp.asarray(x)


def to_device(tree):
    """jnp.asarray a pytree, splitting complex leaves into real transfers."""
    return jax.tree_util.tree_map(_upload, tree)


import functools


@functools.partial(jax.jit, static_argnames=("dtype",))
def _fill_scalar(re, im, dtype):
    return (re + 1j * im).astype(dtype)


def device_scalar(value, dtype):
    """Complex-safe scalar upload (see device_zeros): ships the real/imag
    parts as real scalars at the target dtype's real precision (so float64
    targets keep full precision) and combines under jit."""
    value = complex(value)
    rdtype = np.zeros((), dtype).real.dtype
    return _fill_scalar(
        jnp.asarray(value.real, rdtype),
        jnp.asarray(value.imag, rdtype),
        dtype,
    )


@functools.partial(jax.jit, static_argnames=("shape", "dtype"))
def device_zeros(shape, dtype):
    """Complex-safe zeros: an *eager* ``jnp.zeros(..., complex)`` poisons its
    buffer on the axon backend (eager complex fill is UNIMPLEMENTED and the
    error only surfaces when the buffer is consumed). Jitting the fill makes
    it a compiled XLA program, which the backend handles."""
    return jnp.zeros(shape, dtype)


class StaticArray:
    """Content-hashed numpy wrapper for STATIC (non-pytree) array fields of
    flax structs. jit caches compare static metadata with ``==`` and
    ``hash``; a bare ndarray raises ("truth value of an array ...") the
    moment a second, different instance of the struct reaches the same jit.
    Supports ``np.asarray(x)`` and ``.shape`` for host consumers."""

    __slots__ = ("arr", "_hash")

    def __init__(self, arr):
        self.arr = np.ascontiguousarray(arr)
        self.arr.setflags(write=False)
        self._hash = hash((self.arr.shape, self.arr.dtype.str,
                           self.arr.tobytes()))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        if isinstance(other, StaticArray):
            other = other.arr
        return (
            isinstance(other, np.ndarray)
            and self.arr.shape == other.shape
            and bool(np.array_equal(self.arr, other))
        )

    def __array__(self, dtype=None, copy=None):
        return self.arr if dtype is None else self.arr.astype(dtype)

    def __getitem__(self, ix):
        return self.arr[ix]

    @property
    def shape(self):
        return self.arr.shape

    def __len__(self):
        return len(self.arr)


class HostArray:
    """Identity-hashable wrapper letting host-only numpy data ride a flax
    struct as a STATIC (non-pytree) field — it is never uploaded to device.
    Needed because the backend cannot transfer complex buffers and jit
    commits every pytree leaf of its arguments."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
