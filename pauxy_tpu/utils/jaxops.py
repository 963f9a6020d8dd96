"""Backend-safe control-flow wrappers.

The axon TPU backend mishandles ``lax.scan`` when complex buffers (and some
op combinations) cross the loop boundary: the loop executes but output
buffers become untransferable and the client's transfer engine wedges.
``fori_loop`` has shown no such failures. ``scan`` here is a drop-in
``lax.scan``:

* on CPU it is a plain ``lax.scan``;
* on accelerators it lowers to a ``fori_loop`` whose carries and stacked
  outputs are *real-split* (complex leaves stored as stacked real/imag
  pairs), so no complex buffer is ever loop-carried.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_cplx(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating)


def _split(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.stack([x.real, x.imag]) if _is_cplx(x) else x, tree
    )


def _combine(template, tree, axis=0):
    def c(t, x):
        if _is_cplx(t):
            re = jnp.take(x, 0, axis=axis)
            im = jnp.take(x, 1, axis=axis)
            return (re + 1j * im).astype(t.dtype)
        return x

    return jax.tree_util.tree_map(c, template, tree)


def _use_plain_scan() -> bool:
    return jax.default_backend() == "cpu"


def scan(f, init, xs, length=None):
    """Drop-in lax.scan; see module docstring."""
    if _use_plain_scan():
        return jax.lax.scan(f, init, xs, length=length)

    if xs is not None:
        leaves = jax.tree_util.tree_leaves(xs)
        n = leaves[0].shape[0]
    else:
        n = length

    # Shapes/dtypes of one slice of xs and of f's outputs.
    x0 = (
        jax.tree_util.tree_map(lambda a: a[0], xs) if xs is not None else None
    )
    carry_shape, y_shape = jax.eval_shape(f, init, x0)
    del carry_shape

    init_split = _split(init)
    xs_split = _split(xs) if xs is not None else None

    def alloc(t):
        if _is_cplx(t):
            rdt = jnp.zeros((), t.dtype).real.dtype
            return jnp.zeros((n, 2) + tuple(t.shape), rdt)
        return jnp.zeros((n,) + tuple(t.shape), t.dtype)

    ys_bufs = jax.tree_util.tree_map(alloc, y_shape)

    def body(i, carry):
        c_split, ys_bufs = carry
        c = _combine(init, c_split)
        if xs is not None:
            def pick(t_full, x_s):
                # complex leaves were split to [2, n, ...]
                if _is_cplx(t_full):
                    return (x_s[0, i] + 1j * x_s[1, i]).astype(t_full.dtype)
                return x_s[i]

            x = jax.tree_util.tree_map(pick, xs, xs_split)
        else:
            x = None
        c_new, y = f(c, x)

        def store(t, buf, val):
            if _is_cplx(t):
                return buf.at[i].set(jnp.stack([val.real, val.imag]))
            return buf.at[i].set(val)

        ys_bufs = jax.tree_util.tree_map(store, y_shape, ys_bufs, y)
        return _split(c_new), ys_bufs

    final_split, ys_bufs = jax.lax.fori_loop(0, n, body, (init_split, ys_bufs))
    final = _combine(init, final_split)
    ys = _combine(y_shape, ys_bufs, axis=1)
    return final, ys
