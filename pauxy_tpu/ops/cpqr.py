"""Batched column-pivoted Householder QR (complex), in pure jax.

The finite-temperature stabilized propagator products (QDT stratification,
``pauxy/walkers/thermal.py:472-545`` and ``pauxy/estimators/
thermal.py:147-196``) are built on scipy's column-pivoted QR. Neither
LAPACK-style pivoted QR nor even complex QR exists on the TPU backend, so
this module implements it directly: a ``fori_loop`` over columns doing
masked rank-1 Householder updates, batched over walkers/spins. O(m)
sequential steps of O(batch * m^2) VPU work — the batch axis keeps the
chip busy.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _use_lanes(a: jax.Array, pivot: bool) -> bool:
    """Route to the VMEM lanes kernel (ops/cpqr_pallas.py) when it is
    legal AND profitable: pivoted, batched, m <= CPQR_AUTO_MAX_M,
    single-precision, on a real TPU backend. Chip-probed 2026-08-20
    (tools/axon/probe_cpqr.py, two tunnel windows): the lanes kernel
    wins 1.09-1.20x at [256,16,16] and 1.11-1.55x at [128,48,48], is
    neutral-to-losing at m=64, and fails Mosaic compilation at m >= 80
    — so the auto cap is 48. Opt out with
    PAUXY_TPU_CPQR=xla; force with =lanes (e.g. interpret-mode tests use
    the explicit impl= argument instead)."""
    from pauxy_tpu.ops.cpqr_pallas import CPQR_AUTO_MAX_M

    mode = os.environ.get("PAUXY_TPU_CPQR", "auto")
    if mode == "xla":
        return False
    if mode != "lanes":
        try:
            if jax.default_backend() == "cpu":
                return False
        except RuntimeError:
            return False
    return (
        pivot
        and a.ndim >= 3
        and a.shape[-1] <= CPQR_AUTO_MAX_M
        and a.dtype in (jnp.complex64, jnp.float32)
    )


def cpqr(a: jax.Array, pivot: bool = True, impl: str | None = None):
    """Column-pivoted QR: A[..., :, perm] = Q R.

    Returns (q, r, perm) with q unitary [..., m, m], r upper triangular,
    perm [..., m] int32 such that a[..., :, perm] = q @ r (i.e. column j of
    the pivoted A is original column perm[j] — scipy.linalg.qr(pivoting=True)
    convention).

    ``impl``: None (auto: lanes kernel on TPU when legal, else the XLA
    fori_loop below), 'xla', 'lanes', or 'lanes_interpret'.
    """
    if impl is None:
        impl = "lanes" if _use_lanes(a, pivot) else "xla"
    if impl.startswith("lanes"):
        from pauxy_tpu.ops.cpqr_pallas import cpqr_lanes

        *batch, mrow, m = a.shape
        flat = a.reshape((-1, mrow, m))
        q, r, perm = cpqr_lanes(flat, interpret=impl == "lanes_interpret")
        if not jnp.iscomplexobj(a):
            # Real input -> real factorization (the kernel's imaginary
            # planes are identically zero); keep the caller's dtype.
            q, r = q.real.astype(a.dtype), r.real.astype(a.dtype)
        return (
            q.reshape(a.shape),
            r.reshape(a.shape),
            perm.reshape((*batch, m)),
        )
    return _cpqr_xla(a, pivot)


def _cpqr_xla(a: jax.Array, pivot: bool = True):
    """Pure-XLA fori_loop implementation (all backends, any precision)."""
    *batch, mrow, m = a.shape
    assert mrow == m, "square matrices only"
    cdtype = a.dtype
    rdtype = jnp.zeros((), cdtype).real.dtype
    rows = jnp.arange(m)

    r0 = a
    q0 = jnp.broadcast_to(jnp.eye(m, dtype=cdtype), a.shape)
    perm0 = jnp.broadcast_to(rows, (*batch, m))

    def body(k, carry):
        r, q, perm = carry
        active_row = (rows >= k)                           # [m]

        if pivot:
            # Most-significant remaining column (partial column norms).
            norms = jnp.sum(
                jnp.abs(r) ** 2 * active_row[..., :, None].astype(rdtype),
                axis=-2,
            )
            norms = jnp.where(active_row, norms, -1.0)
            p = jnp.argmax(norms, axis=-1)                 # [...]
            # Swap columns k <-> p (batched index permutation).
            pb = p[..., None]
            colidx = jnp.where(
                rows == k, pb, jnp.where(rows == pb, k, rows)
            )                                              # [..., m]
            r = jnp.take_along_axis(r, colidx[..., None, :], axis=-1)
            perm = jnp.take_along_axis(perm, colidx, axis=-1)

        # Householder vector for column k (rows >= k).
        x = r[..., :, k] * active_row.astype(rdtype)       # [..., m]
        normx = jnp.sqrt(jnp.sum(jnp.abs(x) ** 2, axis=-1))
        x0 = r[..., k, k]
        absx0 = jnp.abs(x0)
        phase = jnp.where(absx0 > 0, x0 / jnp.where(absx0 > 0, absx0, 1.0), 1.0)
        alpha = -phase * normx.astype(cdtype)
        v = x - alpha[..., None] * (rows == k).astype(cdtype)
        vsq = jnp.sum(jnp.abs(v) ** 2, axis=-1)
        ok = vsq > 1e-300
        inv = jnp.where(ok, 2.0 / jnp.where(ok, vsq, 1.0), 0.0).astype(cdtype)
        # r <- r - v (v^dag r) * 2/|v|^2 ;   q <- q - (q v) v^dag * 2/|v|^2
        w = jnp.einsum("...m,...mn->...n", v.conj(), r) * inv[..., None]
        r = r - v[..., :, None] * w[..., None, :]
        u = jnp.einsum("...mn,...n->...m", q, v) * inv[..., None]
        q = q - u[..., :, None] * v.conj()[..., None, :]
        return r, q, perm

    r, q, perm = jax.lax.fori_loop(0, m, body, (r0, q0, perm0))
    # Clean numerical noise below the diagonal.
    tri = (rows[:, None] <= rows[None, :]).astype(cdtype)
    return q, r * tri, perm.astype(jnp.int32)


def unpermute_columns(t: jax.Array, perm: jax.Array) -> jax.Array:
    """Given T acting on pivoted columns, return T' with T'[:, perm[j]] =
    T[:, j] (undo the pivoting; thermal.py:160-162)."""
    inv = jnp.argsort(perm, axis=-1)
    return jnp.take_along_axis(t, inv[..., None, :], axis=-1)
