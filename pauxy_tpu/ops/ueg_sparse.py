"""Sparse plane-wave density operators for the UEG.

The reference keeps the momentum-transfer operators rho_q as scipy sparse
matrices (``pauxy/systems/ueg.py:336-428``) — one nonzero per column:
rho_q[idx(k+q), k] = sqrt(pi / (vol q^2)). Round 1 stored them DENSE as
[nq, M, M], which is O(nq M^2) HBM and blows out a single chip at the basis
sizes the reference handles on CPU (nq grows ~8x faster than M with ecut).

This module is the TPU-sparse replacement:

* expectations <rho_q> / <rho_q^T> against a Green's function are masked
  gathers + reductions over the [nq, M] ``kpq`` index map — O(w nq M) work,
  no [nq, M, M] tensor;
* the VHS assembly sum_q c1_q rho_q + c2_q rho_q^T becomes a sorted
  segment-sum scatter over the (at most 2 nq M) nonzeros, chunked under
  ``lax.scan`` so the [w, chunk] coefficient intermediate stays bounded.

Both are exactly the reference's sparsity pattern; nothing is truncated.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SparseRho:
    """Scatter/gather metadata for {rho_q} (static shapes, built host-side).

    ``lin/sel/val`` describe the union of nonzeros of all rho_q and rho_q^T,
    sorted by flattened (row * M + col) position: entry n scatters
    coefficient ``c[sel[n]] * val[n]`` into VHS position ``lin[n]``, where
    ``c = concat([c1, c2])`` are the per-q coefficients of rho / rho^T.
    """

    lin: jax.Array       # [nnz] int32 flattened (row, col), ascending
    sel: jax.Array       # [nnz] int32 into concat([c1, c2]) (rho_q: q, rho_q^T: nq+q)
    val: jax.Array       # [nnz] real sqrt(pi / (vol q^2))
    kpq_idx: jax.Array   # [nq, M] int32 idx(k_i + q) (0 where invalid)
    kpq_fac: jax.Array   # [nq, M] real factor * mask
    nbasis: int = struct.field(pytree_node=False)
    nq: int = struct.field(pytree_node=False)

    @property
    def nnz(self) -> int:
        return self.lin.shape[0]


def make_sparse_rho(ham, real_dtype) -> SparseRho:
    """Build the sparse metadata from a UEG Hamiltonian's gather maps.

    ``ham`` needs ``kpq_idx/kpq_mask`` [nq, M], ``vqvec`` [nq] (= 4 pi/q^2)
    and ``vol``; factor = sqrt(pi/(vol q^2)) = sqrt(vqvec / (4 vol))
    (``pauxy/systems/ueg.py:336-358``).
    """
    kpq_idx = np.asarray(ham.kpq_idx)
    kpq_mask = np.asarray(ham.kpq_mask)
    nq, m = kpq_idx.shape
    factor = np.sqrt(np.asarray(ham.vqvec) / (4.0 * ham.vol))

    qi, ii = np.nonzero(kpq_mask)
    rows = kpq_idx[qi, ii]
    # rho_q contribution at (row, i) with coefficient c1[q]; rho_q^T at (i, row)
    # with coefficient c2[q].
    lin = np.concatenate([rows * m + ii, ii * m + rows])
    sel = np.concatenate([qi, nq + qi]).astype(np.int32)
    val = np.concatenate([factor[qi], factor[qi]]).astype(real_dtype)
    order = np.argsort(lin, kind="stable")
    return SparseRho(
        lin=jnp.asarray(lin[order].astype(np.int32)),
        sel=jnp.asarray(sel[order]),
        val=jnp.asarray(val[order]),
        kpq_idx=jnp.asarray(kpq_idx.astype(np.int32)),
        kpq_fac=jnp.asarray((factor[:, None] * kpq_mask).astype(real_dtype)),
        nbasis=int(m),
        nq=int(nq),
    )


def rho_expectations(sp: SparseRho, g: jax.Array):
    """(<rho_q>, <rho_q^T>) of g [w, M, M] as masked gathers, each [w, nq].

    t1[w,q] = sum_m g[w, idx(k_m + q), m] * fac,
    t2[w,q] = sum_p g[w, p, idx(k_p + q)] * fac.
    """
    cols = jnp.arange(sp.nbasis)[None, :]
    t1 = jnp.sum(g[:, sp.kpq_idx, cols] * sp.kpq_fac[None], axis=-1)
    t2 = jnp.sum(g[:, cols, sp.kpq_idx] * sp.kpq_fac[None], axis=-1)
    return t1, t2


def assemble_vhs(sp: SparseRho, c1: jax.Array, c2: jax.Array,
                 max_elems: int = 2 ** 26) -> jax.Array:
    """sum_q (c1[w,q] rho_q + c2[w,q] rho_q^T) as a dense [w, M, M] array.

    Sorted segment-sum over the nonzeros, chunked so the per-chunk
    coefficient gather [w, chunk] stays under ``max_elems`` elements. The
    result is dense because the VHS exponential consumes it as a matmul
    operand; only the *operator basis* storage is sparse.
    """
    w = c1.shape[0]
    m = sp.nbasis
    c = jnp.concatenate([c1, c2], axis=-1)                # [w, 2 nq]
    nnz = sp.nnz
    chunk = max(1, min(nnz, max_elems // max(w, 1)))
    nchunks = -(-nnz // chunk)
    pad = nchunks * chunk - nnz
    # Padding scatters value 0 into segment 0 — harmless.
    lin = jnp.pad(sp.lin, (0, pad)).reshape(nchunks, chunk)
    sel = jnp.pad(sp.sel, (0, pad)).reshape(nchunks, chunk)
    val = jnp.pad(sp.val, (0, pad)).reshape(nchunks, chunk)

    def body(acc, operand):
        lin_k, sel_k, val_k = operand
        vals = c[:, sel_k] * val_k                        # [w, chunk]
        part = jax.ops.segment_sum(
            vals.T, lin_k, num_segments=m * m, indices_are_sorted=True
        )                                                 # [m*m, w]
        return acc + part, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((m * m, w), c.dtype), (lin, sel, val)
    )
    return acc.T.reshape(w, m, m)
