"""Complex linear algebra built from real decompositions + matmuls.

The TPU backend implements real QR/LU/Cholesky/solve but NOT their complex
counterparts (complex matmul and elementwise ops are fine). AFQMC is
irreducibly complex-valued — overlaps carry a phase that the phaseless
constraint projects on — so the three hot decompositions are provided here
in TPU-runnable form:

* :func:`solve`    — complex solve via the real 2n block embedding
  iota(A+iB) = [[A, -B], [B, A]] (iota is a ring homomorphism, so
  iota(S)^-1 iota(Y) = iota(S^-1 Y)).
* :func:`cholesky` / :func:`cholesky_qr` — complex Cholesky via the
  *interleaved* embedding (real/imag per index), under which the embedding
  of a lower-triangular complex matrix with real diagonal IS real
  lower-triangular, so chol(embed(S)) = embed(chol(S)) by uniqueness.
  CholeskyQR2 replaces LAPACK QR for walker re-orthogonalisation: two matmul
  passes (MXU) + tiny Cholesky, with det(R) = prod diag(L1) diag(L2) real
  positive by construction — exactly the detR > 0 convention the reference
  enforces by sign-fixing (``pauxy/walkers/single_det.py:234-242``).
* :func:`slogdet`  — complex log-determinant WITH phase via a batched
  Gaussian-elimination scan with partial pivoting (n = number of electrons
  is tiny; n sequential rank-1 updates on the VPU, vectorized over walkers).

Everything is used on all backends (CPU tests exercise the same code TPU
runs) and validated against numpy in tests/test_clinalg.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _real_dtype(cdtype):
    return jnp.zeros((), cdtype).real.dtype


# Routing bound for the lanes-kernel family. Direct VMEM kernels take
# n <= batchla_pallas.LANES_DIRECT_MAX_N (40 — the chip-probed Mosaic
# compile ceiling of the unrolled augmented GJ at the mandated 128-lane
# block); larger n up to 128 runs the blocked Schur-complement
# composition below (lanes leaves + batched MXU matmuls), which covers
# full-rank thermal stacks (M ~ 100).
_LANES_MAX_N = 128
_DIRECT_MAX_N = 40
# The inverse-returning GJ kernel carries two extra [n, n, 128] result
# planes; when the call is INLINED in a larger jit, XLA may place those
# results in VMEM (S(1) layouts), and the kernel's scoped-vmem stack
# crosses the 16 MiB limit from n = 36 up (chip-probed 2026-08-21:
# inlined inv fails n >= 36 / passes n <= 34, while standalone dispatch,
# slogdet, and chol_inv all pass through n = 40). 32 leaves margin for
# XLA's context-dependent placement; 33..40 take the Schur composition.
_DIRECT_MAX_N_INV = 32


def _lanes_mode(s: jax.Array) -> str | None:
    """How the batched tiny-matrix op should route to the VMEM lanes
    kernels (ops/batchla_pallas.py): 'single' (direct pallas_call on one
    accelerator), 'shard' (per-shard jax.shard_map dispatch on the active
    walker mesh — pallas_call has no SPMD partitioning rule), or None
    (XLA fallback). XLA lowers batched LU/cholesky on [w, n, n] to
    ~2.5us/walker serial Mosaic loops — measured to dominate
    whole-simulation wall time (README round-3 Hubbard 16x)."""
    import os

    if not (
        s.dtype in (jnp.complex64, jnp.float32)
        and s.ndim >= 3
        and s.shape[-1] == s.shape[-2]
        and 0 < s.shape[-1] <= _LANES_MAX_N
    ):
        return None
    env = os.environ.get("PAUXY_TPU_BATCHLA")
    if env in ("xla", "scan"):
        return None
    if env == "pallas":
        return "single"   # forced (tests monkeypatch interpret mode)
    cpu = jax.default_backend() == "cpu"
    if len(jax.devices()) == 1:
        return None if cpu else "single"
    from pauxy_tpu.parallel import mesh as pmesh

    m = pmesh.active_mesh()
    if m is None:
        return None
    # The active mesh is process-global state set by shard_walkers; guard
    # against a stale registration from an earlier run (e.g. an unsharded
    # follow-up run whose batch doesn't tile the old mesh) by requiring
    # the flat batch axis to divide over the walker axis.
    nshard = dict(zip(m.axis_names, m.devices.shape)).get(pmesh.WALKER_AXIS)
    batch = 1
    for d in s.shape[:-2]:
        batch *= d
    if not nshard or batch % nshard != 0:
        return None
    if cpu:
        # Virtual CPU meshes (tests) opt in explicitly: the kernels then
        # run in pallas interpret mode, which is slow.
        return "shard_interpret" if env == "shard_interpret" else None
    return "shard"


def _lanes_inv_logdet(s: jax.Array, mode: str, want_inv: bool = True):
    """Inverse + complex log-det of [B, n, n] via the lanes kernels:
    directly for small n, else the blocked Schur composition. The direct
    cap is tighter when the inverse is materialized (see
    _DIRECT_MAX_N_INV)."""
    direct_max = _DIRECT_MAX_N_INV if want_inv else _DIRECT_MAX_N
    if s.shape[-1] > direct_max:
        return _schur_inv_logdet(s, mode, want_inv=want_inv)
    return _lanes_leaf(s, mode, want_inv=want_inv)


def _lanes_leaf(s: jax.Array, mode: str, want_inv: bool = True):
    from pauxy_tpu.ops import batchla_pallas as bp

    if mode == "single":
        return bp.inv_logdet_lanes(s, want_inv=want_inv)
    from pauxy_tpu.parallel import mesh as pmesh

    return bp.inv_logdet_lanes_sharded(
        s, pmesh.active_mesh(), want_inv=want_inv,
        interpret=(mode == "shard_interpret"),
    )


def _schur_inv_logdet(s: jax.Array, mode: str, want_inv: bool = True):
    """Blocked inverse + log-det by recursive 2x2 Schur complement.

    s = [[A, B], [C, D]]: inv and det come from inv(A), the Schur
    complement S = D - C A^-1 B, and inv(S) —
        det(s)  = det(A) det(S)
        inv(s)  = [[A^-1 + A^-1 B S^-1 C A^-1,  -A^-1 B S^-1],
                   [-S^-1 C A^-1,                S^-1       ]]
    Leaves (n <= 48) run the VMEM lanes Gauss-Jordan (pivoted WITHIN each
    leaf); the glue is batched complex matmuls the MXU eats directly. No
    cross-block pivoting: fine for the AFQMC matrices this sees (stabilized
    Green's-function factors, QDT cores — never near-singular leading
    blocks by construction), same caveat as any blocked LU-without-pivoting.
    Reference being replaced: per-walker scipy inv/det on the thermal stack
    (``pauxy/walkers/thermal.py:472``, ``pauxy/walkers/stack.py:326``).
    """
    n = s.shape[-1]
    m = (n + 1) // 2
    a, b = s[:, :m, :m], s[:, :m, m:]
    c, d = s[:, m:, :m], s[:, m:, m:]
    lda, ainv = _lanes_inv_logdet(a, mode, want_inv=True)
    ainv_b = jnp.matmul(ainv, b)
    schur = d - jnp.matmul(c, ainv_b)
    lds, sinv = _lanes_inv_logdet(schur, mode, want_inv=want_inv)
    ld = lda + lds
    if not want_inv:
        return ld, None
    c_ainv = jnp.matmul(c, ainv)
    sinv_c_ainv = jnp.matmul(sinv, c_ainv)
    top = jnp.concatenate(
        [ainv + jnp.matmul(ainv_b, sinv_c_ainv), -jnp.matmul(ainv_b, sinv)],
        axis=-1,
    )
    bot = jnp.concatenate([-sinv_c_ainv, sinv], axis=-1)
    return ld, jnp.concatenate([top, bot], axis=-2)


# ----------------------------------------------------------------------------
# Block embeddings
# ----------------------------------------------------------------------------

def _embed_block(s: jax.Array) -> jax.Array:
    """[..., n, n] complex -> [..., 2n, 2n] real, [[A, -B], [B, A]]."""
    a, b = s.real, s.imag
    top = jnp.concatenate([a, -b], axis=-1)
    bot = jnp.concatenate([b, a], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def solve(s: jax.Array, y: jax.Array) -> jax.Array:
    """Batched complex solve S X = Y.

    s: [..., n, n] complex, y: [..., n, m] complex. On a single
    accelerator with small n this routes to the VMEM Gauss-Jordan lanes
    kernel (explicit inverse, then one MXU matmul); the fallback is LU on
    the real 2n block embedding.
    """
    # The solution dtype follows BOTH operands: a real S with a complex Y
    # has a complex solution (casting to s.dtype would silently drop the
    # imaginary half).
    out_dtype = jnp.result_type(s.dtype, y.dtype)
    if s.shape[-1] == 0:
        # Empty system (fully spin-polarized 0-electron blocks).
        return y.astype(out_dtype)
    mode = _lanes_mode(s)
    if mode:
        flat = s.reshape((-1,) + s.shape[-2:])
        _, inv = _lanes_inv_logdet(flat, mode)
        inv = inv.reshape(s.shape)
        return jnp.matmul(inv, y).astype(out_dtype)
    se = _embed_block(s)
    ye = jnp.concatenate([y.real, y.imag], axis=-2)       # [..., 2n, m]
    xe = jnp.linalg.solve(se, ye)
    n = s.shape[-1]
    return (xe[..., :n, :] + 1j * xe[..., n:, :]).astype(out_dtype)


def inv(s: jax.Array) -> jax.Array:
    """Batched explicit inverse of ``s [..., n, n]``.

    Lanes-eligible batches take the Gauss-Jordan inverse straight out of
    the VMEM kernel (``solve(s, I)`` would pay an extra [w, n, n] x
    [w, n, n] MXU matmul against the identity on top of it); everything
    else falls back to :func:`solve` against the identity.
    """
    mode = _lanes_mode(s)
    if mode:
        flat = s.reshape((-1,) + s.shape[-2:])
        _, invf = _lanes_inv_logdet(flat, mode)
        return invf.reshape(s.shape)
    eye = jnp.broadcast_to(jnp.eye(s.shape[-1], dtype=s.dtype), s.shape)
    return solve(s, eye)


def _interleave(s: jax.Array) -> jax.Array:
    """[..., n, n] complex -> [..., 2n, 2n] real with per-index 2x2 blocks
    [[a, -b], [b, a]] (the interleaved embedding)."""
    *batch, n, _ = s.shape
    a, b = s.real, s.imag
    # rows: stack (a_row, b_row) pairs; cols: stack (re, im) pairs.
    m = jnp.stack(
        [jnp.stack([a, -b], axis=-1), jnp.stack([b, a], axis=-1)], axis=-3
    )  # [..., n, 2, n, 2]
    return m.reshape(*batch, 2 * n, 2 * n)


def _deinterleave(m: jax.Array, cdtype) -> jax.Array:
    """Inverse of :func:`_interleave` (reads the (re, im) components)."""
    *batch, n2, _ = m.shape
    n = n2 // 2
    m = m.reshape(*batch, n, 2, n, 2)
    return (m[..., :, 0, :, 0] + 1j * m[..., :, 1, :, 0]).astype(cdtype)


def cholesky(s: jax.Array) -> jax.Array:
    """Batched Cholesky of a Hermitian positive-definite complex matrix.

    Returns lower-triangular L with real positive diagonal, S = L L^dagger.
    """
    le = jnp.linalg.cholesky(_interleave(s))
    return _deinterleave(le, s.dtype)


def triangular_solve_lower(l: jax.Array, y: jax.Array) -> jax.Array:
    """Solve L X = Y for lower-triangular complex L (batched)."""
    le = _interleave(l)
    *batch, n, m = y.shape
    ye = jnp.stack([y.real, y.imag], axis=-2).reshape(*batch, 2 * n, m)
    xe = jax.lax.linalg.triangular_solve(
        le, ye, left_side=True, lower=True
    )
    xe = xe.reshape(*batch, n, 2, m)
    return (xe[..., 0, :] + 1j * xe[..., 1, :]).astype(l.dtype)


# ----------------------------------------------------------------------------
# CholeskyQR2 orthogonalisation
# ----------------------------------------------------------------------------

def cholesky_qr(phi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One CholeskyQR pass: phi = Q R, Q orthonormal, diag(R) real positive.

    Returns (Q, log diag(R)) — the full R is never needed by AFQMC, only
    log det R = sum log diag (the lanes fast path returns the sum
    pre-reduced, shaped [..., 1], which downstream ``.sum(-1)`` leaves
    unchanged).
    """
    if phi.shape[-1] == 0:
        # 0-column determinant blocks: Q empty, log det R = 0.
        return phi, jnp.zeros(phi.shape[:-2] + (1,), phi.real.dtype)
    s = jnp.einsum("...mi,...mj->...ij", phi.conj(), phi)
    # The chol lanes kernel is direct-only (n = orbital count per spin,
    # <= 48 in every driver path); larger n takes the interleaved-embedding
    # XLA route below rather than an illegal narrow lane block.
    mode = _lanes_mode(s) if s.shape[-1] <= _DIRECT_MAX_N else None
    if mode:
        from pauxy_tpu.ops import batchla_pallas as bp

        flat = s.reshape((-1,) + s.shape[-2:])
        if mode == "single":
            ld, linv = bp.chol_inv_lanes(flat)
        else:
            from pauxy_tpu.parallel import mesh as pmesh

            ld, linv = bp.chol_inv_lanes_sharded(
                flat, pmesh.active_mesh(),
                interpret=(mode == "shard_interpret"),
            )
        linv = linv.reshape(s.shape)
        # Q = phi L^-dagger; (L^-dagger)[j, i] = conj(linv[i, j]).
        q = jnp.einsum("...mj,...ij->...mi", phi, linv.conj())
        return q, ld.reshape(s.shape[:-2] + (1,))
    l = cholesky(s)
    # Q = phi L^-dagger  <=>  L Q^dagger = phi^dagger.
    qd = triangular_solve_lower(l, jnp.swapaxes(phi.conj(), -1, -2))
    q = jnp.swapaxes(qd.conj(), -1, -2)
    diag = jnp.diagonal(l, axis1=-2, axis2=-1).real
    return q, jnp.log(diag)


def cholesky_qr2(phi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """CholeskyQR2: two passes for f32-grade stability. Returns
    (Q, log_detR) with log_detR real, [batch]."""
    q, d1 = cholesky_qr(phi)
    q, d2 = cholesky_qr(q)
    return q, (d1 + d2).sum(-1)


# ----------------------------------------------------------------------------
# Complex slogdet with phase (batched Gaussian elimination, partial pivot)
# ----------------------------------------------------------------------------

def _slogdet_single(s: jax.Array) -> jax.Array:
    """Complex log det of one n x n matrix via pivoted elimination scan."""
    n = s.shape[-1]
    cdtype = s.dtype
    rows = jnp.arange(n)

    def body(k, carry):
        s, logdet, swaps = carry
        col = jnp.abs(s[:, k])
        col = jnp.where(rows >= k, col, -1.0)
        p = jnp.argmax(col)
        # Swap rows k and p.
        perm = jnp.where(rows == k, p, jnp.where(rows == p, k, rows))
        s = s[perm]
        swaps = swaps + (p != k)
        pivot = s[k, k]
        logdet = logdet + jnp.log(pivot)
        # Eliminate below the pivot (mask keeps shapes static).
        factor = jnp.where(rows > k, s[:, k] / pivot, 0.0).astype(cdtype)
        s = s - factor[:, None] * s[k][None, :]
        return s, logdet, swaps

    _, logdet, swaps = jax.lax.fori_loop(
        0, n, body, (s, jnp.zeros((), cdtype), jnp.zeros((), jnp.int32))
    )
    pi = jnp.asarray(jnp.pi, _real_dtype(cdtype))
    return logdet + 1j * pi * (swaps % 2).astype(_real_dtype(cdtype))


def slogdet(s: jax.Array) -> jax.Array:
    """Batched complex log-determinant (log|det| + i arg det), [...]."""
    if s.shape[-1] == 0:
        # det of the 0x0 matrix is 1 (empty product) — arises for fully
        # spin-polarized systems (ndown=0 overlap blocks).
        return jnp.zeros(s.shape[:-2], s.dtype)
    mode = _lanes_mode(s)
    if mode:
        flat = s.reshape((-1,) + s.shape[-2:])
        ld, _ = _lanes_inv_logdet(flat, mode, want_inv=False)
        return ld.reshape(s.shape[:-2])
    flat = s.reshape((-1,) + s.shape[-2:])
    out = jax.vmap(_slogdet_single)(flat)
    return out.reshape(s.shape[:-2])
