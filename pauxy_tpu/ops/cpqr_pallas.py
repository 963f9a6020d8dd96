"""Pallas TPU kernel: batched column-pivoted Householder QR, VMEM-resident.

Why: the finite-temperature QDT stratification re-factorizes the
propagator stack every slice (``pauxy/walkers/thermal.py:472-545``), and
the pure-XLA fallback (ops/cpqr.py) is a fori_loop whose every column
step reads AND writes the full [B, m, m] working pair from HBM. This
kernel keeps the matrix resident in VMEM with the batch axis on the
128-wide lane dimension, so each of the m sequential Householder steps
is a short chain of VPU vector ops across 128 walkers with no HBM
round-trip.

Outcome (chip probes 2026-08-20, tools/axon/probe_cpqr.py): Mosaic
compiles the factor pass only up to m = 64 (CPQR_MAX_M below; m >= 80
consistently fails remote compilation). Where it compiles (two tunnel
windows): 1.09-1.20x over the XLA fori_loop at [256, 16, 16],
1.11-1.55x at [128, 48, 48], neutral-to-0.73x at [128, 64, 64] (the
always-recompute pivot norms grow O(m^2 W)/step and overtake the saved
HBM traffic). The kernel is therefore the auto route
for m <= CPQR_AUTO_MAX_M = 48 (the lattice-model thermal classes); the
UEG-class stratification (M = 93) stays on the XLA path.

Two passes (the full Q does not fit VMEM next to the working matrix at
m ~ 100):

* factor pass — pivoted complex Householder elimination on [m, m, W]
  re/im planes. Outputs the packed factor (R on/above the diagonal, the
  unit-lower Householder vectors below), tau, and the per-step pivot
  choices (the permutation is replayed outside). With the LAPACK phase
  choice beta = -(alpha/|alpha|) ||x||, tau = (||x|| + |alpha|)/||x|| is
  REAL, every reflector H = I - tau v v^H is Hermitian and unitary, and
  Q = H_0 H_1 ... H_{m-1} exactly.
* form-Q pass — applies the reflectors in reverse order to identity
  column blocks (LAPACK xORGQR structure), gridded
  (lane block x column block) so the packed factor stays resident across
  the inner column grid.

Column pivoting selects the largest remaining column 2-norm, RECOMPUTED
from the live trailing matrix every step (LAPACK's downdate-then-recheck
is replaced by always-recompute: in VMEM the extra O(m^2 W) reduction
per step is cheap, and it is immune to downdating cancellation).

Mosaic notes: complex arithmetic is explicit re/im f32 planes (no
complex dtype); every intermediate stays 3-D with EXPLICIT singleton
dims (keepdims=True reductions) — 2-D values produced by sublane-axis
reductions acquire replicated/implicit layouts that the hardware
relayouter rejects on the fori_loop back-edge ("Invalid relayout:
non-singleton logical dimension is replicated in destination but not in
source"); tau and the pivot stream are written to output refs row-by-row
instead of being carried for the same reason.

Semantics match ops/cpqr.cpqr (scipy.linalg.qr(pivoting=True)
convention): a[..., :, perm] = q @ r. Validated against it in
tests/test_cpqr_pallas.py; Mosaic legality on the chip via the cpqr_*
cells of tools/axon/kernel_matrix.py; on-chip XLA-vs-lanes timings via
tools/axon/probe_cpqr.py.

Integration: the thermal QDT stratification and low-rank walkers reach
this kernel through ops/cpqr.cpqr's auto dispatch (lanes on TPU for
pivoted, batched, m <= CPQR_AUTO_MAX_M, single-precision inputs; the
XLA fori_loop otherwise). Override with PAUXY_TPU_CPQR=xla|lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

WB = 128   # batch lane block — Mosaic requires 128-wide lane tiles
QCB = 16   # form-Q column block

# Factor-pass ceiling, chip-probed 2026-08-20: with the input/output
# blocks aliased the kernel compiles and validates on a v5e up to m = 64;
# m >= 80 consistently fails Mosaic compilation (remote_compile exit 1,
# reproduced across sessions/ports — not a transient). Larger m routes to
# the XLA fori_loop via ops/cpqr.cpqr's dispatch.
CPQR_MAX_M = 64
# Auto-dispatch profitability cap (same probes, two tunnel windows):
# 1.09-1.20x at [256,16,16], 1.11-1.55x at [128,48,48], but neutral-to-
# losing at [128,64,64] — the always-recompute pivot norms grow
# O(m^2 W) per step and overtake the saved HBM traffic past m ~ 48.
# ops/cpqr.cpqr routes here only for m <= this.
CPQR_AUTO_MAX_M = 48


def _factor_kernel(m, ar_ref, ai_ref,
                   vr_out, vi_out, tau_out, piv_out):
    f32 = ar_ref.dtype
    rows = lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)   # [m, 1, 1]
    cols = lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)   # [1, m, 1]
    tiny = jnp.asarray(1e-30, f32)

    def body(k, carry):
        ar, ai = carry
        # ---- pivot: largest remaining column norm over rows >= k --------
        sq = jnp.where(rows >= k, ar * ar + ai * ai, 0.0)
        norms = jnp.sum(sq, axis=0, keepdims=True)         # [1, m, W]
        norms = jnp.where(cols >= k, norms, -1.0)
        best = jnp.max(norms, axis=1, keepdims=True)       # [1, 1, W]
        piv = jnp.min(
            jnp.where(norms == best, cols, m), axis=1, keepdims=True
        )                                                  # [1, 1, W] i32
        # ---- swap columns k <-> piv per lane (selects, no scatter) ------
        is_piv = cols == piv                               # [1, m, W]
        at_k = cols == k                                   # [1, m, 1]
        colp_r = jnp.sum(jnp.where(is_piv, ar, 0.0), axis=1,
                         keepdims=True)                    # [m, 1, W]
        colp_i = jnp.sum(jnp.where(is_piv, ai, 0.0), axis=1,
                         keepdims=True)
        colk_r = jnp.sum(jnp.where(at_k, ar, 0.0), axis=1, keepdims=True)
        colk_i = jnp.sum(jnp.where(at_k, ai, 0.0), axis=1, keepdims=True)
        ar = jnp.where(is_piv & ~at_k, colk_r, ar)
        ai = jnp.where(is_piv & ~at_k, colk_i, ai)
        ar = jnp.where(at_k, colp_r, ar)
        ai = jnp.where(at_k, colp_i, ai)
        piv_out[:, pl.ds(k, 1), :] = piv
        # ---- complex Householder for (swapped-in) column k --------------
        at_k_r = rows == k                                 # [m, 1, 1]
        below = rows > k
        xr = jnp.where(rows >= k, colp_r, 0.0)             # [m, 1, W]
        xi = jnp.where(rows >= k, colp_i, 0.0)
        anorm = jnp.sqrt(jnp.sum(xr * xr + xi * xi, axis=0,
                                 keepdims=True))           # [1, 1, W]
        alr = jnp.sum(jnp.where(at_k_r, xr, 0.0), axis=0, keepdims=True)
        ali = jnp.sum(jnp.where(at_k_r, xi, 0.0), axis=0, keepdims=True)
        aabs = jnp.sqrt(alr * alr + ali * ali)             # [1, 1, W]
        # beta = -(alpha/|alpha|) ||x||; alpha == 0 -> beta = -||x||.
        safe = aabs > tiny
        sgr = jnp.where(safe, alr / jnp.where(safe, aabs, 1.0), 1.0)
        sgi = jnp.where(safe, ali / jnp.where(safe, aabs, 1.0), 0.0)
        betr = -sgr * anorm
        beti = -sgi * anorm
        # v = x / (alpha - beta) with v[k] = 1; tau = 1 + |alpha|/||x||
        # (REAL by the phase choice; = (beta - alpha)/beta).
        dr = alr - betr
        di = ali - beti
        dden = jnp.maximum(dr * dr + di * di, tiny)
        vr = (xr * dr + xi * di) / dden                    # [m, 1, W]
        vi = (xi * dr - xr * di) / dden
        vr = jnp.where(at_k_r, 1.0, jnp.where(below, vr, 0.0))
        vi = jnp.where(below, vi, 0.0)
        tk = 1.0 + aabs / jnp.maximum(anorm, tiny)         # [1, 1, W]
        degen = anorm <= tiny                              # zero column
        tk = jnp.where(degen, 0.0, tk)
        betr = jnp.where(degen, 0.0, betr)
        beti = jnp.where(degen, 0.0, beti)
        tau_out[:, pl.ds(k, 1), :] = tk
        # ---- apply H = I - tau v v^H to the TRAILING columns only -------
        # (columns <= k are finished; their below-diagonal rows hold
        # PACKED v vectors the update must never touch.)
        ur = jnp.sum(vr * ar + vi * ai, axis=0, keepdims=True)   # [1, m, W]
        ui = jnp.sum(vr * ai - vi * ar, axis=0, keepdims=True)
        tur = tk * ur                                      # tau real
        tui = tk * ui
        trail = cols > k
        ar = ar - jnp.where(trail, vr * tur - vi * tui, 0.0)
        ai = ai - jnp.where(trail, vr * tui + vi * tur, 0.0)
        # ---- pack column k: diag = beta (exact), below = v --------------
        ar = jnp.where(at_k & at_k_r, betr, ar)
        ai = jnp.where(at_k & at_k_r, beti, ai)
        ar = jnp.where(at_k & below, vr, ar)
        ai = jnp.where(at_k & below, vi, ai)
        return ar, ai

    ar, ai = lax.fori_loop(0, m, body, (ar_ref[...], ai_ref[...]))
    vr_out[...] = ar
    vi_out[...] = ai


def _formq_kernel(m, cb, vr_ref, vi_ref, tau_ref, qr_out, qi_out):
    w = vr_ref.shape[-1]
    f32 = vr_ref.dtype
    j = pl.program_id(1)
    rows = lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    rows3 = lax.broadcasted_iota(jnp.int32, (m, cb, w), 0)
    cols3 = lax.broadcasted_iota(jnp.int32, (m, cb, w), 1)
    vr_all = vr_ref[...]
    vi_all = vi_ref[...]
    tau_all = tau_ref[...]                                 # [1, m, W]

    def reflector(k):
        """v_k (unit-lower, packed below the diagonal), real tau_k."""
        at_k_c = cols == k
        at_k_r = rows == k
        below = rows > k
        vr = jnp.sum(jnp.where(at_k_c, vr_all, 0.0), axis=1,
                     keepdims=True)                        # [m, 1, W]
        vi = jnp.sum(jnp.where(at_k_c, vi_all, 0.0), axis=1,
                     keepdims=True)
        vr = jnp.where(at_k_r, 1.0, jnp.where(below, vr, 0.0))
        vi = jnp.where(below, vi, 0.0)
        tk = jnp.sum(jnp.where(at_k_c, tau_all, 0.0), axis=1,
                     keepdims=True)                        # [1, 1, W]
        return vr, vi, tk

    def apply(qr, qi, vr, vi, tk):
        ur = jnp.sum(vr * qr + vi * qi, axis=0, keepdims=True)  # [1, cb, W]
        ui = jnp.sum(vr * qi - vi * qr, axis=0, keepdims=True)
        tur = tk * ur
        tui = tk * ui
        qr = qr - (vr * tur - vi * tui)
        qi = qi - (vr * tui + vi * tur)
        return qr, qi

    # Q block = identity columns [j*cb, (j+1)*cb); the FIRST reflector
    # application (k = m-1) is peeled so both loop carries enter the
    # fori_loop materialized (splat-initialized carries get a replicated
    # Mosaic layout — see the module docstring); qi0 = 0 is substituted
    # symbolically.
    qr0 = jnp.where(rows3 == cols3 + j * cb,
                    jnp.ones((), f32), jnp.zeros((), f32))
    vr, vi, tk = reflector(m - 1)
    ur = jnp.sum(vr * qr0, axis=0, keepdims=True)
    ui = -jnp.sum(vi * qr0, axis=0, keepdims=True)
    tur = tk * ur
    tui = tk * ui
    qr1 = qr0 - (vr * tur - vi * tui)
    qi1 = -(vr * tui + vi * tur)

    def body(i, carry):
        k = m - 1 - i
        return apply(*carry, *reflector(k))

    qr, qi = lax.fori_loop(1, m, body, (qr1, qi1))
    qr_out[...] = qr
    qi_out[...] = qi


@functools.partial(jax.jit, static_argnames=("interpret",))
def cpqr_lanes(a: jax.Array, interpret: bool = False):
    """Batched column-pivoted QR of ``a [B, m, m]`` complex64/float32.

    Returns (q, r, perm) with a[..., :, perm] = q @ r — the ops/cpqr.cpqr
    contract. q is unitary, r upper triangular, perm int32 [B, m].
    """
    b, m, m2 = a.shape
    assert m == m2, "square matrices only"
    if m > CPQR_MAX_M:
        raise ValueError(
            f"cpqr_lanes: m={m} exceeds the factor-pass VMEM ceiling "
            f"CPQR_MAX_M={CPQR_MAX_M} (the resident [m, m, 128] re/im pair "
            "no longer fits); use ops/cpqr.cpqr (impl='xla') instead"
        )
    f32 = jnp.float32
    ar = jnp.transpose(a.real, (1, 2, 0)).astype(f32)      # [m, m, B]
    ai = jnp.transpose(a.imag, (1, 2, 0)).astype(f32)
    pad = (-b) % WB
    wp = b + pad
    ar = jnp.pad(ar, ((0, 0), (0, 0), (0, pad)))
    ai = jnp.pad(ai, ((0, 0), (0, 0), (0, pad)))

    def blk(shape):
        nd = len(shape)
        return pl.BlockSpec(shape[:-1] + (WB,),
                            lambda i, _n=nd: (0,) * (_n - 1) + (i,))

    # The working [m, m, WB] re/im pair is read fully into the loop carry
    # up front and the packed factor is written once at the end, so the
    # input blocks can alias the output blocks — without this the factor
    # pass holds 4 full-size VMEM buffers (17.8 MB at m = 93 > 16 MB) and
    # Mosaic rejects the kernel on real hardware at every thermal M class.
    vr, vi, tau, piv = pl.pallas_call(
        functools.partial(_factor_kernel, m),
        grid=(wp // WB,),
        in_specs=[blk((m, m, wp)), blk((m, m, wp))],
        out_specs=(blk((m, m, wp)), blk((m, m, wp)),
                   blk((1, m, wp)), blk((1, m, wp))),
        out_shape=(
            jax.ShapeDtypeStruct((m, m, wp), f32),
            jax.ShapeDtypeStruct((m, m, wp), f32),
            jax.ShapeDtypeStruct((1, m, wp), f32),
            jax.ShapeDtypeStruct((1, m, wp), jnp.int32),
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(ar, ai)

    # Replay the streamed pivot choices into the column permutation
    # (perm[k] <-> perm[piv_k] in step order) — O(m) tiny [B] selects.
    pivb = jnp.transpose(piv[0, :, :b], (1, 0))            # [B, m]
    idx = jnp.arange(m, dtype=jnp.int32)

    def swap(k, perm):
        p = pivb[:, k]                                     # [B]
        pk = jnp.take_along_axis(perm, jnp.full((b, 1), k, jnp.int32),
                                 axis=1)[:, 0]
        pp = jnp.take_along_axis(perm, p[:, None], axis=1)[:, 0]
        perm = jnp.where(idx[None, :] == k, pp[:, None], perm)
        return jnp.where(idx[None, :] == p[:, None],
                         jnp.where(idx[None, :] == k, perm, pk[:, None]),
                         perm)

    perm = lax.fori_loop(
        0, m, swap, jnp.broadcast_to(idx, (b, m)).astype(jnp.int32)
    )

    # ---- form Q from the packed reflectors (lane x column-block grid) ---
    cb = QCB
    ncb = -(-m // cb)
    mq = ncb * cb

    def vin(shape):
        nd = len(shape)
        return pl.BlockSpec(shape[:-1] + (WB,),
                            lambda i, j, _n=nd: (0,) * (_n - 1) + (i,))

    qcol = pl.BlockSpec((m, cb, WB), lambda i, j: (0, j, i))
    qr_p, qi_p = pl.pallas_call(
        functools.partial(_formq_kernel, m, cb),
        grid=(wp // WB, ncb),
        in_specs=[vin((m, m, wp)), vin((m, m, wp)), vin((1, m, wp))],
        out_specs=(qcol, qcol),
        out_shape=(
            jax.ShapeDtypeStruct((m, mq, wp), f32),
            jax.ShapeDtypeStruct((m, mq, wp), f32),
        ),
        interpret=interpret,
    )(vr, vi, tau)

    cdtype = a.dtype if jnp.iscomplexobj(a) else jnp.complex64
    q = jnp.transpose(qr_p[:, :m, :b] + 1j * qi_p[:, :m, :b],
                      (2, 0, 1)).astype(cdtype)
    rfull = jnp.transpose(vr[:, :, :b] + 1j * vi[:, :, :b],
                          (2, 0, 1)).astype(cdtype)
    r = jnp.triu(rfull)
    return q, r, perm


def cpqr_lanes_sharded(a: jax.Array, mesh, interpret: bool = False):
    """Per-shard dispatch over a walker-sharded mesh (pallas_call has no
    SPMD partitioning rule; the op is elementwise in the batch axis)."""
    from jax.sharding import PartitionSpec as P

    from pauxy_tpu.parallel.mesh import WALKER_AXIS

    wspec3 = P(WALKER_AXIS, None, None)
    return jax.shard_map(
        lambda x: cpqr_lanes(x, interpret=interpret),
        mesh=mesh, in_specs=(wspec3,),
        out_specs=(wspec3, wspec3, P(WALKER_AXIS, None)),
        check_vma=False,
    )(a)
