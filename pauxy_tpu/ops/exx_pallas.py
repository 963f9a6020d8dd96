"""Pallas TPU kernel: fused exchange-energy contraction, no HBM intermediate.

exx_w = sum_x tr(T_wx T_wx),  T_wx = rchol_x @ Ghalf_w^T   ([n, n])

The XLA path (estimators/local_energy._exx) materializes
t = einsum('xim,wjm->wxij') — [w, X, n, n] complex, ~1 GB at the bench
config (w=1024, X=512, n=16) — then reads it twice for the transpose
trace: >2 GB of HBM round-trips for ~0.1 ms of MXU work. This kernel
computes T for a whole walker block in VMEM (rchol chunk resident across
the walker grid) and reduces the trace on-chip; HBM traffic drops to one
rchol + one Ghalf read.

MXU shaping: the T build batches all WB walkers into ONE dot of width
WB*n (= 128 lanes at n=16), instead of WB narrow n-wide dots; the
within-walker transpose trace is then a [xc, n, WB, n] axis swap +
elementwise reduce on the VPU. Dots run at Precision.HIGHEST — Mosaic's
DEFAULT is a single bf16 MXU pass even for f32 operands (~5e-3 relative
error, measured on chip), too loose for an energy.

Requires REAL rchol (natural dtype of molecular Hamiltonians — see
ops/contract.py); the XLA path remains the complex/k-point fallback.
Reference algorithm: ``pauxy/estimators/generic.py:156-221`` (per-aux
python loop over cholesky vectors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _exx_kernel(wb, xc, nxc, rc_ref, ghr_ref, ghi_ref, out_ref):
    """One program: WB walkers x one X-chunk.

    rc_ref: [xc*n, M] f32 (flattened rchol chunk), ghr/ghi: [WB, n, M] f32,
    out_ref: [WB, 2] f32 accumulated over the xc grid dim.
    """
    n = ghr_ref.shape[1]
    m = ghr_ref.shape[2]
    ix = pl.program_id(1) if nxc > 1 else 0

    rc = rc_ref[...]                                     # [xc*n, M]
    ghr = ghr_ref[...].reshape(wb * n, m)                # [WB*n, M]
    ghi = ghi_ref[...].reshape(wb * n, m)

    # T[(x i), (w j)] = sum_m rc[(x i), m] gh[(w j), m] — one MXU dot of
    # lane width WB*n per re/im part.
    dims = (((1,), (1,)), ((), ()))
    tr = lax.dot_general(rc, ghr, dims,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    ti = lax.dot_general(rc, ghi, dims,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    # Per-walker trace: a static lane slice + major-dim reshape +
    # (1,2)-transpose per walker (Mosaic cannot reshape ACROSS the lane
    # dim, so [xc*n, wb*n] -> [xc, n, wb, n] is not expressible directly).
    rows = []
    for wi in range(wb):
        t3r = tr[:, wi * n:(wi + 1) * n].reshape(xc, n, n)
        t3i = ti[:, wi * n:(wi + 1) * n].reshape(xc, n, n)
        t3rt = jnp.swapaxes(t3r, 1, 2)
        t3it = jnp.swapaxes(t3i, 1, 2)
        # sum_{x,i,j} T_ij T_ji; Im uses the ij<->ji symmetry of the
        # cross term (sum ti*trT == sum tr*tiT).
        ex_r = jnp.sum(t3r * t3rt) - jnp.sum(t3i * t3it)
        ex_i = 2.0 * jnp.sum(t3r * t3it)
        rows.append(jnp.stack([ex_r, ex_i]))
    block = jnp.stack(rows)                              # [WB, 2]

    @pl.when(ix == 0)
    def _init():
        out_ref[...] = block

    if nxc > 1:
        @pl.when(ix > 0)
        def _acc():
            out_ref[...] = out_ref[...] + block


@functools.partial(
    jax.jit, static_argnames=("wb", "max_chunk_elems", "interpret")
)
def exx_pallas(rchol: jax.Array, ghalf: jax.Array, wb: int = 8,
               max_chunk_elems: int = 2 ** 18, interpret: bool = False):
    """exx[w] = sum_x tr(T_wx T_wx) with T_wx = rchol_x Ghalf_w^T.

    rchol: [X, n, M] REAL; ghalf: [w, n, M] complex. Returns [w] complex.
    X is chunked so the resident rchol block plus the [xc*n, wb*n]
    T temporaries (re/im + transposed copies) stay within the ~16 MB
    Mosaic scoped-VMEM budget (~2 MB rchol at the default).
    """
    x, n, m = rchol.shape
    w = ghalf.shape[0]
    f32 = jnp.float32

    xc = max(1, min(x, max_chunk_elems // (n * m)))
    nxc = -(-x // xc)
    xpad = nxc * xc - x
    rc = jnp.pad(rchol.astype(f32), ((0, xpad), (0, 0), (0, 0)))
    rc = rc.reshape(nxc * xc * n, m)

    wpad = (-w) % wb
    nwb = (w + wpad) // wb
    ghr = jnp.pad(ghalf.real.astype(f32), ((0, wpad), (0, 0), (0, 0)))
    ghi = jnp.pad(ghalf.imag.astype(f32), ((0, wpad), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_exx_kernel, wb, xc, nxc),
        grid=(nwb, nxc),
        in_specs=[
            pl.BlockSpec((xc * n, m), lambda iw, ix: (ix, 0)),
            pl.BlockSpec((wb, n, m), lambda iw, ix: (iw, 0, 0)),
            pl.BlockSpec((wb, n, m), lambda iw, ix: (iw, 0, 0)),
        ],
        out_specs=pl.BlockSpec((wb, 2), lambda iw, ix: (iw, 0)),
        out_shape=jax.ShapeDtypeStruct((nwb * wb, 2), f32),
        interpret=interpret,
    )(rc, ghr, ghi)

    exx = out[:w, 0] + 1j * out[:w, 1]
    return exx.astype(jnp.promote_types(ghalf.dtype, jnp.complex64))
