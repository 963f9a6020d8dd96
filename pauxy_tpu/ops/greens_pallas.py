"""Pallas TPU kernel: walker Green's functions + log-overlaps, VMEM-resident.

Why: the AFQMC step is dominated by per-walker linear algebra on tiny
matrices — S = phi^T psi* [n, n] (n ~ 8), its log-determinant, and
Ghalf = S^-1 phi^T. XLA's batched LU/solve on [w, n, n] lowers to serial
Mosaic loops costing ~2.5us per walker per call on a v5e
(tools/axon/profile_ops.py), which caps the whole simulation at ~50k
walker-steps/s. An unrolled elimination in plain XLA does not help: its
~60 unfused elementwise stages each round-trip HBM.

This kernel runs the ENTIRE chain — overlap build, partial-pivot
Gauss-Jordan (inverse + complex log-determinant), half-rotated Green's
function — inside one pallas_call per 128-walker lane block, everything in
registers/VMEM. Complex arithmetic is explicit re/im pairs (Mosaic has no
complex dtype). Layout: walker axis LAST (lanes), matching ops/lanelinalg.

Replaces the reference's per-walker numpy calls
(``pauxy/walkers/single_det.py:170-321``) on the fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WB = 128  # walker lane block

# Unroll the site loops only for small lattices: the unrolled program is
# marginally faster per step, but its code size (and Mosaic compile time)
# grows as O(m*n) — a 10x10 lattice took minutes to compile and wedged the
# axon remote-compile helper. Larger m runs the fori_loop body (compiled
# once, O(n) code).
UNROLL_MAX_M = 32


def vmem_ok(m: int, n: int) -> bool:
    """Whether one lane block of the kernel fits scoped VMEM AND compiles:
    fr/fi inputs and ghT outputs ([m, n, 128] f32 re+im each), the
    augmented Gauss-Jordan working set (~4 live [n, 2n, 128] f32 arrays;
    the embedded unrolled GJ shares the chip-probed Mosaic compile
    ceiling of ops/batchla_pallas.LANES_DIRECT_MAX_N), and the overlap
    accumulators. Callers route anything larger to the XLA lanes path
    (qmc/afqmc.fast_greens_impl)."""
    from pauxy_tpu.ops.batchla_pallas import LANES_DIRECT_MAX_N

    f = 4  # f32 bytes per element
    io = 2 * 2 * m * n * WB * f          # fr/fi in + ghT out, re+im
    gj = 4 * n * (2 * n) * WB * f        # augmented GJ live arrays
    s = 2 * n * n * WB * f               # overlap accumulators
    # io counts twice: Pallas double-buffers the pipelined in/out blocks.
    # The 10 MB budget is chip-probed (2026-08-19): (48,28)=9.5 MB and
    # (100,18)=9.0 MB compile and validate; (64,28)=11.3 MB aborts the
    # Mosaic compile.
    return n <= LANES_DIRECT_MAX_N and (2 * io + gj + s) < 10 * 2**20


def _greens_kernel(m, n, want_gh,
                   psr_ref, psi_ref,
                   fr_ref, fi_ref,
                   *refs):
    if want_gh:
        ldr_out, ldi_out, ghr_out, ghi_out = refs
    else:
        ldr_out, ldi_out = refs

    from jax import lax

    w = fr_ref.shape[-1]
    f32 = fr_ref.dtype
    unroll = m <= UNROLL_MAX_M

    # ---- S[i, j] = sum_m phi[m, i] conj(psi[m, j]) ----------------------
    sr = jnp.zeros((n, n, w), f32)
    si = jnp.zeros((n, n, w), f32)

    def s_update(sr, si, fr, fi, wr, wi):
        sr = sr + fr[:, None, :] * wr[None, :, None] \
            - fi[:, None, :] * wi[None, :, None]
        si = si + fr[:, None, :] * wi[None, :, None] \
            + fi[:, None, :] * wr[None, :, None]
        return sr, si

    if unroll:
        for mm in range(m):
            fr = fr_ref[mm]                               # [n, W]
            fi = fi_ref[mm]
            wr = jnp.stack([psr_ref[mm, j] for j in range(n)])   # [n]
            wi = jnp.stack([-psi_ref[mm, j] for j in range(n)])  # conj
            sr, si = s_update(sr, si, fr, fi, wr, wi)
    else:
        def s_body(mm, carry):
            fr = fr_ref[pl.ds(mm, 1)][0]
            fi = fi_ref[pl.ds(mm, 1)][0]
            wr = jnp.stack([psr_ref[mm, j] for j in range(n)])
            wi = jnp.stack([-psi_ref[mm, j] for j in range(n)])
            return s_update(*carry, fr, fi, wr, wi)

        sr, si = lax.fori_loop(0, m, s_body, (sr, si))

    # ---- Gauss-Jordan with partial pivoting on the augmented [S | I] ----
    # Shared elimination (ops/batchla_pallas.gauss_jordan_lanes): inverse
    # parts + log-magnitude + determinant phase as a complex unit pair
    # (Mosaic has no atan2; the caller takes arctan2 of the [2, W] pair —
    # a 2-pi-branch choice the weight update is invariant to).
    from pauxy_tpu.ops.batchla_pallas import gauss_jordan_lanes

    invr, invi, ldr, phr, phi2 = gauss_jordan_lanes(sr, si, n, w)
    ldr_out[...] = ldr.reshape(1, w)
    ldi_out[...] = jnp.stack([phr, phi2])                 # [2, W] phase pair
    if not want_gh:
        return
    # ---- ghT[q] = inv @ phi[q] per site row q ---------------------------
    def gh_row(fqr, fqi):
        accr = jnp.zeros((n, w), f32)
        acci = jnp.zeros((n, w), f32)
        for j in range(n):
            br = fqr[j : j + 1]                           # [1, W]
            bi = fqi[j : j + 1]
            accr = accr + invr[:, j] * br - invi[:, j] * bi
            acci = acci + invr[:, j] * bi + invi[:, j] * br
        return accr, acci

    if unroll:
        for q in range(m):
            accr, acci = gh_row(fr_ref[q], fi_ref[q])
            ghr_out[q] = accr
            ghi_out[q] = acci
    else:
        def gh_body(q, _):
            qs = pl.ds(q, 1)
            accr, acci = gh_row(fr_ref[qs][0], fi_ref[qs][0])
            ghr_out[qs] = accr[None]
            ghi_out[qs] = acci[None]
            return 0

        lax.fori_loop(0, m, gh_body, 0)


@functools.partial(
    jax.jit, static_argnames=("want_gh", "interpret")
)
def greens_lanes_pallas(psi, phi, want_gh: bool = True,
                        interpret: bool = False):
    """Green's function of one spin sector, lanes layout.

    psi [M, n] complex trial; phi [M, n, W] complex walkers (walker axis
    last). Returns (logdet [W] complex, ghT [M, n, W] complex or None)
    where ghT[q, i, w] = Ghalf[i, q, w] — i.e. Ghalf transposed so every
    kernel access is a leading-axis row.

    Same math as ops/greens.greens_function: S = phi^T conj(psi),
    logdet = log det S, Ghalf = S^-1 phi^T.
    """
    m, n, w = phi.shape
    f32 = phi.real.dtype
    pad = (-w) % WB
    wp = w + pad

    fr = jnp.pad(phi.real.astype(f32), ((0, 0), (0, 0), (0, pad)))
    fi = jnp.pad(phi.imag.astype(f32), ((0, 0), (0, 0), (0, pad)))
    psr = psi.real.astype(f32)
    psi_im = psi.imag.astype(f32)

    def smem_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.SMEM)

    def blk(shape):
        nd = len(shape)
        return pl.BlockSpec(shape[:-1] + (WB,),
                            lambda i, _n=nd: (0,) * (_n - 1) + (i,))

    out_specs = [blk((1, wp)), blk((2, wp))]
    out_shape = [
        jax.ShapeDtypeStruct((1, wp), f32),
        jax.ShapeDtypeStruct((2, wp), f32),
    ]
    if want_gh:
        out_specs += [blk((m, n, wp)), blk((m, n, wp))]
        out_shape += [
            jax.ShapeDtypeStruct((m, n, wp), f32),
            jax.ShapeDtypeStruct((m, n, wp), f32),
        ]

    outs = pl.pallas_call(
        functools.partial(_greens_kernel, m, n, want_gh),
        grid=(wp // WB,),
        in_specs=[
            smem_spec((m, n)),
            smem_spec((m, n)),
            blk((m, n, wp)),
            blk((m, n, wp)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(psr, psi_im, fr, fi)

    ldr, ph = outs[0], outs[1]
    logdet = ldr[0, :w] + 1j * jnp.arctan2(ph[1, :w], ph[0, :w])
    if not want_gh:
        return logdet, None
    ght = (outs[2] + 1j * outs[3])[:, :, :w]
    return logdet, ght
