"""Pallas TPU kernel: fused Taylor exp(VHS)-apply, VHS read ONCE.

Why: the Generic phaseless step builds VHS [w, M, M] complex with one big
MXU matmul (cheap, compute-bound) but then the XLA Taylor loop
(propagation/generic.apply_exponential_taylor) re-reads the whole VHS
tensor from HBM once per order — 6x ~134 MB at the bench config
(w=1024, M=128, c64), ~1 GB of traffic for ~0.13 ms of MXU work. Here
each program loads a WB-walker block of VHS tiles into VMEM once and runs
the entire 6-order recurrence on-chip: traffic drops to a single VHS
read, and the per-program grid overhead is amortized over WB walkers
(single-walker programs measured SLOWER than the XLA loop on a v5e).

Dots run at Precision.HIGHEST — Mosaic's DEFAULT is a single bf16 MXU
pass even for f32 operands (~5e-3 relative error, measured on chip). An
optional bf16 path (``lowp=True``) casts the multiplicands to bfloat16
with float32 accumulation — SURVEY hard part (f)'s "selective precision
lowering with error-controlled tests" (tests/test_generic.py asserts the
error bound vs the f64 CPU path).

Replaces the reference's per-walker numpy Taylor loop
(``pauxy/propagation/continuous.py:82-111``) on the TPU fast path.
Complex arithmetic is explicit re/im pairs (Mosaic has no complex dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _dot(a, b, highest=True):
    # bf16 operands MUST pin DEFAULT explicitly: precision=None inherits
    # the global jax_default_matmul_precision (the driver sets 'float32'),
    # and Mosaic rejects fp32 contract precision on bf16 inputs.
    prec = (jax.lax.Precision.HIGHEST if highest
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _taylor_kernel(order, lowp, wb,
                   vr_ref, vi_ref, pr_ref, pi_ref,
                   or_ref, oi_ref):
    n = pr_ref.shape[-1]
    for wi in range(wb):
        vr = vr_ref[wi]
        vi = vi_ref[wi]
        tr = pr_ref[wi]
        ti = pi_ref[wi]
        if lowp:
            vr = vr.astype(jnp.bfloat16)
            vi = vi.astype(jnp.bfloat16)
        accr, acci = tr, ti
        for k in range(1, order + 1):
            inv = 1.0 / k
            if lowp:
                # bf16 multiplicands, f32 accumulation: the 4-dot form
                # measured FASTER than the paired form here (single-pass
                # dots leave no pass count to amortize).
                a, b = tr.astype(jnp.bfloat16), ti.astype(jnp.bfloat16)
                nr = _dot(vr, a, False) - _dot(vi, b, False)
                ni = _dot(vr, b, False) + _dot(vi, a, False)
                tr = nr * inv
                ti = ni * inv
            else:
                # Paired RHS: [re|im] through each of vr/vi — 2 dots of
                # width 2n instead of 4 of width n. The step is dot-issue
                # bound (chip-probed 12% win at the bench shape); wider
                # lanes also raise MXU tile utilization.
                ab = jnp.concatenate([tr, ti], axis=1)
                c1 = _dot(vr, ab, True)
                c2 = _dot(vi, ab, True)
                tr = (c1[:, :n] - c2[:, n:]) * inv
                ti = (c1[:, n:] + c2[:, :n]) * inv
            accr = accr + tr
            acci = acci + ti
        or_ref[wi] = accr
        oi_ref[wi] = acci


@functools.partial(
    jax.jit, static_argnames=("order", "lowp", "wb", "interpret")
)
def apply_taylor_pallas(vhs: jax.Array, phi: jax.Array, order: int = 6,
                        lowp: bool = False, wb: int = 8,
                        interpret: bool = False):
    """phi <- exp(vhs) phi, one WB-walker block per program.

    vhs: [w, M, M] complex, phi: [w, M, n] complex. Same truncated-series
    math as propagation/generic.apply_exponential_taylor. VMEM per
    program ~ wb * M^2 * 8 bytes (re+im) — 1 MB at wb=8, M=128.
    """
    w, m, _ = vhs.shape
    n = phi.shape[-1]
    f32 = jnp.float32
    wb = min(wb, w)
    pad = (-w) % wb
    nwb = (w + pad) // wb

    def pad0(a):
        return jnp.pad(a.astype(f32), ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    def blk(shape):
        nd = len(shape)
        return pl.BlockSpec((wb,) + shape,
                            lambda i, _n=nd: (i,) + (0,) * _n)

    outs = pl.pallas_call(
        functools.partial(_taylor_kernel, order, lowp, wb),
        grid=(nwb,),
        in_specs=[blk((m, m)), blk((m, m)), blk((m, n)), blk((m, n))],
        out_specs=(blk((m, n)), blk((m, n))),
        out_shape=(
            jax.ShapeDtypeStruct((nwb * wb, m, n), f32),
            jax.ShapeDtypeStruct((nwb * wb, m, n), f32),
        ),
        interpret=interpret,
    )(
        pad0(vhs.real), pad0(vhs.imag),
        pad0(phi.real), pad0(phi.imag),
    )
    out = (outs[0] + 1j * outs[1])[:w]
    return out.astype(phi.dtype)
