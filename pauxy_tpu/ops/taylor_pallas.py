"""Pallas TPU kernel: fused Taylor exp(VHS)-apply, VHS read ONCE.

Why: the Generic phaseless step builds VHS [w, M, M] complex with one big
MXU matmul (cheap, compute-bound) but then the XLA Taylor loop
(propagation/generic.apply_exponential_taylor) re-reads the whole VHS
tensor from HBM once per order — 6x ~134 MB at the bench config
(w=1024, M=128, c64), ~1 GB of traffic for ~0.13 ms of MXU work, i.e.
~9x bandwidth-bound (the round-2 Generic MFU of 1.45% is mostly this).
Here each program loads one walker's VHS tile into VMEM once and runs the
entire 6-order recurrence on-chip: traffic drops to a single VHS read.

An optional bf16 path (``lowp=True``) casts the matmul operands to
bfloat16 with float32 accumulation — halving effective VMEM/HBM pressure
and doubling MXU rate; SURVEY hard part (f)'s "selective precision
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


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _taylor_kernel(order, lowp,
                   vr_ref, vi_ref, pr_ref, pi_ref,
                   or_ref, oi_ref):
    vr = vr_ref[0]
    vi = vi_ref[0]
    tr = pr_ref[0]
    ti = pi_ref[0]
    if lowp:
        vr = vr.astype(jnp.bfloat16)
        vi = vi.astype(jnp.bfloat16)
    accr, acci = tr, ti
    for k in range(1, order + 1):
        a, b = (tr.astype(jnp.bfloat16), ti.astype(jnp.bfloat16)) \
            if lowp else (tr, ti)
        nr = _dot(vr, a) - _dot(vi, b)
        ni = _dot(vr, b) + _dot(vi, a)
        inv = 1.0 / k
        tr = nr * inv
        ti = ni * inv
        accr = accr + tr
        acci = acci + ti
    or_ref[0] = accr
    oi_ref[0] = acci


@functools.partial(jax.jit, static_argnames=("order", "lowp", "interpret"))
def apply_taylor_pallas(vhs: jax.Array, phi: jax.Array, order: int = 6,
                        lowp: bool = False, interpret: bool = False):
    """phi <- exp(vhs) phi, one walker tile per program.

    vhs: [w, M, M] complex, phi: [w, M, n] complex. Same truncated-series
    math as propagation/generic.apply_exponential_taylor.
    """
    w, m, _ = vhs.shape
    n = phi.shape[-1]
    f32 = jnp.float32

    def blk(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _n=nd: (i,) + (0,) * _n)

    outs = pl.pallas_call(
        functools.partial(_taylor_kernel, order, lowp),
        grid=(w,),
        in_specs=[blk((m, m)), blk((m, m)), blk((m, n)), blk((m, n))],
        out_specs=(blk((m, n)), blk((m, n))),
        out_shape=(
            jax.ShapeDtypeStruct((w, m, n), f32),
            jax.ShapeDtypeStruct((w, m, n), f32),
        ),
        interpret=interpret,
    )(
        vhs.real.astype(f32), vhs.imag.astype(f32),
        phi.real.astype(f32), phi.imag.astype(f32),
    )
    out = outs[0] + 1j * outs[1]
    return out.astype(phi.dtype)
