"""Pallas TPU kernel for the discrete Hirsch site sweep.

The CPMC two-body update (``pauxy/propagation/hubbard.py:172-220``) is a
*sequential* loop over lattice sites: each site's heat-bath probability uses
the Green's function as updated by every previous flip. XLA can only express
this as a ``lax.scan`` whose tiny body (a few rank-1 updates on the
maintained inverse overlaps) round-trips the whole walker population's
state through HBM every iteration. That state — per walker, phi [M, n] for
each spin plus S^-1 [n, n] — is a few KB: it fits in VMEM for hundreds of
walkers at once.

This kernel runs the ENTIRE sweep VMEM-resident: grid over blocks of 128
walkers (the vector lane width), ``fori_loop`` over sites inside the kernel,
all algebra as lane-parallel VPU ops with the walker axis on the lanes:

  phia [M, na, W]   phib [M, nb, W]   inv/invT [n, n, W] (scratch)

Mosaic-friendly by construction: every tensor op is a 2-D [sublane, lane]
vector op or a leading-axis slice of a 3-D block; the small trial rows and
HS tables live in SMEM and are read as scalars; contractions over the
orbital index are unrolled Python loops (n is small and static). The
inverse AND its transpose are both maintained (the Sherman-Morrison update
is symmetric under transposition) so that every contraction slices the
leading axis — no cross-layout transposes inside the kernel.

Real arithmetic only — the spin-decomposition Hirsch tables are real, and
for an untwisted lattice with a real trial the walkers stay real through the
whole constrained propagation (``propagation/hirsch.py`` selects this kernel
only in that case, detected at build time). The field draw consumes the same
uniform array ``rs[site, walker]`` as the ``lax.scan`` path, so both paths
produce identical trajectories for a given PRNG key (up to float
reassociation in the G_ii contraction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WB = 128  # walker block = vector lane width


def _row(ref, i):
    """Dynamic leading-axis row of a [M, ...] VMEM block, leading 1 dropped."""
    x = ref[pl.ds(i, 1)]
    return x.reshape(x.shape[1:])


def _sweep_kernel(
    nsites, na, nb,
    psia_ref, psib_ref, tab_ref,
    phia_ref, phib_ref, inva_ref, invb_ref, rs_ref, w_ref,
    phia_out, phib_out, w_out, dlog_out, f_out,
    inva_scr, invat_scr, invb_scr, invbt_scr,
):
    phia_out[...] = phia_ref[...]
    phib_out[...] = phib_ref[...]
    inva_scr[...] = inva_ref[...]
    invb_scr[...] = invb_ref[...]
    # Transposed copies (see module docstring); element stores are [1, W]
    # rows so every op stays a 2-D vector op.
    for a in range(na):
        for b in range(na):
            invat_scr[a, pl.ds(b, 1)] = inva_ref[b, pl.ds(a, 1)]
    for a in range(nb):
        for b in range(nb):
            invbt_scr[a, pl.ds(b, 1)] = invb_ref[b, pl.ds(a, 1)]

    d00, d01, d10, d11, wf0, wf1 = (tab_ref[k] for k in range(6))

    def gdiag(inv, row, n, ti, psi_ref):
        # G_ii = sum_ab psi[i,a] inv[b,a] row[b]  (hubbard.py:104-127).
        q = jnp.zeros_like(row)
        for b in range(n):
            q = q + inv[b] * row[b : b + 1]                 # [n, W]
        g = jnp.zeros_like(row[0:1])
        for a in range(n):
            g = g + psi_ref[ti, a] * q[a : a + 1]           # [1, W]
        return g

    def sm_update(inv, invt, n, ti, psi_ref, vt):
        # (S + u vt^T)^-1 with u = trial row i; rank-1 on inv and inv^T.
        t1 = jnp.zeros_like(vt)
        for b in range(n):
            t1 = t1 + psi_ref[ti, b] * invt[b]              # [n, W]
        t2 = jnp.zeros_like(vt)
        for a in range(n):
            t2 = t2 + vt[a : a + 1] * inv[a]                # [n, W]
        denom = 1.0 + jnp.sum(vt * t1, axis=0, keepdims=True)
        for a in range(n):
            inv[a] = inv[a] - t1[a : a + 1] * t2 / denom
        for b in range(n):
            invt[b] = invt[b] - t2[b : b + 1] * t1 / denom

    def site(i, carry):
        w, dlog = carry
        rowa = _row(phia_out, i)                            # [na, W]
        rowb = _row(phib_out, i)
        ga = gdiag(inva_scr, rowa, na, i, psia_ref)         # [1, W]
        gb = gdiag(invb_scr, rowb, nb, i, psib_ref)
        # Heat-bath probabilities (hubbard.py:535-556 + aux_wfac).
        p0 = 0.5 * (1.0 + d00 * ga) * (1.0 + d01 * gb) * wf0
        p1 = 0.5 * (1.0 + d10 * ga) * (1.0 + d11 * gb) * wf1
        pr0 = jnp.maximum(p0, 0.0)
        norm = pr0 + jnp.maximum(p1, 0.0)
        alive = (norm > 0.0) & (jnp.abs(w) > 0.0)
        safe = jnp.where(alive, norm, 1.0)
        r = rs_ref[pl.ds(i, 1)]                             # [1, W]
        xi = r >= pr0 / safe                                # bool [1, W]
        w = jnp.where(alive, w * norm, 0.0)
        chosen = jnp.where(xi, p1, p0)
        dlog = dlog + jnp.where(alive, jnp.log(2.0 * chosen), 0.0)
        da = jnp.where(alive, jnp.where(xi, d10, d00), 0.0)
        db = jnp.where(alive, jnp.where(xi, d11, d01), 0.0)
        vta = rowa * da                                     # [na, W]
        vtb = rowb * db
        phia_out[pl.ds(i, 1)] = (rowa + vta).reshape(1, na, -1)
        phib_out[pl.ds(i, 1)] = (rowb + vtb).reshape(1, nb, -1)
        sm_update(inva_scr, invat_scr, na, i, psia_ref, vta)
        sm_update(invb_scr, invbt_scr, nb, i, psib_ref, vtb)
        f_out[pl.ds(i, 1)] = xi.astype(jnp.int32)
        return w, dlog

    w0 = w_ref[...]                                         # [1, W]
    dlog0 = jnp.zeros_like(w0)
    w, dlog = lax.fori_loop(0, nsites, site, (w0, dlog0))
    w_out[...] = w
    dlog_out[...] = dlog


@functools.partial(jax.jit, static_argnames=("interpret",))
def hirsch_sweep_real(
    psia, psib, delta, wfac, phia, phib, inva, invb, rs, weight,
    interpret=False,
):
    """Run the Hirsch sweep for a real spin-decomposed propagator.

    Args (all real, walker-major as in the caller):
      psia/psib [M, na/nb]   trial rows
      delta [2, 2]           auxf - 1 tables
      wfac  [2]              aux_wfac (ones for spin decomposition)
      phia/phib [w, M, n]    walker orbitals
      inva/invb [w, n, n]    maintained inverse overlaps S^-1
      rs [M, w]              uniform field draws (same layout as scan path)
      weight [w]

    Returns (phia', phib', weight', dlog, fields [w, M] int32).
    """
    w, m, na = phia.shape
    nb = phib.shape[-1]
    dt = phia.dtype
    pad = (-w) % WB
    wp = w + pad

    def lanes(x):  # [w, ...] -> [..., wp]: walker axis last, padded
        x = jnp.moveaxis(x, 0, -1)
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])

    def smem_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.SMEM)

    def blk_spec(shape):  # block over the trailing walker axis
        n = len(shape)
        return pl.BlockSpec(shape[:-1] + (WB,),
                            lambda i, _n=n: (0,) * (_n - 1) + (i,))

    # delta/wfac packed into one SMEM scalar table.
    tab = jnp.concatenate([delta.reshape(-1), wfac.reshape(-1)]).astype(dt)

    outs = pl.pallas_call(
        functools.partial(_sweep_kernel, m, na, nb),
        grid=(wp // WB,),
        in_specs=[
            smem_spec((m, na)),
            smem_spec((m, nb)),
            smem_spec((6,)),
            blk_spec((m, na, wp)),
            blk_spec((m, nb, wp)),
            blk_spec((na, na, wp)),
            blk_spec((nb, nb, wp)),
            blk_spec((m, wp)),
            blk_spec((1, wp)),
        ],
        out_specs=(
            blk_spec((m, na, wp)),
            blk_spec((m, nb, wp)),
            blk_spec((1, wp)),
            blk_spec((1, wp)),
            blk_spec((m, wp)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, na, wp), dt),
            jax.ShapeDtypeStruct((m, nb, wp), dt),
            jax.ShapeDtypeStruct((1, wp), dt),
            jax.ShapeDtypeStruct((1, wp), dt),
            jax.ShapeDtypeStruct((m, wp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((na, na, WB), dt),
            pltpu.VMEM((na, na, WB), dt),
            pltpu.VMEM((nb, nb, WB), dt),
            pltpu.VMEM((nb, nb, WB), dt),
        ],
        interpret=interpret,
    )(
        psia.astype(dt), psib.astype(dt), tab,
        lanes(phia), lanes(phib), lanes(inva), lanes(invb),
        jnp.pad(rs, ((0, 0), (0, pad)), constant_values=1.0).astype(dt),
        jnp.pad(weight.astype(dt), (0, pad))[None],
    )

    phia_o, phib_o, w_o, dlog_o, f_o = outs
    unl = lambda x: jnp.moveaxis(x, -1, 0)[:w]  # noqa: E731
    return unl(phia_o), unl(phib_o), w_o[0, :w], dlog_o[0, :w], unl(f_o)
