"""FFT two-body propagation for the plane-wave UEG (PW_FFT).

TPU-native counterpart of ``pauxy/propagation/pw.py:10-340``. The reference
applies the HS two-body propagator with per-orbital zero-padded scipy FFT
convolutions; here the whole population is one batched pseudo-spectral
update. Writing X+-(Q) for the scaled shifted fields, the reference's four
convolutions per Taylor order collapse into a single kernel

    A(Q) = i [X+(Q) + X+(-Q)] - [X-(Q) - X-(-Q)],
    (VHS phi)(G) = sum_Q A(Q) phi(G - Q),

evaluated as IFFT(FFT(A) * FFT(phi)) on the qmesh cube; FFT(rev X) is
computed as Ng * IFFT(X), so no explicit reversals appear. Each Taylor
order is truncated back to the basis sphere exactly like the reference's
'valid'-mode convolution (propagation/pw.py:133-150) — see
models/pw_fft.py for the no-aliasing argument.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pauxy_tpu import config


def to_cube(arr, idx, ngrid: int):
    """Scatter [..., M] k-components into a flattened fft-order cube."""
    shape = arr.shape[:-1] + (ngrid,)
    cube = jnp.zeros(shape, arr.dtype)
    return cube.at[..., idx].set(arr)


def fft3(cube_flat, qmesh):
    x = cube_flat.reshape(cube_flat.shape[:-1] + qmesh)
    x = jnp.fft.fftn(x, axes=(-3, -2, -1))
    return x.reshape(cube_flat.shape)


def ifft3(cube_flat, qmesh):
    x = cube_flat.reshape(cube_flat.shape[:-1] + qmesh)
    x = jnp.fft.ifftn(x, axes=(-3, -2, -1))
    return x.reshape(cube_flat.shape)


@struct.dataclass
class PWFFTInner:
    """Inner propagator for continuous.Continuous (diag BH1 + FFT VHS)."""

    BH1: jax.Array        # [2, M] DIAGONAL of exp(-dt/2 h1e_mod)
    mf_shift: jax.Array   # [2 nq] zeros (pw.py:40)
    vqfac: jax.Array      # [nq] sqrt(v_q / (4 V))
    vq_sqrtdt: jax.Array  # [nq] sqrt_dt * vqfac (kernel scaling)
    gmap: jax.Array       # [M]
    qmap: jax.Array       # [nq]
    ct_f_a: jax.Array     # [na, Ng] fft of conj up trial orbital cubes
    ct_if_a: jax.Array    # [na, Ng] ifft of same
    ct_f_b: jax.Array     # [nb, Ng]
    ct_if_b: jax.Array    # [nb, Ng]
    qmesh: tuple = struct.field(pytree_node=False)
    sqrt_dt: float = struct.field(pytree_node=False)
    exp_order: int = struct.field(pytree_node=False, default=6)

    @property
    def nq(self):
        return self.qmap.shape[0]

    @property
    def ngrid(self):
        return int(np.prod(self.qmesh))

    # ------------------------------------------------------------------
    def _gkpq_gpmq(self, ghalf, ct_f, ct_if):
        """Gkpq(Q) = sum_iG CT_i(G+Q) theta_i(G) and
        Gpmq(Q) = sum_iG CT_i(G-Q) theta_i(G), via FFT correlations
        (estimators/pw_fft.py:62-92)."""
        th = to_cube(ghalf, self.gmap, self.ngrid)         # [w, n, Ng]
        ng = self.ngrid
        th_f = fft3(th, self.qmesh)
        th_if = ifft3(th, self.qmesh)
        # conv(a, rev b) = IFFT(FFT(a) * Ng * IFFT(b))
        gkpq = ifft3(
            jnp.einsum("ig,wig->wg", ct_f, th_if, optimize=True) * ng,
            self.qmesh,
        )
        gpmq = ifft3(
            jnp.einsum("wig,ig->wg", th_f, ct_if, optimize=True) * ng,
            self.qmesh,
        )
        return gkpq[..., self.qmap], gpmq[..., self.qmap]  # [w, nq]

    def force_bias(self, trial, ga, gb):
        """xbar = -sqrt_dt vbias (pw.py:273-318): vplus = i(Gkpq + Gpmq),
        vminus = -(Gkpq - Gpmq), scaled by sqrt(v_q/(4V))."""
        ka, pa = self._gkpq_gpmq(ga.Ghalf, self.ct_f_a, self.ct_if_a)
        kb, pb = self._gkpq_gpmq(gb.Ghalf, self.ct_f_b, self.ct_if_b)
        gk, gp = ka + kb, pa + pb
        vplus = 1j * (gk + gp) * self.vqfac[None]
        vminus = -(gk - gp) * self.vqfac[None]
        return -self.sqrt_dt * jnp.concatenate([vplus, vminus], axis=-1)

    def apply_vhs(self, phia, phib, xshifted):
        """exp(VHS) phi by Taylor expansion with one FFT convolution per
        order (pw.py:120-155)."""
        nq = self.nq
        ng = self.ngrid
        cdtype = phia.dtype
        xp = (xshifted[:, :nq] * self.vq_sqrtdt[None]).astype(cdtype)
        xm = (xshifted[:, nq:] * self.vq_sqrtdt[None]).astype(cdtype)
        xp_c = to_cube(xp, self.qmap, ng)                  # [w, Ng]
        xm_c = to_cube(xm, self.qmap, ng)
        # FFT of A(Q) = i(Xp + rev Xp) - (Xm - rev Xm):
        # FFT(rev X) = Ng * IFFT(X).
        a_hat = (
            1j * (fft3(xp_c, self.qmesh) + ng * ifft3(xp_c, self.qmesh))
            - (fft3(xm_c, self.qmesh) - ng * ifft3(xm_c, self.qmesh))
        )                                                  # [w, Ng]
        mask = jnp.zeros((ng,), cdtype).at[self.gmap].set(1.0)

        def expv(phi):
            u = to_cube(jnp.swapaxes(phi, -1, -2), self.gmap, ng)  # [w,n,Ng]
            out = u
            for n in range(1, self.exp_order + 1):
                u = ifft3(a_hat[:, None, :] * fft3(u, self.qmesh),
                          self.qmesh) / n
                u = u * mask[None, None, :]
                out = out + u
            return jnp.swapaxes(out[..., self.gmap], -1, -2)

        return expv(phia), expv(phib)


def make_pw_fft_inner(ham, trial, dt: float, exp_order: int = 6,
                      precision=None) -> PWFFTInner:
    """Build the FFT inner propagator (pw.py:13-74)."""
    prec = config.get_precision(precision)
    from pauxy_tpu.utils.transfer import to_device, to_host, device_zeros

    bh1 = np.exp(-0.5 * dt * np.asarray(ham.h1e_mod))      # diagonal
    vqfac = np.sqrt(np.asarray(ham.vqvec) / (4.0 * ham.vol))
    ng = int(np.prod(ham.qmesh))
    psia = np.asarray(to_host(trial.psia))
    psib = np.asarray(to_host(trial.psib))

    def ct_cubes(psi):
        cube = np.zeros((psi.shape[1], ng), dtype=complex)
        cube[:, np.asarray(ham.gmap)] = psi.conj().T
        return cube

    cta = ct_cubes(psia)
    ctb = ct_cubes(psib)
    mesh = ham.qmesh

    def f3(a):
        return np.fft.fftn(a.reshape(a.shape[:-1] + mesh),
                           axes=(-3, -2, -1)).reshape(a.shape)

    def if3(a):
        return np.fft.ifftn(a.reshape(a.shape[:-1] + mesh),
                            axes=(-3, -2, -1)).reshape(a.shape)

    return PWFFTInner(
        BH1=to_device(np.stack([bh1, bh1]).astype(prec.cplx)),
        mf_shift=device_zeros((2 * ham.nq,), prec.cplx),
        vqfac=to_device(vqfac.astype(prec.real)),
        vq_sqrtdt=to_device((dt ** 0.5 * vqfac).astype(prec.real)),
        gmap=to_device(np.asarray(ham.gmap)),
        qmap=to_device(np.asarray(ham.qmap)),
        ct_f_a=to_device(f3(cta).astype(prec.cplx)),
        ct_if_a=to_device(if3(cta).astype(prec.cplx)),
        ct_f_b=to_device(f3(ctb).astype(prec.cplx)),
        ct_if_b=to_device(if3(ctb).astype(prec.cplx)),
        qmesh=tuple(ham.qmesh),
        sqrt_dt=float(dt) ** 0.5,
        exp_order=int(exp_order),
    )
