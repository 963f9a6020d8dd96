"""Discrete-HS propagation for the Hubbard-Holstein model (electrons +
drift-diffusion DMC phonon moves).

TPU-native counterpart of ``pauxy/propagation/hubbard_holstein.py:17-515``
(HirschDMC). Per step (non-symmetric Trotter, the reference default,
``hubbard_holstein.py:430-438``):

  1. electron kinetic+e-ph half step (dt/2), real-part/cosine constraint
  2. Hirsch single-site sweep for the U term (reused from hirsch.py)
  3. second electron half step
  4. phonon drift-diffusion move with DMC weight
     w *= exp(-dt/2 (E_B(X') + E_B(X) - 2 E_B^shift))  (:314-356)

The reference exponentiates the coupled matrix expm(-dt(T - cpl diag X))
per walker per step with scipy (``:380-383``); here the equivalent-order
symmetric split diag(e^{dt cpl X/2}) expm(-dt T) diag(e^{dt cpl X/2}) keeps
it batched matmuls.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp
from flax import struct

from pauxy_tpu import config
from pauxy_tpu.models import hubbard_holstein as hh
from pauxy_tpu.ops import clinalg
from pauxy_tpu.propagation.hirsch import Hirsch, make_hirsch


@struct.dataclass
class HirschDMC:
    """Hirsch electron updates + DMC phonons."""

    hirsch: Hirsch        # provides auxf/aux_wfac/_site_sweep
    BT_half: jax.Array    # [2, M, M] expm(-(dt/2) T)
    dt: float = struct.field(pytree_node=False)
    m: float = struct.field(pytree_node=False)
    w0: float = struct.field(pytree_node=False)
    cpl: float = struct.field(pytree_node=False)   # g sqrt(2 m w0)
    eshift_boson: float = struct.field(pytree_node=False, default=0.0)
    free_projection: bool = struct.field(pytree_node=False, default=False)
    hybrid: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------
    def _electron_half_step(self, trial, state, dt_half):
        """phi <- diag(e^{k X/2}) B_T diag(e^{k X/2}) phi with
        k = dt_half*cpl, then the magnitude*cosine constraint
        (hubbard_holstein.py:358-400)."""
        gauge = jnp.exp(0.5 * dt_half * self.cpl * state.X)  # [w, M] real
        phia = state.phia * gauge[:, :, None]
        phib = state.phib * gauge[:, :, None]
        phia = jnp.einsum("pm,wmn->wpn", self.BT_half[0], phia, optimize=True)
        phib = jnp.einsum("pm,wmn->wpn", self.BT_half[1], phib, optimize=True)
        phia = phia * gauge[:, :, None]
        phib = phib * gauge[:, :, None]
        sa = jnp.einsum("wmi,mj->wij", phia, trial.psia.conj())
        sb = jnp.einsum("wmi,mj->wij", phib, trial.psib.conj())
        log_new = (clinalg.slogdet(sa) + clinalg.slogdet(sb)).astype(
            state.log_ovlp.dtype
        )
        ratio = jnp.exp(log_new - state.log_ovlp)
        phase = jnp.angle(ratio)
        ok = jnp.abs(phase) < 0.5 * jnp.pi
        cosine = jnp.maximum(0.0, jnp.cos(phase))
        weight = jnp.where(ok, state.weight * jnp.abs(ratio) * cosine, 0.0)
        return state.replace(phia=phia, phib=phib, weight=weight,
                             log_ovlp=log_new)

    def _boson_move(self, trial, state, key, dt):
        """Drift-diffusion phonon move + DMC weight
        (hubbard_holstein.py:314-356)."""
        shift = trial.shift
        x = state.X
        eloc_old = hh.ho_local_energy(x, self.m, self.w0, shift)
        drift = (dt / self.m) * hh.ho_gradient(x, self.m, self.w0, shift)
        dx = jax.random.normal(key, x.shape, dtype=x.dtype) * jnp.sqrt(
            dt / self.m
        )
        x_new = x + dx + drift
        eloc_new = hh.ho_local_energy(x_new, self.m, self.w0, shift)
        log_ratio = hh.ho_log_value(x_new, self.m, self.w0, shift) - (
            hh.ho_log_value(x, self.m, self.w0, shift)
        )
        weight = state.weight * jnp.exp(
            -0.5 * dt * (eloc_new.real + eloc_old.real - 2 * self.eshift_boson)
        )
        return state.replace(
            X=x_new,
            weight=weight,
            log_ovlp=state.log_ovlp + log_ratio.astype(state.log_ovlp.dtype),
        )

    def propagate(self, trial, state, key, eshift, bp_ix=None, ham=None):
        k1, k2 = jax.random.split(key)
        state = self._electron_half_step(trial, state, 0.5 * self.dt)
        state, _fields = self.hirsch._site_sweep(trial, state, k1)
        state = self._electron_half_step(trial, state, 0.5 * self.dt)
        state = self._boson_move(trial, state, k2, self.dt)
        growth = jnp.exp(self.dt * jnp.real(eshift))
        return state.replace(weight=state.weight * growth)


def make_hirsch_dmc(ham, trial, dt: float, lang_firsov: bool = False,
                    precision=None) -> HirschDMC:
    """lang_firsov=True replaces U by the LF effective interaction in the
    Hirsch field tables (``propagation/hubbard_holstein.py:63-69``)."""
    prec = config.get_precision(precision)
    from pauxy_tpu.utils.transfer import to_device, to_host

    ham_eff = ham
    if lang_firsov:
        from pauxy_tpu.models.hubbard_holstein import _lf_params

        _gamma, ueff = _lf_params(ham)
        ham_eff = ham.replace(U=float(ueff))
    hirsch = make_hirsch(ham_eff, trial, dt)
    t = np.asarray(ham.T)
    bt_half = np.stack(
        [scipy.linalg.expm(-0.5 * dt * t[0]), scipy.linalg.expm(-0.5 * dt * t[1])]
    )
    shift_host = np.asarray(to_host(trial.shift))
    eshift_b = float(
        np.asarray(
            hh.ho_local_energy(
                jnp.asarray(shift_host), ham.m, ham.w0, jnp.asarray(shift_host)
            )
        )
    )
    return HirschDMC(
        hirsch=hirsch,
        BT_half=to_device(bt_half.astype(prec.cplx)),
        dt=float(dt),
        m=float(ham.m),
        w0=float(ham.w0),
        cpl=float(ham.gsq2mw),
        eshift_boson=eshift_b,
    )
