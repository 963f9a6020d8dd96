"""Model-agnostic continuous Hubbard-Stratonovich propagation.

TPU-native rewrite of ``pauxy/propagation/continuous.py:10-318``: the
per-walker ``propagate_walker_phaseless`` becomes one batched pure function
``(state, key) -> state`` with the inner (model-specific) propagator
supplying ``mf_shift``/``BH1``/``force_bias``/``apply_vhs``.

Trotter split per step (``continuous.py:232-262``):

    phi <- B_{T/2} e^{VHS(x - xbar)} B_{T/2} phi

with x ~ N(0,1)^nfields per walker, force bias xbar from the walker Green's
function (components clamped to unit modulus, ``continuous.py:140-151``),
and the phaseless hybrid weight update of ``continuous.py:264-292``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from pauxy_tpu.ops import greens
from pauxy_tpu.walkers.state import WalkerState


def trial_greens(trial, phia, phib):
    """(ga, gb, log_ovlp_total) for single- or multi-determinant trials."""
    from pauxy_tpu.models.multi_slater import (
        MultiSlaterTrial,
        greens_function_multi_det,
    )

    if isinstance(trial, MultiSlaterTrial):
        md = greens_function_multi_det(trial, phia, phib)
        ga = greens.SpinGreens(G=md.G[:, 0], Ghalf=md.Ghalfa,
                               log_ovlp=md.log_ovlp,
                               det_weights=md.det_weights)
        gb = greens.SpinGreens(
            G=md.G[:, 1], Ghalf=md.Ghalfb,
            log_ovlp=jnp.zeros_like(md.log_ovlp),
            det_weights=md.det_weights,
        )
        return ga, gb, md.log_ovlp
    ga = greens.greens_function(phia, trial.psia)
    gb = greens.greens_function(phib, trial.psib)
    return ga, gb, ga.log_ovlp + gb.log_ovlp


def trial_log_overlap(trial, phia, phib):
    from pauxy_tpu.models.multi_slater import (
        MultiSlaterTrial,
        log_overlap_multi_det,
    )

    if isinstance(trial, MultiSlaterTrial):
        return log_overlap_multi_det(trial, phia, phib)
    return greens.log_overlap(phia, trial.psia) + greens.log_overlap(
        phib, trial.psib
    )


class TwoBodyFactors(NamedTuple):
    cmf: jax.Array       # [w] mean-field-shift constant factor
    cfb: jax.Array       # [w] force-bias shift constant factor
    xshifted: jax.Array  # [w, nfields]


@struct.dataclass
class Continuous:
    """Static propagation config + the inner model propagator (a pytree)."""

    inner: Any
    dt: float = struct.field(pytree_node=False)
    free_projection: bool = struct.field(pytree_node=False, default=False)
    hybrid: bool = struct.field(pytree_node=False, default=True)
    force_bias: bool = struct.field(pytree_node=False, default=True)
    # Stochastic resolution-of-identity one-body application
    # (operations.py:54-90 kinetic_real_stochastic; its call sites at
    # continuous.py:248-256 are commented out in the reference — here the
    # path is live and tested).
    stochastic_ri: bool = struct.field(pytree_node=False, default=False)
    ri_nsamples: int = struct.field(pytree_node=False, default=20)

    @property
    def sqrt_dt(self):
        return self.dt ** 0.5

    @property
    def ebound(self):
        # Hybrid-energy bound (continuous.py:70).
        return (2.0 / self.dt) ** 0.5

    def propagate(self, trial, state, key, eshift, bp_ix=None, ham=None):
        if self.free_projection:
            return propagate_free(self, trial, state, key, eshift)
        return propagate_phaseless(self, trial, state, key, eshift, bp_ix,
                                   ham=ham)


def _apply_bh1(bh1: jax.Array, phia: jax.Array, phib: jax.Array):
    """One-body half-step phi <- B_{T/2} phi (propagation/operations.py:29).

    A [2, M] bh1 is a diagonal propagator (plane-wave bases,
    propagation/pw.py kinetic_real with diagH1) applied elementwise.
    """
    if bh1.ndim == 2:
        return bh1[0][None, :, None] * phia, bh1[1][None, :, None] * phib
    phia = jnp.einsum("pm,wmn->wpn", bh1[0], phia, optimize=True)
    phib = jnp.einsum("pm,wmn->wpn", bh1[1], phib, optimize=True)
    return phia, phib


def _apply_bh1_stochastic(bh1, phia, phib, key, nsamples: int):
    """Stochastic-RI one-body half-step: phi <- (B theta)(theta^T phi)/ns.

    theta is an M x ns Rademacher sketch with E[theta theta^T / ns] = I, so
    the applied map is B_{T/2} in expectation. Reference:
    ``pauxy/propagation/operations.py:54-90`` (kinetic_real_stochastic).
    TPU-native redesign: one sketch shared by the whole walker batch, so
    B·theta is built ONCE ([M, ns] matmul) and the per-walker cost drops
    from M^2 n to 2 M ns n — a genuine reduced-scaling path for ns << M
    (the reference rebuilds B·theta per walker, losing that win; its call
    sites are also commented out, ``continuous.py:248-256``). A diagonal
    B (ndim==2) is applied exactly, as in the reference's H1diag branch.
    """
    if bh1.ndim == 2:
        return _apply_bh1(bh1, phia, phib)
    m = phia.shape[1]
    rdtype = jnp.abs(jnp.zeros((), phia.dtype)).dtype
    theta = jax.random.rademacher(key, (m, nsamples), dtype=jnp.int32)
    theta = theta.astype(rdtype)
    bta = bh1[0] @ theta.astype(bh1.dtype)               # [M, ns]
    btb = bh1[1] @ theta.astype(bh1.dtype)
    inv = 1.0 / nsamples
    ta = jnp.einsum("ms,wmn->wsn", theta, phia, optimize=True)
    tb = jnp.einsum("ms,wmn->wsn", theta, phib, optimize=True)
    phia = inv * jnp.einsum("ps,wsn->wpn", bta, ta, optimize=True)
    phib = inv * jnp.einsum("ps,wsn->wpn", btb, tb, optimize=True)
    return phia, phib


def _half_steps(prop: "Continuous", key):
    """Return (apply_first, apply_second) one-body half-step closures,
    stochastic-RI sketched when enabled (fresh sketch per half-step)."""
    inner = prop.inner
    if not prop.stochastic_ri:
        fn = lambda pa, pb: _apply_bh1(inner.BH1, pa, pb)  # noqa: E731
        return fn, fn
    k1, k2 = jax.random.split(key)
    return (
        lambda pa, pb: _apply_bh1_stochastic(inner.BH1, pa, pb, k1,
                                             prop.ri_nsamples),
        lambda pa, pb: _apply_bh1_stochastic(inner.BH1, pa, pb, k2,
                                             prop.ri_nsamples),
    )


def two_body_factors(prop: Continuous, trial, ga, gb, key, nwalkers: int):
    """Sample auxiliary fields and compute shift constants.

    Reference: ``continuous.py:113-173``. Returns the factors plus the
    shifted fields; applying exp(VHS) is left to the caller.
    """
    inner = prop.inner
    nfields = inner.mf_shift.shape[0]
    rdtype = jnp.abs(jnp.zeros((), inner.mf_shift.dtype)).dtype
    xi = jax.random.normal(key, (nwalkers, nfields), dtype=rdtype)

    if prop.force_bias:
        xbar = inner.force_bias(trial, ga, gb)           # [w, nfields] complex
        absx = jnp.abs(xbar)
        # Clamp components with |xbar| > 1 to unit modulus
        # (continuous.py:140-151).
        xbar = jnp.where(absx > 1.0, xbar / jnp.where(absx == 0, 1.0, absx), xbar)
    else:
        xbar = jnp.zeros((nwalkers, nfields), dtype=inner.mf_shift.dtype)

    xshifted = xi - xbar
    cmf = -prop.sqrt_dt * xshifted @ inner.mf_shift      # [w]
    cfb = jnp.sum(xi * xbar, axis=-1) - 0.5 * jnp.sum(xbar * xbar, axis=-1)
    return TwoBodyFactors(cmf=cmf, cfb=cfb, xshifted=xshifted)


def _bound_hybrid(ehyb: jax.Array, eshift: jax.Array, ebound: float) -> jax.Array:
    """Cap Re(ehyb) to eshift +/- sqrt(2/dt); no-op while eshift ~ 0.

    Reference: ``continuous.py:202-214``.
    """
    re = jnp.clip(ehyb.real, eshift.real - ebound, eshift.real + ebound)
    bounded = re + 1j * ehyb.imag
    return jnp.where(jnp.abs(eshift) < 1e-10, ehyb, bounded.astype(ehyb.dtype))


def propagate_phaseless(
    prop: Continuous,
    trial,
    state: WalkerState,
    key: jax.Array,
    eshift: jax.Array,
    bp_ix=None,
    ham=None,
) -> WalkerState:
    """One phaseless step for the whole population.

    Reference: ``continuous.py:232-292`` (propagate_walker_phaseless +
    update_weight_hybrid). Walkers with negligible weight are frozen
    (``afqmc.py:232-233`` skips them) via a final select, which also keeps
    NaNs from dead walkers out of the state.
    """
    inner = prop.inner
    ga, gb, log_o = trial_greens(trial, state.phia, state.phib)

    if prop.stochastic_ri:
        key, kbh = jax.random.split(key)
    else:
        kbh = key
    bh1_first, bh1_second = _half_steps(prop, kbh)
    phia, phib = bh1_first(state.phia, state.phib)
    fac = two_body_factors(prop, trial, ga, gb, key, state.nwalkers)
    phia, phib = inner.apply_vhs(phia, phib, fac.xshifted)
    phia, phib = bh1_second(phia, phib)

    log_o_new = trial_log_overlap(trial, phia, phib)

    # Weight update (continuous.py:264-318). The 2*pi*i branch ambiguity of
    # the log-ratio only shifts dtheta by full turns, leaving cos(dtheta)
    # and |I| unchanged.
    dt = prop.dt
    log_ratio = log_o_new - log_o
    ehyb = -(log_ratio + fac.cfb + fac.cmf) / dt
    if prop.hybrid:
        ehyb = _bound_hybrid(ehyb, eshift, prop.ebound)
        log_imp = -dt * (0.5 * (ehyb + state.hybrid_energy) - eshift)
        magn = jnp.exp(log_imp.real)
        dtheta = (-dt * ehyb - fac.cfb).imag
    else:
        # Local-energy update (continuous.py:294-318): magnitude from the
        # bounded local energy, cosine from the overlap-ratio phase.
        from pauxy_tpu.estimators import mixed as mixed_mod

        assert ham is not None, "local-energy weight update needs ham"
        if ga.Ghalf is None:
            eloc = mixed_mod.energy_estimator_G(ham, trial)(ga.G, gb.G)[0]
        else:
            eloc = mixed_mod.energy_estimator(ham, trial)(ga, gb)[0]
        re_eloc = _bound_hybrid(eloc, eshift, prop.ebound)
        magn = jnp.exp(-0.5 * dt * (re_eloc + state.eloc - eshift).real)
        log_imp = jnp.zeros_like(log_ratio)
        dtheta = log_ratio.imag
        ehyb = state.hybrid_energy
        state = state.replace(eloc=eloc)
    cosine_fac = jnp.maximum(0.0, jnp.cos(dtheta))
    weight = state.weight * magn * cosine_fac
    weight = jnp.where(jnp.isfinite(weight), weight, 0.0)

    alive = jnp.abs(state.weight) > 1e-8

    def sel(new, old):
        shape = (slice(None),) + (None,) * (new.ndim - 1)
        return jnp.where(alive[shape], new, old)

    updates = dict(
        phia=sel(phia, state.phia),
        phib=sel(phib, state.phib),
        weight=sel(weight, state.weight),
        log_ovlp=sel(log_o_new, state.log_ovlp),
        hybrid_energy=sel(ehyb, state.hybrid_energy),
    )
    if state.configs is not None and bp_ix is not None:
        # Record (x - xbar) and the phase/cosine weight factors for back
        # propagation (continuous.py:284-289 + walkers/stack.py:51-77).
        ok = magn > 1e-16
        phase_fac = jnp.where(ok, jnp.exp(1j * log_imp.imag), 0.0)
        cos_rec = jnp.where(ok, cosine_fac, 0.0)
        updates["configs"] = state.configs.at[:, bp_ix, :].set(
            sel(fac.xshifted, state.configs[:, bp_ix, :])
        )
        updates["weight_fac"] = state.weight_fac.at[:, bp_ix].set(
            sel(phase_fac.astype(state.weight_fac.dtype),
                state.weight_fac[:, bp_ix])
        )
        updates["cos_fac"] = state.cos_fac.at[:, bp_ix].set(
            sel(cos_rec, state.cos_fac[:, bp_ix])
        )
    return state.replace(**updates)


def propagate_free(
    prop: Continuous,
    trial,
    state: WalkerState,
    key: jax.Array,
    eshift: jax.Array,
) -> WalkerState:
    """One free-projection step (no force bias, no phaseless constraint).

    Weight carries |exp(cmf + dt*eshift)|, phase its argument
    (``continuous.py:175-199``).
    """
    inner = prop.inner
    ga, gb, _ = trial_greens(trial, state.phia, state.phib)

    if prop.stochastic_ri:
        key, kbh = jax.random.split(key)
    else:
        kbh = key
    bh1_first, bh1_second = _half_steps(prop, kbh)
    phia, phib = bh1_first(state.phia, state.phib)
    fac = two_body_factors(prop, trial, ga, gb, key, state.nwalkers)
    phia, phib = inner.apply_vhs(phia, phib, fac.xshifted)
    phia, phib = bh1_second(phia, phib)

    log_o_new = trial_log_overlap(trial, phia, phib)
    arg = fac.cmf + prop.dt * eshift
    magn = jnp.exp(arg.real)
    phase = jnp.exp(1j * arg.imag)
    return state.replace(
        phia=phia,
        phib=phib,
        weight=state.weight * magn,
        phase=state.phase * phase.astype(state.phase.dtype),
        log_ovlp=log_o_new,
    )


def propagate(prop: Continuous, trial, state, key, eshift):
    if prop.free_projection:
        return propagate_free(prop, trial, state, key, eshift)
    return propagate_phaseless(prop, trial, state, key, eshift)
