"""Finite-temperature trial density matrices.

TPU-native counterpart of ``pauxy/trial_density_matrices/onebody.py:15-114``
(OneBody), ``chem_pot.py:7-67`` (bisection chemical-potential search) and
``mean_field.py:14-94`` (thermal HF). All setup is host-side numpy/scipy;
what reaches the device is the slice propagator B_T (including e^{dt mu})
and its inverse, plus precomputed within-bin left partial products.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import scipy.linalg
from flax import struct

from pauxy_tpu import config
from pauxy_tpu.estimators.thermal import (
    one_rdm_stable_host,
    particle_number_host,
)


@struct.dataclass
class OneBodyTrial:
    """rho_T = prod exp(-dt (H1 - mu N)) trial density matrix (pytree)."""

    dmat: Any              # [2, M, M] B_T for one slice (incl. mu factor)
    dmat_inv: Any          # [2, M, M]
    # left_table[c] = B_T^{stack_size - 1 - c}: the remaining trial part of
    # the active bin after c+1 propagator applications (stack.py:299-325's
    # deterministic `left` factors, precomputed since they are
    # walker-independent).
    left_table: Any        # [stack_size, 2, M, M]
    bin_full: Any          # [2, M, M] = B_T^{stack_size} (fresh bin value)
    mu: float = struct.field(pytree_node=False)
    beta: float = struct.field(pytree_node=False)
    dt: float = struct.field(pytree_node=False)
    num_slices: int = struct.field(pytree_node=False)
    stack_size: int = struct.field(pytree_node=False)
    nav: float = struct.field(pytree_node=False)
    P_host: Any = struct.field(pytree_node=False, default=None)  # HostArray
    G_host: Any = struct.field(pytree_node=False, default=None)
    name: str = struct.field(pytree_node=False, default="one_body")

    @property
    def nbins(self) -> int:
        return self.num_slices // self.stack_size

    @property
    def nbasis(self) -> int:
        return self.dmat.shape[-1]


def find_chemical_potential(
    rho_dtau: np.ndarray,
    dtau: float,
    num_bins: int,
    target: float,
    deps: float = 1e-6,
    max_it: int = 1000,
    sign: int = 1,
) -> float:
    """Bracket + bisect mu so that <N>(mu) = target (chem_pot.py:7-61)."""

    def nav(mu):
        rho_mu = rho_dtau * np.exp(sign * dtau * mu)
        return particle_number_host(one_rdm_stable_host(rho_mu, num_bins))

    mu1, mu2 = -1.0, 1.0
    d1, d2 = nav(mu1) - target, nav(mu2) - target
    while np.sign(d1) * np.sign(d2) > 0:
        mu1 -= 2
        mu2 += 2
        d1, d2 = nav(mu1) - target, nav(mu2) - target
        if mu2 > 200:
            raise RuntimeError("chemical potential bracket not found")
    for _ in range(max_it):
        mu = 0.5 * (mu1 + mu2)
        d = nav(mu) - target
        if abs(d) < deps:
            return mu
        if d * d1 > 0:
            mu1, d1 = mu, d
        else:
            mu2, d2 = mu, d
    raise RuntimeError("chemical potential bisection did not converge")


def make_one_body_trial(
    ham,
    beta: float,
    dt: float,
    mu: float | None = None,
    nav: float | None = None,
    stack_size: int | None = None,
    deps: float = 1e-6,
    precision=None,
    alt_convention: bool = False,
) -> OneBodyTrial:
    """Build the OneBody trial (onebody.py:17-114)."""
    prec = config.get_precision(precision)
    from pauxy_tpu.utils.transfer import HostArray, to_device

    h1 = np.asarray(getattr(ham, "H1", None) if hasattr(ham, "H1") else ham.T)
    dmat = np.stack(
        [scipy.linalg.expm(-dt * h1[0]), scipy.linalg.expm(-dt * h1[1])]
    )
    num_slices = int(round(beta / dt))
    if stack_size is None:
        # cond(BT)^stack <= 1e3 heuristic (onebody.py:56-71).
        cond = np.linalg.cond(dmat[0])
        stack_size = max(1, min(num_slices, int(3.0 / np.log10(cond))))
    while num_slices % stack_size != 0:
        stack_size -= 1
    num_bins = num_slices // stack_size
    dtau = stack_size * dt
    sign = -1 if alt_convention else 1

    rho = np.stack(
        [scipy.linalg.expm(-dtau * h1[0]), scipy.linalg.expm(-dtau * h1[1])]
    )
    if mu is None:
        target = nav if nav is not None else (ham.nup + ham.ndown)
        mu = find_chemical_potential(
            rho, dtau, num_bins, target, deps=deps, sign=sign
        )

    rho_mu = rho * np.exp(sign * dtau * mu)
    p = one_rdm_stable_host(rho_mu, num_bins)
    nav_actual = particle_number_host(p)
    g = np.stack([np.eye(ham.nbasis) - p[0].T, np.eye(ham.nbasis) - p[1].T])

    dmat_mu = dmat * np.exp(sign * dt * mu)
    dmat_inv = np.stack(
        [scipy.linalg.inv(dmat_mu[0]), scipy.linalg.inv(dmat_mu[1])]
    )
    # Precompute B_T powers for the within-bin left factors.
    powers = [np.stack([np.eye(ham.nbasis)] * 2)]
    for _ in range(stack_size):
        powers.append(
            np.stack([dmat_mu[0] @ powers[-1][0], dmat_mu[1] @ powers[-1][1]])
        )
    left_table = np.stack(
        [powers[stack_size - 1 - c] for c in range(stack_size)]
    )
    cdtype = prec.cplx
    return OneBodyTrial(
        dmat=to_device(dmat_mu.astype(cdtype)),
        dmat_inv=to_device(dmat_inv.astype(cdtype)),
        left_table=to_device(left_table.astype(cdtype)),
        bin_full=to_device(powers[stack_size].astype(cdtype)),
        mu=float(mu),
        beta=float(beta),
        dt=float(dt),
        num_slices=num_slices,
        stack_size=int(stack_size),
        nav=float(np.real(nav_actual)),
        P_host=HostArray(p),
        G_host=HostArray(g),
    )
