"""pyscf integration: dump molecular integrals + trial wavefunctions.

Counterpart of ``pauxy/utils/from_pyscf.py:22-651`` (dump_pauxy,
generate_integrals, chunked Cholesky, frozen core, ortho-AO) and
``tools/pyscf/pyscf_to_pauxy.py``. pyscf is an optional dependency — every
entry point degrades with a clear error when it is absent (this image ships
without pyscf; the module is exercised indirectly through
:func:`cholesky_from_eri`, which is pure numpy).
"""

from __future__ import annotations

import numpy as np

try:
    from pyscf import ao2mo, lib, scf  # noqa: F401

    HAVE_PYSCF = True
except ImportError:
    HAVE_PYSCF = False


def _require_pyscf():
    if not HAVE_PYSCF:
        raise ImportError(
            "pyscf is not installed in this environment; generate a QMCPACK "
            "integral file elsewhere (utils/qmcpack.write_hamiltonian) or "
            "use an FCIDUMP (utils/qmcpack.fcidump_to_system)."
        )


def cholesky_from_eri(eri: np.ndarray, tol: float = 1e-6) -> np.ndarray:
    """Pivoted Cholesky of a dense (pq|rs) ERI tensor -> L[p, q, x].

    Pure numpy; the molecular analogue of the reference's chunked AO
    Cholesky (``from_pyscf.py:286-394``) for the incore case.
    """
    from pauxy_tpu.utils.qmcpack import modified_cholesky

    m = eri.shape[0]
    chol = modified_cholesky(eri.reshape(m * m, m * m), tol=tol)
    return chol.reshape(m, m, -1)


def generate_integrals(mol, hcore, X, chol_cut: float = 1e-5):
    """MO-basis h1e + Cholesky vectors from a pyscf molecule
    (``from_pyscf.py:154-193``)."""
    _require_pyscf()
    h1e = X.conj().T @ hcore @ X
    eri = ao2mo.restore(1, ao2mo.kernel(mol, X), X.shape[1])
    chol = cholesky_from_eri(np.asarray(eri), tol=chol_cut)
    return h1e, chol


def dump_pauxy(
    chkfile: str | None = None,
    mol=None,
    mf=None,
    outfile: str = "afqmc.h5",
    chol_cut: float = 1e-5,
    ortho_ao: bool = False,
    wfn_file: str = "wfn.h5",
):
    """chkfile / SCF object -> QMCPACK integral file + trial wavefunction
    (``from_pyscf.py:22-152`` + ``tools/pyscf/pyscf_to_pauxy.py``)."""
    _require_pyscf()
    from pauxy_tpu.utils import qmcpack, wavefunction

    if mf is None:
        assert chkfile is not None
        mol = lib.chkfile.load_mol(chkfile)
        mf = scf.RHF(mol)
        mf.__dict__.update(lib.chkfile.load(chkfile, "scf"))
    mol = mf.mol
    hcore = mf.get_hcore()
    if ortho_ao:
        s = mf.get_ovlp()
        x = get_ortho_ao(s)
    else:
        x = np.asarray(mf.mo_coeff)
    h1e, chol = generate_integrals(mol, hcore, x, chol_cut=chol_cut)
    nelec = mol.nelec
    qmcpack.write_hamiltonian(
        h1e, chol, nelec, ecore=float(mol.energy_nuc()), filename=outfile
    )
    # RHF trial in the basis used for the integrals.
    nmo = h1e.shape[-1]
    psi = np.eye(nmo)[:, : nelec[0] + nelec[1]]
    if ortho_ao:
        c = np.linalg.inv(x) @ np.asarray(mf.mo_coeff)
        psi = np.hstack([c[:, : nelec[0]], c[:, : nelec[1]]])
    wavefunction.write_wavefunction(psi, wfn_file)
    return outfile, wfn_file


def get_ortho_ao(s: np.ndarray, lindep: float = 0.0) -> np.ndarray:
    """Symmetric (Loewdin) orthogonalization X = S^{-1/2}
    (``from_pyscf.py:632-651``). Pure numpy."""
    sdiag, u = np.linalg.eigh(s)
    keep = sdiag > lindep
    return (u[:, keep] / np.sqrt(sdiag[keep])) @ u[:, keep].conj().T


def core_contribution_cholesky(chol, g):
    """Per-spin core Fock contributions hc_s = J(G_s) - K(G_s)/2 from the
    Cholesky factors (``pauxy/estimators/generic.py:443-456``).

    chol: [M, M, X]; g: [2, M, M] core density matrices.
    """
    out = []
    for gs in np.asarray(g):
        x = np.einsum("pqx,pq->x", chol, gs, optimize=True)
        j = np.einsum("pqx,x->pq", chol, x, optimize=True)
        t = np.einsum("pqx,pm->qmx", chol, gs, optimize=True)
        k = np.einsum("qmx,qnx->mn", t, chol, optimize=True)
        out.append(j - 0.5 * k)
    return out[0], out[1]


def freeze_core(h1e, chol, ecore, nc: int, ncas: int, verbose: bool = False):
    """Fold ``nc`` doubly-occupied core orbitals into the one-body part and
    the core energy, keeping an ``ncas``-orbital active space
    (``pauxy/utils/from_pyscf.py:195-220``).

    h1e [M, M] (spin-restricted), chol [M, M, X].
    Returns (h1e_active [2, ncas, ncas], chol_active [ncas, ncas, X],
    ecore_frozen).
    """
    h1e = np.asarray(h1e)
    chol = np.asarray(chol)
    m = h1e.shape[-1]
    gcore = np.zeros((m, m))
    gcore[np.arange(nc), np.arange(nc)] = 1.0
    hc_a, hc_b = core_contribution_cholesky(chol, [gcore, gcore])
    # Core energy: 2 sum_c h_cc + sum_cc' [2 (cc|c'c') - (cc'|c'c)].
    e1 = 2.0 * np.trace(h1e[:nc, :nc])
    e2 = float(np.sum(gcore * (hc_a + hc_b)))
    ecore_frozen = ecore + e1 + e2
    h1_act = np.stack([h1e + 2 * hc_a, h1e + 2 * hc_b])[
        :, nc : nc + ncas, nc : nc + ncas
    ]
    chol_act = chol[nc : nc + ncas, nc : nc + ncas, :]
    if verbose:
        print(f" # Number of active orbitals: {ncas}")
        print(f" # Freezing {2 * nc} core electrons and "
              f"{m - nc - ncas} virtuals.")
        print(f" # Frozen core energy : {ecore_frozen:13.8e}")
    return h1_act, chol_act, float(ecore_frozen)
