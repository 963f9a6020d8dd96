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
