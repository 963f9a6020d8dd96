"""FCI validation-module tests (mirrors pauxy/estimators/tests/test_ci.py)."""

import os
import sys

import numpy as np
import pytest

from pauxy_tpu.estimators import ci
from pauxy_tpu.models import make_generic, make_hubbard
from pauxy_tpu.utils.testing import generate_hamiltonian

HAVE_REF = os.path.isdir("/root/reference/pauxy")
if HAVE_REF:
    sys.path.insert(0, "/root/reference")


@pytest.mark.unit
def test_hubbard_dimer_exact():
    """2-site Hubbard at half filling: E0 = (U - sqrt(U^2 + 16 t^2))/2."""
    # Note: nx=2 with PBC doubles the hopping bond (wrap + direct), so use
    # open boundaries for the textbook dimer.
    ham = make_hubbard(nup=1, ndown=1, U=4.0, nx=2, ny=1, xpbc=False)
    e, _, _ = ci.simple_fci(ham)
    t = 1.0
    exact = 0.5 * (4.0 - np.sqrt(16.0 + 16.0 * t ** 2))
    assert e[0] == pytest.approx(exact, abs=1e-10)


@pytest.mark.unit
def test_fci_vs_reference_hubbard():
    if not HAVE_REF:
        pytest.skip("no reference")
    from pauxy.estimators.ci import simple_fci as ref_fci
    from pauxy.systems.hubbard import Hubbard as RefHubbard

    sys_ref = RefHubbard(
        {"nx": 3, "ny": 1, "nup": 2, "ndown": 1, "U": 4.0, "ktwist": [0.0]}
    )
    (eref, _) = ref_fci(sys_ref)
    ham = make_hubbard(nup=2, ndown=1, U=4.0, nx=3, ny=1)
    e, _, _ = ci.simple_fci(ham, nroots=4)
    np.testing.assert_allclose(e[:4], np.asarray(eref)[:4], atol=1e-10)


@pytest.mark.unit
def test_fci_vs_reference_generic():
    if not HAVE_REF:
        pytest.skip("no reference")
    from pauxy.estimators.ci import simple_fci as ref_fci

    h1e, chol, enuc, eri = generate_hamiltonian(4, (2, 1), seed=9)
    ham = make_generic((2, 1), h1e, chol, 0.0)

    class S:
        pass

    s = S()
    s.nup, s.ndown, s.nbasis = 2, 1, 4
    s.H1 = np.stack([h1e, h1e])
    s.ecore = 0.0

    def hijkl(i, j, k, l):
        # reference convention: hijkl(i,j,k,l) = <ij|kl> = (ik|jl)
        return eri[i, k, j, l]

    s.hijkl = hijkl
    eref, _ = ref_fci(s)
    e, _, _ = ci.simple_fci(ham, nroots=3)
    np.testing.assert_allclose(e[:3], np.asarray(eref)[:3], atol=1e-8)


@pytest.mark.driver
def test_free_projection_converges_to_fci(tmp_path):
    """Free-projection AFQMC on a tiny Hubbard lattice approaches the FCI
    ground state (the reference's strongest physics check)."""
    from pauxy_tpu.models.trial import free_electron_trial
    from pauxy_tpu.qmc import AFQMC, QMCOpts

    ham = make_hubbard(nup=2, ndown=2, U=4.0, nx=4, ny=1)
    e_fci, _, _ = ci.simple_fci(ham)
    trial = free_electron_trial(ham)
    qmc = QMCOpts(nwalkers=400, dt=0.01, nsteps=25, nblocks=10, nstblz=5,
                  npop_control=1000000, rng_seed=4)
    af = AFQMC(
        ham, trial, qmc,
        propagator_options={"free_projection": True},
        estimator_options={"mixed": {"energy_eval_freq": 5}},
        filename=str(tmp_path / "fp.h5"),
    )
    rows = af.run()
    # Projected energy Re(<psi_T|H|phi>/<psi_T|phi>) at late tau.
    e_fp = rows[-1, 5].real
    assert abs(e_fp - e_fci[0]) < 0.05, (e_fp, e_fci[0])


@pytest.mark.unit
def test_bose_fermi_fci_vs_reference_pinned():
    """Hubbard-Holstein bose-fermi FCI against the reference's pinned
    ground-state energies (``pauxy/estimators/tests/test_ci.py:19-52``)."""
    from pauxy_tpu.estimators.ci import simple_fci_bose_fermi
    from pauxy_tpu.models.hubbard_holstein import make_hubbard_holstein

    ham = make_hubbard_holstein(nup=1, ndown=1, U=0.0, nx=2, ny=1,
                                w0=0.8, lmbda=0.5)
    e, _, _ = simple_fci_bose_fermi(ham, nboson_max=20)
    assert e[0] == pytest.approx(-6.232530237466693, abs=1e-8)

    ham = make_hubbard_holstein(nup=1, ndown=1, U=4.0, nx=3, ny=1,
                                w0=0.8, lmbda=0.5)
    e, _, _ = simple_fci_bose_fermi(ham, nboson_max=12)
    assert e[0] == pytest.approx(-4.642361166625703, abs=1e-5)
