"""Finite-temperature AFQMC tests.

Exact oracle: at U=0 the thermal AFQMC has no auxiliary-field noise in the
determinant ratio structure (VHS ~ U=0 vanishes for Hubbard charge HS), so
energies and particle number must equal the exact grand-canonical free
fermion results at every step.
"""

import numpy as np
import pytest
import scipy.linalg

from pauxy_tpu.models import make_hubbard, make_ueg
from pauxy_tpu.models.thermal_trial import make_one_body_trial
from pauxy_tpu.qmc import QMCOpts
from pauxy_tpu.qmc.thermal_afqmc import ThermalAFQMC


def exact_free_fermions(h, beta, mu):
    evals = np.linalg.eigvalsh(h)
    occ = 1.0 / (np.exp(beta * (evals - mu)) + 1.0)
    return 2 * np.sum(evals * occ), 2 * occ.sum()  # (E, N) both spins


@pytest.mark.unit
def test_one_body_trial_mu_search():
    ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
    beta, dt = 1.0, 0.05
    trial = make_one_body_trial(ham, beta, dt)
    # <N>(mu) hit the target electron number.
    assert trial.nav == pytest.approx(6.0, abs=1e-4)
    # Trial P equals the exact Fermi 1-RDM for the one-body Hamiltonian.
    e_exact, n_exact = exact_free_fermions(np.asarray(ham.T[0]), beta, trial.mu)
    p = trial.P_host.arr
    assert (p[0].trace() + p[1].trace()).real == pytest.approx(n_exact, abs=1e-6)
    ke = np.sum(np.asarray(ham.T[0]) * p[0].T) + np.sum(
        np.asarray(ham.T[1]) * p[1].T
    )
    # note P_ij = <c_i^dag c_j>, ke = sum_ij h_ij <c_i^dag c_j> = sum h * P
    ke2 = np.einsum("ij,sij->", np.asarray(ham.T[0]), p).real
    assert ke2 == pytest.approx(e_exact, abs=1e-6)


@pytest.mark.unit
def test_trial_vs_reference_onebody():
    import os, sys

    if not os.path.isdir("/root/reference/pauxy"):
        pytest.skip("no reference")
    sys.path.insert(0, "/root/reference")
    from pauxy.trial_density_matrices.onebody import OneBody as RefOneBody
    from pauxy.systems.hubbard import Hubbard as RefHubbard

    sys_ref = RefHubbard(
        {"nx": 3, "ny": 3, "nup": 3, "ndown": 3, "U": 4.0, "ktwist": [0.0, 0.0]}
    )
    ref = RefOneBody(sys_ref, beta=0.5, dt=0.05)
    ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
    mine = make_one_body_trial(ham, 0.5, 0.05)
    assert mine.mu == pytest.approx(ref.mu, abs=2e-5)
    assert mine.nav == pytest.approx(ref.nav.real, abs=1e-4)
    assert mine.stack_size == ref.stack_size
    np.testing.assert_allclose(
        np.asarray(mine.dmat).real, ref.dmat.real, atol=1e-7
    )
    np.testing.assert_allclose(mine.P_host.arr.real, ref.P.real, atol=1e-6)


@pytest.mark.driver
def test_thermal_free_fermions_exact(tmp_path):
    """U=0: every block must reproduce the exact grand-canonical E and N."""
    ham = make_hubbard(nup=3, ndown=3, U=0.0, nx=3, ny=3)
    beta, dt = 1.0, 0.05
    trial = make_one_body_trial(ham, beta, dt)
    qmc = QMCOpts(nwalkers=4, dt=dt, nsteps=1, nblocks=2, beta=beta,
                  npop_control=5, rng_seed=3)
    af = ThermalAFQMC(ham, trial, qmc, filename=str(tmp_path / "t.h5"))
    rows = af.run()
    e_exact, n_exact = exact_free_fermions(np.asarray(ham.T[0]), beta, trial.mu)
    for row in rows:
        assert row[5].real == pytest.approx(e_exact, abs=1e-5)
        assert row[10].real == pytest.approx(n_exact, abs=1e-6)


@pytest.mark.driver
def test_thermal_hubbard_interacting(tmp_path):
    """U=4 3x3: stable run, sensible Nav, energy between U=0 and atomic
    limits."""
    ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
    beta, dt = 0.5, 0.05
    trial = make_one_body_trial(ham, beta, dt)
    qmc = QMCOpts(nwalkers=24, dt=dt, nsteps=1, nblocks=10, beta=beta,
                  npop_control=2, rng_seed=7)
    af = ThermalAFQMC(ham, trial, qmc, filename=str(tmp_path / "u4.h5"))
    rows = af.run()
    assert np.isfinite(rows.real).all()
    nav = rows[:, 10].real.mean()
    # mu was tuned for the non-interacting system; interaction shifts <N>
    # but it must stay in a physical window.
    assert 3.0 < nav < 9.0
    et = rows[:, 5].real.mean()
    assert -15.0 < et < 20.0


@pytest.mark.driver
def test_thermal_hubbard_vs_reference_golden(tmp_path):
    """3x3 Hubbard U=4, beta=0.5, mu=0.9 (trial and propagator): statistical
    agreement with a 60-block serial reference run."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data",
                        "thermal_hubbard3x3.npz")
    if not os.path.exists(path):
        pytest.skip("golden data missing")
    g = np.load(path)
    ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
    trial = make_one_body_trial(ham, float(g["beta"]), float(g["dt"]),
                                mu=float(g["mu"]))
    qmc = QMCOpts(nwalkers=int(g["nwalkers"]), dt=float(g["dt"]), nsteps=1,
                  nblocks=60, beta=float(g["beta"]), npop_control=2,
                  rng_seed=8)
    af = ThermalAFQMC(ham, trial, qmc, filename=str(tmp_path / "g.h5"))
    rows = af.run()
    et, nav = rows[1:, 5].real, rows[1:, 10].real
    ref_e, ref_n = np.asarray(g["etotal"])[1:], np.asarray(g["nav"])[1:]
    se_e = np.hypot(et.std(ddof=1) / np.sqrt(len(et)),
                    ref_e.std(ddof=1) / np.sqrt(len(ref_e)))
    se_n = np.hypot(nav.std(ddof=1) / np.sqrt(len(nav)),
                    ref_n.std(ddof=1) / np.sqrt(len(ref_n)))
    assert abs(et.mean() - ref_e.mean()) < max(4 * se_e, 0.05), (
        et.mean(), ref_e.mean(), se_e)
    assert abs(nav.mean() - ref_n.mean()) < max(4 * se_n, 0.02), (
        nav.mean(), ref_n.mean(), se_n)


@pytest.mark.driver
def test_thermal_ueg_runs(tmp_path):
    """Thermal UEG end-to-end (reference regression family:
    test_thermal_afqmc.py rs=1, beta=0.5, mu=0.245)."""
    ham = make_ueg(nup=1, ndown=1, rs=1.0, ecut=0.5)
    beta, dt = 0.25, 0.025
    trial = make_one_body_trial(ham, beta, dt, mu=0.245)
    qmc = QMCOpts(nwalkers=8, dt=dt, nsteps=1, nblocks=3, beta=beta,
                  npop_control=2, rng_seed=7)
    af = ThermalAFQMC(ham, trial, qmc, filename=str(tmp_path / "ueg.h5"))
    rows = af.run()
    assert np.isfinite(rows.real).all()
    assert (rows[:, 10].real > 0).all()


@pytest.mark.unit
def test_mean_field_trial():
    """THF trial: for U=0 it must coincide with the OneBody trial; for U>0
    the Fock matrix shifts mu and the target <N> is still met."""
    from pauxy_tpu.models.thermal_trial import (
        make_mean_field_trial,
        make_one_body_trial,
    )

    ham0 = make_hubbard(nup=2, ndown=2, U=0.0, nx=2, ny=2)
    mf = make_mean_field_trial(ham0, 0.5, 0.05)
    ob = make_one_body_trial(ham0, 0.5, 0.05)
    assert mf.mu == pytest.approx(ob.mu, abs=1e-4)
    np.testing.assert_allclose(mf.P_host.arr.real, ob.P_host.arr.real,
                               atol=1e-5)

    ham = make_hubbard(nup=2, ndown=2, U=4.0, nx=2, ny=2)
    mf4 = make_mean_field_trial(ham, 0.5, 0.05)
    assert mf4.nav == pytest.approx(4.0, abs=1e-3)
    assert mf4.mu != pytest.approx(mf.mu, abs=0.05)  # U shifted mu


@pytest.mark.driver
def test_thermal_with_mean_field_trial(tmp_path):
    from pauxy_tpu.models.thermal_trial import make_mean_field_trial

    ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
    trial = make_mean_field_trial(ham, 0.5, 0.05)
    qmc = QMCOpts(nwalkers=12, dt=0.05, nsteps=1, nblocks=3, beta=0.5,
                  npop_control=2, rng_seed=1)
    af = ThermalAFQMC(ham, trial, qmc, filename=str(tmp_path / "mf.h5"))
    rows = af.run()
    assert np.isfinite(rows.real).all()
