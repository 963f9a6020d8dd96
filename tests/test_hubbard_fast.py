"""Lanes-layout fast block vs the generic fused block: same physics.

The fast path consumes the identical RNG stream and follows the identical
step schedule, so every output row must agree to float tolerance (x64 on
CPU -> very tight).
"""

import os

import numpy as np
import pytest

from pauxy_tpu.models import make_hubbard, free_electron_trial
from pauxy_tpu.qmc import AFQMC, QMCOpts


def run(tmp_path, tag, fast: bool, **kw):
    os.environ["PAUXY_TPU_FAST"] = "1" if fast else "0"
    try:
        ham = make_hubbard(nup=kw.get("nup", 7), ndown=kw.get("ndown", 7),
                           U=4.0, nx=4, ny=4, ktwist=kw.get("ktwist"))
        trial = free_electron_trial(ham)
        qmc = QMCOpts(
            nwalkers=kw.get("nwalkers", 24), dt=0.01, nsteps=10, nblocks=4,
            nstblz=5, npop_control=kw.get("npop_control", 2), rng_seed=8,
            pop_control_method=kw.get("pop_method", "comb"),
        )
        af = AFQMC(
            ham, trial, qmc,
            propagator_options=kw.get("popts"),
            estimator_options={"mixed": {"energy_eval_freq":
                                         kw.get("eef", 1)}},
            filename=str(tmp_path / f"{tag}.h5"),
        )
        if fast:
            assert af.use_fast_block, "fast path should be eligible here"
        rows = af.run()
        return rows
    finally:
        os.environ.pop("PAUXY_TPU_FAST", None)


@pytest.mark.parametrize("pop_method", ["comb", "pair_branch"])
def test_fast_block_matches_generic(tmp_path, pop_method):
    r1 = run(tmp_path, f"gen_{pop_method}", False, pop_method=pop_method)
    r2 = run(tmp_path, f"fast_{pop_method}", True, pop_method=pop_method)
    np.testing.assert_allclose(r1[:, 1:10].real, r2[:, 1:10].real,
                               rtol=1e-8, atol=1e-10)


def test_fast_block_matches_generic_twist_spin(tmp_path):
    """Complex hopping (twist) + spin decomposition + unequal spins."""
    kw = dict(ktwist=[0.02, -0.01], nup=7, ndown=6,
              popts={"charge_decomposition": False})
    r1 = run(tmp_path, "gen_tw", False, **kw)
    r2 = run(tmp_path, "fast_tw", True, **kw)
    np.testing.assert_allclose(r1[:, 1:10].real, r2[:, 1:10].real,
                               rtol=1e-8, atol=1e-10)


def test_fast_block_matches_generic_no_force_bias(tmp_path):
    kw = dict(popts={"force_bias": False}, eef=2, npop_control=3)
    r1 = run(tmp_path, "gen_nfb", False, **kw)
    r2 = run(tmp_path, "fast_nfb", True, **kw)
    np.testing.assert_allclose(r1[:, 1:10].real, r2[:, 1:10].real,
                               rtol=1e-8, atol=1e-10)


def test_fast_block_ineligible_paths_fall_back(tmp_path):
    """BP on -> generic block (fast path silently disabled)."""
    ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
    trial = free_electron_trial(ham)
    qmc = QMCOpts(nwalkers=8, dt=0.01, nsteps=10, nblocks=2, nstblz=5,
                  npop_control=2, rng_seed=8)
    af = AFQMC(
        ham, trial, qmc,
        estimator_options={
            "mixed": {"energy_eval_freq": 1},
            "back_propagation": {"tau_bp": 0.05},
        },
        filename=str(tmp_path / "bp.h5"),
    )
    assert not af.use_fast_block
    rows = af.run()
    assert np.isfinite(rows.real).all()


def test_fast_block_pallas_greens_matches_xla(tmp_path):
    """The VMEM greens kernel (interpret mode) inside the fast block is
    trajectory-equal to the unrolled-XLA lanes path."""
    import jax
    import jax.numpy as jnp

    from pauxy_tpu.models import make_hubbard, free_electron_trial
    from pauxy_tpu.qmc import hubbard_fast as hf
    from pauxy_tpu.utils.transfer import device_zeros
    from pauxy_tpu.walkers import init_walkers

    ham = make_hubbard(nup=7, ndown=7, U=4.0, nx=4, ny=4)
    trial = free_electron_trial(ham)
    from pauxy_tpu.propagation import continuous
    from pauxy_tpu.propagation.hubbard import make_hubbard_continuous

    inner = make_hubbard_continuous(ham, trial, 0.01)
    prop = continuous.Continuous(inner=inner, dt=0.01)
    state = init_walkers(trial, 24, total_weight=24.0)
    eshift = device_zeros((), state.log_ovlp.dtype)
    kw = dict(nsteps=10, nstblz=5, npop_control=2, pop_method="comb",
              target_weight=24.0, energy_eval_freq=1)
    s1, a1 = hf.run_block_lanes(ham, trial, prop, state, jax.random.key(3),
                                eshift, jnp.asarray(0, jnp.int32),
                                greens_impl="xla", **kw)
    s2, a2 = hf.run_block_lanes(ham, trial, prop, state, jax.random.key(3),
                                eshift, jnp.asarray(0, jnp.int32),
                                greens_impl="pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1.weight), np.asarray(s2.weight),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(jnp.abs(s1.phia)),
                               np.asarray(jnp.abs(s2.phia)), atol=1e-9)


@pytest.mark.unit
def test_greens_pallas_fori_loop_large_lattice():
    """Lattices beyond UNROLL_MAX_M sites run the fori_loop kernel body
    (the unrolled program's code size is O(m*n) and wedged Mosaic compiles
    at 8x8+); math must match numpy on both sides of the threshold, and
    the VMEM guard must route oversized problems to XLA."""
    import jax.numpy as jnp

    from pauxy_tpu.ops.greens_pallas import (UNROLL_MAX_M,
                                             greens_lanes_pallas, vmem_ok)

    rng = np.random.default_rng(5)
    for m, n in [(16, 7), (36, 18), (64, 24)]:
        w = 8
        psi = (rng.normal(size=(m, n))
               + 1j * rng.normal(size=(m, n))).astype(np.complex64)
        phi = 0.3 * (rng.normal(size=(m, n, w)) + 1j * rng.normal(
            size=(m, n, w))).astype(np.complex64) + psi[:, :, None]
        ld, ght = greens_lanes_pallas(jnp.asarray(psi), jnp.asarray(phi),
                                      interpret=True)
        s = np.einsum("mnw,mk->wnk", phi, psi.conj())
        _, ldref = np.linalg.slogdet(s)
        gh_ref = np.einsum("wni,miw->wnm", np.linalg.inv(s), phi)
        gh = np.transpose(np.asarray(ght), (2, 1, 0))
        assert np.abs(np.asarray(ld).real - ldref).max() < 1e-3
        assert np.abs(gh - gh_ref).max() < 1e-3
        assert vmem_ok(m, n)
    assert UNROLL_MAX_M < 36  # the loop above covered both kernel bodies
    # Oversized: chip-probed (64, 28) aborts the Mosaic compile; 12x12
    # half-filled exceeds VMEM; 10x10 n=50 exceeds the GJ n-budget.
    # fast_greens_impl falls back to 'xla' for these.
    assert not vmem_ok(64, 28)
    assert not vmem_ok(144, 72)
    assert not vmem_ok(100, 50)


@pytest.mark.unit
def test_eligible_classifies_every_propagator_option():
    """Drift catcher for the fast-path gate: every config field of
    Continuous / HubbardContinuous must be classified here as either
    read identically by the lanes block or gated by hubbard_fast.eligible.
    A new propagator option fails this test until its author decides
    which — preventing the fast block from silently running different
    physics than qmc/afqmc.run_block."""
    import dataclasses

    from pauxy_tpu.propagation.continuous import Continuous
    from pauxy_tpu.propagation.hubbard import HubbardContinuous

    continuous_classified = {
        "inner",            # isinstance(HubbardContinuous) gate
        "dt",               # read identically by both block programs
        "free_projection",  # gated: fast path requires False
        "hybrid",           # gated: fast path requires True
        "force_bias",       # supported: lanes force-bias branch
        "stochastic_ri",    # gated: fast path requires False
        "ri_nsamples",      # only meaningful with stochastic_ri
    }
    fields = {f.name for f in dataclasses.fields(Continuous)}
    assert fields == continuous_classified, (
        "Continuous gained/lost config fields; classify them in "
        "hubbard_fast.eligible (gate or support) and update this test: "
        f"{fields ^ continuous_classified}"
    )

    hubbard_classified = {
        "BH1",       # read by the lanes one-body half-step
        "mf_shift",  # read by the lanes force-bias/cmf terms
        "dt",        # read identically
        "U",         # read by the lanes VHS build
        "charge",    # supported: both decompositions in the lanes block
    }
    hfields = {f.name for f in dataclasses.fields(HubbardContinuous)}
    assert hfields == hubbard_classified, (
        "HubbardContinuous gained/lost config fields; classify them for "
        "the lanes fast block and update this test: "
        f"{hfields ^ hubbard_classified}"
    )
