"""The pallas site-sweep kernel must reproduce the lax.scan sweep exactly.

Reference algorithm: ``pauxy/propagation/hubbard.py:172-220`` (sequential
heat-bath CPMC updates). Both implementations consume the same uniform
draw array, so trajectories agree to float reassociation error.
"""

import numpy as np
import pytest
import jax

from pauxy_tpu.models import make_hubbard, free_electron_trial
from pauxy_tpu.propagation.hirsch import make_hirsch
from pauxy_tpu.walkers.state import init_walkers


@pytest.fixture(scope="module")
def setup():
    ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
    trial = free_electron_trial(ham)
    return ham, trial


def test_auto_selects_pallas_on_real_system(setup):
    ham, trial = setup
    if len(jax.devices()) > 1:
        # Multi-device with no mesh: pallas_call has no SPMD rule, so the
        # auto-pick must fall back to scan...
        assert make_hirsch(ham, trial, 0.05).sweep_kernel == "scan"
        # ...but with a mesh the shard_map-dispatched kernel is eligible.
        from pauxy_tpu.parallel.mesh import walker_mesh

        prop = make_hirsch(ham, trial, 0.05, mesh=walker_mesh())
        assert prop.sweep_kernel == "pallas_interpret"  # CPU backend in tests
    else:
        prop = make_hirsch(ham, trial, 0.05)
        assert prop.sweep_kernel == "pallas_interpret"


def test_auto_falls_back_for_twist():
    ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3,
                       ktwist=[0.01, -0.02])
    trial = free_electron_trial(ham)
    prop = make_hirsch(ham, trial, 0.05)
    assert prop.sweep_kernel == "scan"


def test_auto_falls_back_for_charge_decomposition(setup):
    ham, trial = setup
    prop = make_hirsch(ham, trial, 0.05, charge_decomposition=True)
    assert prop.sweep_kernel == "scan"


def test_sweep_matches_scan(setup):
    ham, trial = setup
    scan = make_hirsch(ham, trial, 0.05, sweep_kernel="scan")
    pal = make_hirsch(ham, trial, 0.05, sweep_kernel="pallas_interpret")
    # 37 walkers: exercises the pad-to-128-lanes path.
    state = init_walkers(trial, 37)
    key = jax.random.key(3)
    s1, f1 = jax.jit(scan._site_sweep)(trial, state, key)
    s2, f2 = jax.jit(pal._site_sweep)(trial, state, key)
    assert (np.asarray(f1) == np.asarray(f2)).all()
    for name in ("phia", "phib", "weight", "log_ovlp"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s2, name)),
            atol=1e-12, err_msg=name,
        )


def test_sweep_matches_scan_multiple_steps(setup):
    """Full propagate (kinetic halves + sweep) iterated: differences must
    stay at machine-epsilon scale, fields identical."""
    ham, trial = setup
    scan = make_hirsch(ham, trial, 0.05, sweep_kernel="scan")
    pal = make_hirsch(ham, trial, 0.05, sweep_kernel="pallas_interpret")
    s1 = init_walkers(trial, 12)
    s2 = s1
    import jax.numpy as jnp

    eshift = jnp.zeros((), s1.log_ovlp.dtype)
    for i in range(5):
        key = jax.random.key(100 + i)
        s1 = jax.jit(scan.propagate)(trial, s1, key, eshift)
        s2 = jax.jit(pal.propagate)(trial, s2, key, eshift)
    np.testing.assert_allclose(
        np.asarray(s1.weight), np.asarray(s2.weight), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(s1.phia), np.asarray(s2.phia), atol=1e-10
    )


def test_unbalanced_spins():
    """na != nb exercises distinct kernel scratch shapes per spin."""
    ham = make_hubbard(nup=4, ndown=2, U=4.0, nx=3, ny=3)
    trial = free_electron_trial(ham)
    scan = make_hirsch(ham, trial, 0.05, sweep_kernel="scan")
    pal = make_hirsch(ham, trial, 0.05, sweep_kernel="pallas_interpret")
    state = init_walkers(trial, 9)
    key = jax.random.key(11)
    s1, f1 = jax.jit(scan._site_sweep)(trial, state, key)
    s2, f2 = jax.jit(pal._site_sweep)(trial, state, key)
    assert (np.asarray(f1) == np.asarray(f2)).all()
    np.testing.assert_allclose(
        np.asarray(s1.weight), np.asarray(s2.weight), atol=1e-12
    )
