"""jaxops.scan: the fori-based accelerator path must match plain lax.scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pauxy_tpu.utils import jaxops


def run_both(f, init, xs, monkeypatch):
    ref = jax.lax.scan(f, init, xs)
    monkeypatch.setattr(jaxops, "_use_plain_scan", lambda: False)
    got = jaxops.scan(f, init, xs)
    monkeypatch.undo()
    return ref, got


@pytest.mark.unit
def test_fori_scan_complex_carry_and_ys(monkeypatch):
    def f(c, x):
        c = c * (1 + 0.1j) + x
        return c, (jnp.abs(c).sum(), c[0])

    init = jnp.ones((3, 4), jnp.complex128)
    xs = jnp.linspace(0, 1, 5)[:, None, None] * jnp.ones((5, 3, 4))
    (cr, yr), (cg, yg) = run_both(f, init, xs, monkeypatch)
    np.testing.assert_allclose(np.asarray(cr), np.asarray(cg), atol=1e-12)
    np.testing.assert_allclose(np.asarray(yr[0]), np.asarray(yg[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(yr[1]), np.asarray(yg[1]), atol=1e-12)


@pytest.mark.unit
def test_fori_scan_none_ys_and_keys(monkeypatch):
    def f(c, k):
        return c + jax.random.normal(k, c.shape), None

    init = jnp.zeros(4)
    keys = jax.random.split(jax.random.key(0), 3)
    (cr, yr), (cg, yg) = run_both(f, init, keys, monkeypatch)
    np.testing.assert_allclose(np.asarray(cr), np.asarray(cg), atol=1e-12)
    assert yr is None and yg is None


@pytest.mark.unit
def test_fori_scan_pytree_state(monkeypatch):
    from pauxy_tpu.models import make_hubbard, free_electron_trial
    from pauxy_tpu.walkers import init_walkers, state as ws

    ham = make_hubbard(nup=2, ndown=2, U=4.0, nx=2, ny=2)
    trial = free_electron_trial(ham)
    state = init_walkers(trial, 4)

    def f(s, x):
        s = ws.orthogonalise(s)
        return s.replace(weight=s.weight * x), jnp.sum(s.weight)

    xs = jnp.asarray([1.0, 2.0, 0.5])
    (sr, yr), (sg, yg) = run_both(f, state, xs, monkeypatch)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yg), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sr.phia), np.asarray(sg.phia),
                               atol=1e-12)
