"""Pivoted-QR lanes kernel (ops/cpqr_pallas.py) validated in pallas
interpret mode against ops/cpqr._cpqr_xla semantics and numpy identities
(reconstruction a[:, perm] = q @ r, unitarity, upper-triangular r, valid
permutations), including rank-deficient and real-input cases, plus the
auto-dispatch routing in ops/cpqr.cpqr. Mosaic legality on the real chip
is covered by the cpqr cells of tools/axon/kernel_matrix.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from pauxy_tpu.ops import cpqr
from pauxy_tpu.ops.cpqr_pallas import CPQR_MAX_M, cpqr_lanes


def rand_c(rng, *shape):
    return (rng.normal(size=shape)
            + 1j * rng.normal(size=shape)).astype(np.complex64)


def check_factorization(a, q, r, perm, tol=2e-3):
    a, q, r, perm = map(np.asarray, (a, q, r, perm))
    b, m, _ = a.shape
    # Valid permutation per batch element.
    assert perm.shape == (b, m)
    assert (np.sort(perm, axis=-1) == np.arange(m)).all()
    # r strictly upper triangular (below-diagonal exactly zero).
    assert np.abs(np.tril(r, -1)).max() == 0.0
    # q unitary.
    qhq = np.einsum("bmi,bmj->bij", q.conj(), q)
    assert np.abs(qhq - np.eye(m)).max() < tol
    # Reconstruction: a[:, :, perm] = q @ r.
    ap = np.take_along_axis(a, perm[:, None, :], axis=-1)
    assert np.abs(ap - q @ r).max() < tol * max(1.0, np.abs(a).max())
    # Pivoting: |diag r| non-increasing (strong rank-revealing is not
    # guaranteed, monotone diagonal magnitude is the contract).
    d = np.abs(np.diagonal(r, axis1=-2, axis2=-1))
    assert (d[:, 1:] <= d[:, :-1] + tol * (1 + d[:, :-1])).all()


@pytest.mark.unit
def test_cpqr_lanes_matches_identities_complex():
    """General complex batch, batch size not a lane-block multiple."""
    rng = np.random.default_rng(7)
    a = rand_c(rng, 5, 24, 24)
    q, r, perm = cpqr_lanes(jnp.asarray(a), interpret=True)
    check_factorization(a, q, r, perm)


@pytest.mark.unit
def test_cpqr_lanes_matches_xla_reference():
    """Same pivot sequence and factors (up to phase conventions both
    implementations share: LAPACK beta = -(alpha/|alpha|)||x||) as the
    pure-XLA implementation on a well-separated-norm matrix."""
    rng = np.random.default_rng(3)
    a = rand_c(rng, 3, 12, 12) * (10.0 ** np.arange(12))[None, None, :]
    ql, rl, pl_ = cpqr_lanes(jnp.asarray(a), interpret=True)
    qx, rx, px = cpqr._cpqr_xla(jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(pl_), np.asarray(px))
    # Factors agree directly (shared phase convention).
    assert np.abs(np.asarray(ql) - np.asarray(qx)).max() < 2e-2
    rel = np.abs(np.asarray(rl) - np.asarray(rx)).max() / np.abs(a).max()
    assert rel < 2e-3


@pytest.mark.unit
def test_cpqr_lanes_rank_deficient():
    """Zero trailing columns (rank-deficient): finite factors, exact
    reconstruction, zero trailing diagonal."""
    rng = np.random.default_rng(11)
    a = rand_c(rng, 2, 10, 10)
    a[:, :, 6:] = 0.0
    q, r, perm = cpqr_lanes(jnp.asarray(a), interpret=True)
    q, r = np.asarray(q), np.asarray(r)
    assert np.isfinite(q).all() and np.isfinite(r).all()
    check_factorization(a, q, r, perm)
    d = np.abs(np.diagonal(r, axis1=-2, axis2=-1))
    assert d[:, 6:].max() < 1e-5


@pytest.mark.unit
def test_cpqr_lanes_real_input_via_dispatch():
    """Real input through the cpqr() dispatch keeps the caller's dtype."""
    rng = np.random.default_rng(5)
    a = rng.normal(size=(4, 9, 9)).astype(np.float32)
    q, r, perm = cpqr.cpqr(jnp.asarray(a), impl="lanes_interpret")
    assert q.dtype == jnp.float32 and r.dtype == jnp.float32
    check_factorization(
        a.astype(np.complex64), np.asarray(q).astype(np.complex64),
        np.asarray(r).astype(np.complex64), perm)


@pytest.mark.unit
def test_cpqr_lanes_batch_reshape_dispatch():
    """[w, 2, m, m] (walkers x spins, the thermal stratification layout)
    through the dispatch: same as the XLA path element-by-element."""
    rng = np.random.default_rng(9)
    a = rand_c(rng, 3, 2, 8, 8)
    q, r, perm = cpqr.cpqr(jnp.asarray(a), impl="lanes_interpret")
    assert q.shape == a.shape and perm.shape == (3, 2, 8)
    check_factorization(
        a.reshape(6, 8, 8), np.asarray(q).reshape(6, 8, 8),
        np.asarray(r).reshape(6, 8, 8), np.asarray(perm).reshape(6, 8))


@pytest.mark.unit
def test_cpqr_lanes_max_m_guard():
    """m above the VMEM ceiling raises a clear error (ADVICE r4), and the
    auto dispatch routes such shapes to the XLA path instead."""
    a = jnp.zeros((1, CPQR_MAX_M + 1, CPQR_MAX_M + 1), jnp.complex64)
    with pytest.raises(ValueError, match="CPQR_MAX_M"):
        cpqr_lanes(a, interpret=True)
    assert not cpqr._use_lanes(a, pivot=True)


@pytest.mark.unit
def test_cpqr_dispatch_defaults_to_xla_on_cpu():
    """On the CPU backend the auto route must stay XLA (f64 fidelity for
    the thermal parity tests); env overrides are respected."""
    import os

    a = jnp.zeros((2, 8, 8), jnp.complex64)
    assert not cpqr._use_lanes(a, pivot=True)
    os.environ["PAUXY_TPU_CPQR"] = "lanes"
    try:
        assert cpqr._use_lanes(a, pivot=True)
        assert not cpqr._use_lanes(a, pivot=False)
    finally:
        del os.environ["PAUXY_TPU_CPQR"]


@pytest.mark.unit
def test_qdt_product_with_lanes_matches_xla():
    """The full thermal QDT stratification (estimators/thermal.py) run
    with the lanes kernel (interpret) matches the XLA-cpqr result."""
    import unittest.mock as mock

    from pauxy_tpu.estimators import thermal as therm

    rng = np.random.default_rng(13)
    stack = np.stack([
        (np.linalg.qr(rng.normal(size=(12, 12)))[0]
         * np.exp(rng.normal(scale=1.0, size=12))[None, :]
         ).astype(np.complex64)
        for _ in range(3)
    ])[None]  # [1, nbins, m, m]
    g_x, ld_x = therm.greens_function_qdt_logdet(jnp.asarray(stack))
    orig = cpqr.cpqr
    with mock.patch.object(
        cpqr, "cpqr",
        lambda a, pivot=True, impl=None: orig(a, pivot,
                                              impl="lanes_interpret"),
    ):
        g_l, ld_l = therm.greens_function_qdt_logdet(jnp.asarray(stack))
    assert np.abs(np.asarray(g_l) - np.asarray(g_x)).max() < 5e-4
    assert abs(complex(np.asarray(ld_l).ravel()[0])
               - complex(np.asarray(ld_x).ravel()[0])) < 5e-4
