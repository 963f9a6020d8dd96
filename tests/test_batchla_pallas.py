"""VMEM lanes kernels for batched tiny-matrix linear algebra
(ops/batchla_pallas.py), validated in pallas interpret mode against numpy,
plus the exchange-supermatrix identity (models/trial._exx_supermatrix)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pauxy_tpu.ops.batchla_pallas import (
    chol_inv_lanes,
    inv_logdet_lanes,
    slogdet_lanes,
)


def rand_c(rng, *shape):
    return (rng.normal(size=shape)
            + 1j * rng.normal(size=shape)).astype(np.complex64)


@pytest.mark.unit
def test_inv_logdet_lanes_matches_numpy():
    """Gauss-Jordan kernel: inverse, |det| and det phase vs numpy, on a
    batch that is not a multiple of the 128 lane block."""
    rng = np.random.default_rng(3)
    w, n = 37, 9
    s = rand_c(rng, w, n, n)
    ld, inv = inv_logdet_lanes(jnp.asarray(s), interpret=True)
    ld, inv = np.asarray(ld), np.asarray(inv)
    sign, logabs = np.linalg.slogdet(s)
    assert np.abs(inv - np.linalg.inv(s)).max() < 1e-3
    np.testing.assert_allclose(ld.real, logabs, atol=1e-4)
    np.testing.assert_allclose(np.exp(1j * ld.imag), sign, atol=1e-4)


@pytest.mark.unit
def test_lane_block_is_mosaic_legal():
    """The lane block is always 128 — Mosaic rejects narrower lane tiles
    on real hardware (VERDICT r3 weak #1: wb∈{64,32} passed interpret mode
    but crashed every thermal M>48 run on the chip). n beyond the direct
    VMEM budget must raise, not shrink the block."""
    from pauxy_tpu.ops.batchla_pallas import _lane_block

    from pauxy_tpu.ops.batchla_pallas import LANES_DIRECT_MAX_N

    assert _lane_block(16) == 128 and _lane_block(LANES_DIRECT_MAX_N) == 128
    with pytest.raises(ValueError, match="Schur"):
        _lane_block(LANES_DIRECT_MAX_N + 1)


@pytest.mark.unit
@pytest.mark.parametrize("n", [50, 93, 128])
def test_schur_blocked_inv_logdet_math(monkeypatch, n):
    """48 < n <= 128 (full-rank thermal stacks, M~100) routes through the
    blocked Schur composition; its math must match numpy at every
    thermal-reachable size class. Leaves are faked with an exact numpy
    inverse so the test isolates the COMPOSITION (leaf-kernel correctness
    is covered by the direct interpret tests above; composed Mosaic
    legality by tools/axon/kernel_matrix.py on the chip)."""
    from pauxy_tpu.ops import clinalg

    calls = []

    def fake_leaf(s, mode, want_inv=True):
        calls.append(s.shape[-1])
        from pauxy_tpu.ops.batchla_pallas import LANES_DIRECT_MAX_N
        assert s.shape[-1] <= LANES_DIRECT_MAX_N, \
            "leaf larger than the direct VMEM budget"
        host = np.asarray(s).astype(np.complex128)
        sign, logabs = np.linalg.slogdet(host)
        ld = (logabs + 1j * np.angle(sign)).astype(np.complex64)
        inv = np.linalg.inv(host).astype(np.complex64) if want_inv else None
        return jnp.asarray(ld), None if inv is None else jnp.asarray(inv)

    monkeypatch.setattr(clinalg, "_lanes_leaf", fake_leaf)
    rng = np.random.default_rng(n)
    w = 3
    # Diagonally-dominated like the stabilized thermal factors (the Schur
    # path assumes a nonsingular leading block, as they guarantee).
    s = rand_c(rng, w, n, n) + 6 * np.eye(n, dtype=np.complex64)
    ld, x = clinalg._schur_inv_logdet(jnp.asarray(s), "single")
    ld, x = np.asarray(ld), np.asarray(x)
    assert np.abs(x - np.linalg.inv(s)).max() < 1e-3
    sign, logabs = np.linalg.slogdet(s)
    np.testing.assert_allclose(ld.real, logabs, rtol=2e-5)
    np.testing.assert_allclose(np.exp(1j * ld.imag), sign, atol=1e-3)
    from pauxy_tpu.ops.batchla_pallas import LANES_DIRECT_MAX_N
    assert calls and max(calls) <= LANES_DIRECT_MAX_N
    # logdet-only variant skips the Schur-inverse assembly.
    ld2, none = clinalg._schur_inv_logdet(jnp.asarray(s), "single",
                                          want_inv=False)
    assert none is None
    np.testing.assert_allclose(np.asarray(ld2).real, logabs, rtol=2e-5)


@pytest.mark.unit
def test_clinalg_schur_dispatch_interpret(monkeypatch):
    """One end-to-end 48<n run through the REAL lanes leaves in interpret
    mode (small shapes — interpret compile cost grows fast with n)."""
    import functools

    from pauxy_tpu.ops import batchla_pallas as bp
    from pauxy_tpu.ops import clinalg

    monkeypatch.setenv("PAUXY_TPU_BATCHLA", "pallas")
    # Keep the kernel JITTED (interpret=True is a static arg): the eager
    # unjitted interpreter is pathologically slow beyond tiny n.
    monkeypatch.setattr(
        bp, "inv_logdet_lanes",
        functools.partial(bp.inv_logdet_lanes, interpret=True),
    )
    rng = np.random.default_rng(4)
    w, n = 2, 50
    s = rand_c(rng, w, n, n) + 6 * np.eye(n, dtype=np.complex64)
    x = np.asarray(clinalg.inv(jnp.asarray(s)))
    assert np.abs(x - np.linalg.inv(s)).max() < 1e-3


@pytest.mark.unit
def test_inv_logdet_lanes_real_input():
    """REAL f32 matrices ride the same kernel (imag lanes zero); the
    inverse comes back real — the discrete pallas-sweep path depends on
    this (hirsch._site_sweep_pallas)."""
    rng = np.random.default_rng(11)
    w, n = 9, 7
    s = rng.normal(size=(w, n, n)).astype(np.float32)
    ld, inv = inv_logdet_lanes(jnp.asarray(s), interpret=True)
    inv = np.asarray(inv)
    assert inv.dtype == np.float32
    assert np.abs(inv - np.linalg.inv(s)).max() < 1e-3
    sign, logabs = np.linalg.slogdet(s)
    np.testing.assert_allclose(np.asarray(ld).real, logabs, atol=1e-4)
    np.testing.assert_allclose(np.cos(np.asarray(ld).imag), sign, atol=1e-4)


@pytest.mark.unit
def test_inv_logdet_lanes_needs_pivoting():
    """Zero leading principal minor: correct only with row pivoting."""
    s = np.zeros((1, 2, 2), np.complex64)
    s[0] = [[0.0, 1.0], [1.0, 0.0]]
    ld, inv = inv_logdet_lanes(jnp.asarray(s), interpret=True)
    np.testing.assert_allclose(np.exp(complex(ld[0])), -1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(inv)[0], s[0], atol=1e-5)


@pytest.mark.unit
def test_slogdet_lanes_batch_shape():
    rng = np.random.default_rng(5)
    s = rand_c(rng, 3, 4, 5, 5)
    out = np.asarray(slogdet_lanes(jnp.asarray(s), interpret=True))
    assert out.shape == (3, 4)
    det = np.linalg.det(s)
    np.testing.assert_allclose(np.exp(out), det, rtol=2e-3)


@pytest.mark.unit
def test_chol_inv_lanes_matches_numpy():
    rng = np.random.default_rng(4)
    w, n = 11, 8
    a = rand_c(rng, w, n, n)
    spd = (a @ np.conj(np.swapaxes(a, -1, -2))
           + 3 * np.eye(n, dtype=np.complex64))
    ld, linv = chol_inv_lanes(jnp.asarray(spd), interpret=True)
    ld, linv = np.asarray(ld), np.asarray(linv)
    lo = np.linalg.cholesky(spd)
    assert np.abs(linv - np.linalg.inv(lo)).max() < 1e-3
    ref_ld = np.log(np.diagonal(lo, axis1=-2, axis2=-1).real).sum(-1)
    np.testing.assert_allclose(ld, ref_ld, atol=1e-4)


@pytest.mark.unit
def test_clinalg_lanes_dispatch(monkeypatch):
    """clinalg.solve / slogdet / cholesky_qr2 route through the lanes
    kernels (forced via env + interpret monkeypatch) and agree with the
    XLA paths they replace."""
    import functools

    from pauxy_tpu.ops import batchla_pallas as bp
    from pauxy_tpu.ops import clinalg

    monkeypatch.setenv("PAUXY_TPU_BATCHLA", "pallas")
    monkeypatch.setattr(
        bp, "inv_logdet_lanes",
        functools.partial(bp.inv_logdet_lanes.__wrapped__, interpret=True),
    )
    monkeypatch.setattr(
        bp, "chol_inv_lanes",
        functools.partial(bp.chol_inv_lanes.__wrapped__, interpret=True),
    )
    monkeypatch.setattr(
        bp, "slogdet_lanes", functools.partial(bp.slogdet_lanes,
                                               interpret=True),
    )
    rng = np.random.default_rng(6)
    w, n, m = 9, 5, 12
    s = rand_c(rng, w, n, n)
    y = rand_c(rng, w, n, m)
    x = np.asarray(clinalg.solve(jnp.asarray(s), jnp.asarray(y)))
    np.testing.assert_allclose(s @ x, y, atol=2e-4)
    ld = np.asarray(clinalg.slogdet(jnp.asarray(s)))
    np.testing.assert_allclose(np.exp(ld), np.linalg.det(s), rtol=2e-3)
    phi = rand_c(rng, w, m, n)
    q, logr = clinalg.cholesky_qr2(jnp.asarray(phi))
    q, logr = np.asarray(q), np.asarray(logr)   # logr: [w], pre-summed
    for i in range(w):
        qtq = q[i].conj().T @ q[i]
        np.testing.assert_allclose(qtq, np.eye(n), atol=1e-3)
        _, ldref = np.linalg.slogdet(phi[i].conj().T @ phi[i])
        np.testing.assert_allclose(logr[i], 0.5 * ldref, atol=1e-3)


@pytest.mark.unit
def test_exx_supermatrix_identity():
    """exx via the precomputed supermatrix == the T-intermediate einsum,
    for real AND complex rchol."""
    from pauxy_tpu.estimators.local_energy import _exx
    from pauxy_tpu.models.trial import _exx_supermatrix

    rng = np.random.default_rng(2)
    X, n, m, w = 37, 4, 11, 5
    gh = rand_c(rng, w, n, m).astype(np.complex128)
    for rc in (rng.normal(size=(X, n, m)),
               rng.normal(size=(X, n, m))
               + 1j * rng.normal(size=(X, n, m))):
        t = np.einsum("xim,wjm->wxij", rc, gh)
        ref = np.einsum("wxij,wxji->w", t, t)
        c = _exx_supermatrix(rc)
        out = np.asarray(_exx(jnp.asarray(rc), jnp.asarray(gh),
                              jnp.asarray(c)))
        np.testing.assert_allclose(out, ref, rtol=1e-10)
