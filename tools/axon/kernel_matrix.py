"""On-chip Pallas kernel x shape-class sweep (VERDICT r3 item 2).

Interpret-mode CI validates kernel MATH but not Mosaic tiling/VMEM
legality — exactly the blind spot that let r3 ship lane blocks the real
chip rejects (every thermal M>48 run crashed). This sweep runs EVERY
Pallas kernel at EVERY shape class a driver can dispatch, on the ambient
backend (the axon TPU when run without overrides), readback-fenced, and
validates each result against a host/numpy reference.

Run: python tools/axon/kernel_matrix.py
Prints one line per cell and a final ``KERNEL_MATRIX {json}`` summary that
bench.py embeds in the bench artifact.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def _rc(rng, *shape):
    return (rng.normal(size=shape)
            + 1j * rng.normal(size=shape)).astype(np.complex64)


# The axon tunnel cannot run EAGER complex primitives or complex transfers
# (cf. tools/axon/smoke.py): every cell ships complex data via
# utils.transfer (split re/im + jitted combine), runs the op under jit, and
# reads back via to_host. The final np comparison is the readback fence.


def cell_batchla_inv(n, w=256):
    """clinalg.inv/slogdet dispatch: direct lanes (n<=48) or blocked Schur
    (48<n<=128) — the thermal full-rank size classes."""
    import jax
    from pauxy_tpu.ops import clinalg
    from pauxy_tpu.utils.transfer import to_device, to_host

    rng = np.random.default_rng(n)
    # Uniform conditioning across n: a complex Gaussian's spectral radius
    # grows as sqrt(n), so scale the off-diagonal part down with n (a
    # fixed +5 shift left the n=128 cell near-singular and failed the
    # tolerance for conditioning reasons, not kernel legality).
    s = (2.0 / np.sqrt(n)) * _rc(rng, w, n, n) \
        + 5 * np.eye(n, dtype=np.complex64)
    out = jax.jit(lambda x: (clinalg.inv(x), clinalg.slogdet(x)))(
        to_device(s))
    inv, ld = to_host(out)
    err = np.abs(np.einsum("wij,wjk->wik", s, inv)
                 - np.eye(n, dtype=np.complex64)).max()
    sign, logabs = np.linalg.slogdet(s)
    lderr = max(np.abs(ld.real - logabs).max(),
                np.abs(np.exp(1j * ld.imag) - sign).max())
    assert err < 5e-3 and lderr < 5e-3, (err, lderr)


def cell_batchla_chol(n, w=256):
    """cholesky_qr lanes kernel at the T=0 electron-count classes."""
    import jax
    from pauxy_tpu.ops import clinalg
    from pauxy_tpu.utils.transfer import to_device, to_host

    rng = np.random.default_rng(n + 1)
    phi = _rc(rng, w, 4 * n, n)
    q, logr = to_host(jax.jit(clinalg.cholesky_qr2)(to_device(phi)))
    qtq = np.einsum("wmi,wmj->wij", q.conj(), q)
    err = np.abs(qtq - np.eye(n, dtype=np.complex64)).max()
    _, ldref = np.linalg.slogdet(
        np.einsum("wmi,wmj->wij", phi.conj(), phi))
    assert err < 5e-3 and np.abs(logr - 0.5 * ldref).max() < 5e-3


def cell_greens(m, n, w=256):
    """greens lanes kernel at every (M, ne) class the drivers dispatch."""
    from pauxy_tpu.ops.greens_pallas import greens_lanes_pallas
    from pauxy_tpu.utils.transfer import to_device, to_host

    rng = np.random.default_rng(m + n)
    psi = _rc(rng, m, n)
    phi = _rc(rng, m, n, w) * 0.3
    phi[:, :, :] += psi[:, :, None]  # overlap not near-singular
    ld, ght = to_host(greens_lanes_pallas(to_device(psi), to_device(phi)))
    s = np.einsum("mnw,mk->wnk", phi, psi.conj())  # S = phi^T conj(psi)
    _, ldref = np.linalg.slogdet(s)
    assert np.abs(ld.real - ldref).max() < 5e-3
    gh_ref = np.einsum("wni,miw->wnm", np.linalg.inv(s),
                       np.transpose(phi, (0, 1, 2)))
    gh = np.transpose(ght, (2, 1, 0))  # ghT[q, i, w] -> [w, i, q]
    assert np.abs(gh - gh_ref).max() < 5e-2


def cell_sweep(nx, ny, na, w=256):
    """Hirsch site-sweep kernel at the lattice classes (4x4, 3x3)."""
    import jax.numpy as jnp
    from pauxy_tpu.ops.sweep_pallas import hirsch_sweep_real

    m = nx * ny
    rng = np.random.default_rng(m)
    psia = rng.normal(size=(m, na)).astype(np.float32)
    psib = rng.normal(size=(m, na)).astype(np.float32)
    phia = np.repeat(psia[None], w, 0) + 0.05 * rng.normal(
        size=(w, m, na)).astype(np.float32)
    phib = np.repeat(psib[None], w, 0) + 0.05 * rng.normal(
        size=(w, m, na)).astype(np.float32)
    inva = np.linalg.inv(np.einsum("mi,wmj->wij", psia, phia))
    invb = np.linalg.inv(np.einsum("mi,wmj->wij", psib, phib))
    gamma = np.arccosh(np.exp(0.5 * 0.01 * 4.0))
    auxf = np.array([[np.exp(gamma), np.exp(-gamma)],
                     [np.exp(-gamma), np.exp(gamma)]]) * np.exp(-0.5 * 0.01 * 4.0)
    delta = (auxf - 1).astype(np.float32)
    wfac = np.ones(2, np.float32)
    rs = rng.uniform(size=(m, w)).astype(np.float32)
    weight = np.ones(w, np.float32)
    outs = hirsch_sweep_real(
        jnp.asarray(psia), jnp.asarray(psib), jnp.asarray(delta),
        jnp.asarray(wfac), jnp.asarray(phia), jnp.asarray(phib),
        jnp.asarray(inva.astype(np.float32)),
        jnp.asarray(invb.astype(np.float32)),
        jnp.asarray(rs), jnp.asarray(weight))
    host = [np.asarray(o) for o in outs]                   # readback fence
    assert all(np.isfinite(h).all() for h in host[:4])


def cell_exx(x, n, m, w=64):
    """Exchange-energy kernel at the generic bench class + a small class."""
    import jax.numpy as jnp
    from pauxy_tpu.ops.exx_pallas import exx_pallas
    from pauxy_tpu.utils.transfer import to_device, to_host

    rng = np.random.default_rng(x)
    rchol = rng.normal(size=(x, n, m)).astype(np.float32)
    ghalf = _rc(rng, w, n, m) * 0.1
    out = to_host(exx_pallas(jnp.asarray(rchol), to_device(ghalf)))
    t = np.einsum("xim,wjm->wxij", rchol, ghalf)
    ref = np.einsum("wxij,wxji->w", t, t)
    assert np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6) < 2e-2


def cell_taylor(m, n, w=64, lowp=False):
    """Fused Taylor expm-apply kernel at the generic/hubbard classes
    (``lowp``: the bf16 tier, taylor_impl='pallas_bf16')."""
    from pauxy_tpu.ops.taylor_pallas import apply_taylor_pallas
    from pauxy_tpu.utils.transfer import to_device, to_host

    rng = np.random.default_rng(m)
    vhs = _rc(rng, w, m, m) * (0.3 / np.sqrt(m))
    phi = _rc(rng, w, m, n)
    out = to_host(apply_taylor_pallas(to_device(vhs), to_device(phi),
                                      lowp=lowp))
    ref = phi.copy()
    term = phi.copy()
    for k in range(1, 7):
        term = np.einsum("wpq,wqn->wpn", vhs, term) / k
        ref = ref + term
    tol = 5e-2 if lowp else 2e-2
    assert np.abs(out - ref).max() / np.abs(ref).max() < tol


def cell_cpqr(m, b=128):
    """Pivoted-QR lanes kernel (ops/cpqr_pallas.py) at the thermal QDT
    stratification classes — dispatched from ops/cpqr.cpqr (auto route on
    TPU) for estimators/thermal.qdt_product and walkers/low_rank."""
    import jax
    from pauxy_tpu.ops import cpqr
    from pauxy_tpu.utils.transfer import to_device, to_host

    rng = np.random.default_rng(m)
    a = _rc(rng, b, m, m)
    a *= np.exp(rng.normal(scale=2.0, size=(1, 1, m))).astype(np.float32)
    q, r, perm = to_host(
        jax.jit(lambda x: cpqr.cpqr(x, impl="lanes"))(to_device(a)))
    ap = np.take_along_axis(a, perm[:, None, :], axis=-1)
    rec = np.abs(ap - q @ r).max() / np.abs(a).max()
    uni = np.abs(np.einsum("bmi,bmj->bij", q.conj(), q) - np.eye(m)).max()
    assert (np.sort(perm, axis=-1) == np.arange(m)).all()
    assert rec < 5e-3 and uni < 5e-3, (rec, uni)


CELLS = [
    # (name, callable) — every Pallas kernel x every driver-dispatchable
    # shape class, each mapped to its dispatch site (VERDICT r4 item 5):
    #   batchla_inv_*   <- ops/clinalg.{inv,slogdet,solve} lanes route
    #                      (thermal stacks, Hirsch ratios, BP gab, MSD
    #                      dets); n<=48 direct, 48<n<=128 blocked Schur.
    #   batchla_chol_*  <- ops/clinalg.cholesky_qr2 (T=0 reortho classes).
    #   greens_*        <- qmc/hubbard_fast block via afqmc.fast_greens_impl
    #                      (lattice classes 3x3/4x4/6x6/8x8).
    #   sweep_*         <- propagation/hirsch.py pallas sweep kernel.
    #   exx_*           <- estimators/local_energy exchange fallback when
    #                      the supermatrix exceeds HBM (generic classes).
    #   taylor_*        <- propagation/generic+planewave taylor_impl=
    #                      'pallas_bf16' (m=257 is the UEG ecut=8 class).
    #   cpqr_*          <- ops/cpqr.cpqr auto route on TPU (thermal QDT
    #                      stratification estimators/thermal.qdt_product,
    #                      low-rank QDT walkers/low_rank) at M = 16
    #                      (4x4 hubbard), 36 (6x6), 48 (= CPQR_AUTO_MAX_M,
    #                      the chip-probed profitability cap; M > 48 —
    #                      e.g. the UEG ecut=4 M=93 class — routes to the
    #                      XLA fori_loop, enforced by _use_lanes + the
    #                      cpqr_lanes ValueError guard at CPQR_MAX_M=64).
    # batchla n: T=0 electron counts (8..32 direct; 33..48 blocked Schur
    # when the inverse is materialized — inlined inv calls with n>=36 blow
    # the 16 MiB scoped-vmem stack when XLA places the result planes in
    # VMEM, chip-probed 2026-08-21, see clinalg._DIRECT_MAX_N_INV) and the
    # thermal full-rank M classes (50, 93, 128 -> blocked Schur).
    ("batchla_inv_n8", lambda: cell_batchla_inv(8)),
    ("batchla_inv_n30", lambda: cell_batchla_inv(30)),
    ("batchla_inv_n36", lambda: cell_batchla_inv(36)),
    ("batchla_inv_n40", lambda: cell_batchla_inv(40)),
    ("batchla_inv_n48", lambda: cell_batchla_inv(48)),
    ("batchla_inv_n50", lambda: cell_batchla_inv(50)),
    ("batchla_inv_n93", lambda: cell_batchla_inv(93, w=64)),
    ("batchla_inv_n128", lambda: cell_batchla_inv(128, w=64)),
    ("batchla_chol_n7", lambda: cell_batchla_chol(7)),
    ("batchla_chol_n16", lambda: cell_batchla_chol(16)),
    ("batchla_chol_n48", lambda: cell_batchla_chol(48)),
    # greens lanes dispatches ONLY from the Hubbard fast block
    # (qmc/afqmc.fast_greens_impl guards on greens_pallas.vmem_ok);
    # classes = lattice sizes. m>32 exercises the fori_loop body.
    ("greens_m9_n3", lambda: cell_greens(9, 3)),        # 3x3
    ("greens_m16_n7", lambda: cell_greens(16, 7)),      # 4x4 headline
    ("greens_m36_n18", lambda: cell_greens(36, 18)),    # 6x6 half-filled
    ("greens_m64_n24", lambda: cell_greens(64, 24)),    # 8x8 doped
    ("sweep_4x4", lambda: cell_sweep(4, 4, 7, w=256)),
    ("sweep_3x3", lambda: cell_sweep(3, 3, 3, w=256)),
    ("exx_generic", lambda: cell_exx(512, 16, 128)),
    ("exx_small", lambda: cell_exx(30, 3, 12)),
    ("taylor_m128_n16", lambda: cell_taylor(128, 16)),
    ("taylor_m16_n7", lambda: cell_taylor(16, 7, w=256)),
    ("taylor_m257_n7_bf16", lambda: cell_taylor(257, 7, w=16, lowp=True)),
    ("cpqr_m16", lambda: cell_cpqr(16, b=256)),
    ("cpqr_m36", lambda: cell_cpqr(36, b=128)),
    ("cpqr_m48", lambda: cell_cpqr(48, b=128)),
]


def main(only=None):
    import jax

    import pauxy_tpu.config as cfg

    # Pin the driver's default matmul policy: jax's DEFAULT on TPU is a
    # single bf16 pass even for f32, which fails the numeric tolerances
    # here for reasons that have nothing to do with kernel legality.
    cfg.set_matmul_precision("float32")
    print("devices:", jax.devices(), flush=True)
    platform = jax.devices()[0].platform
    results = {}
    for name, fn in CELLS:
        if only and only not in name:
            continue
        t0 = time.time()
        for attempt in range(3):
            try:
                fn()
                results[name] = "ok"
                print(f"OK   {name} ({time.time()-t0:.1f}s)", flush=True)
                break
            except Exception as e:  # noqa: BLE001 — matrix records every cell
                msg = f"{type(e).__name__}: {str(e)[:120]}"
                # The axon remote-compile helper 500s transiently (observed
                # same shape failing then passing minutes apart); retry
                # before recording a legality failure.
                transient = "remote_compile" in str(e) or "HTTP 50" in str(e)
                if transient and attempt < 2:
                    print(f"RETRY {name} (transient: {msg[:80]})", flush=True)
                    time.sleep(20)
                    continue
                results[name] = msg
                print(f"FAIL {name}: {msg}", flush=True)
                break
    summary = {
        "platform": platform,
        "cells": results,
        "n_fail": sum(v != "ok" for v in results.values()),
    }
    print("KERNEL_MATRIX " + json.dumps(summary), flush=True)
    return summary["n_fail"]


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    sys.exit(1 if main(only) else 0)
