"""Per-phase timing of the UEG (plane-wave) walker step at the bench shapes.

VERDICT r3 item 5: the UEG sub-bench reported a rate but no evidence of
where the time goes at ecut=8 (M=257, nq=2108, nfields=4216). This tool
times each phase of the planewave step in isolation (readback-fenced,
iters-deep loops to amortize dispatch): Green's function, FFT force bias,
sparse-gather VHS assembly, Taylor expm-apply, one-body half-step,
CholeskyQR2 stabilization, FFT-exchange local energy.

Usage: python tools/axon/profile_ueg.py [--w 512] [--ecut 8] [--cpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--ecut", type=float, default=8.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pauxy_tpu import config
    from pauxy_tpu.models import make_ueg, rhf_identity_trial
    from pauxy_tpu.propagation.planewave import make_planewave
    from pauxy_tpu.utils.transfer import to_device

    config.set_matmul_precision(None)

    w = args.w
    ham = make_ueg(nup=7, ndown=7, rs=1.0, ecut=args.ecut)
    trial = rhf_identity_trial(ham)
    prop = make_planewave(ham, trial, 0.005)
    m, na = trial.psia.shape
    nq = prop.nq
    print(json.dumps({"M": m, "nq": nq, "nfields": 2 * nq, "w": w, "na": na}),
          flush=True)

    rng = np.random.default_rng(0)

    def dev_c(shape, scale=1.0):
        a = (scale * rng.normal(size=shape)).astype(np.float32)
        b = (scale * rng.normal(size=shape)).astype(np.float32)
        return jax.jit(lambda p, q: (p + 1j * q).astype(jnp.complex64))(
            to_device(a), to_device(b))

    # Walker Slater matrices near the trial (well-conditioned overlaps).
    # Reconstructed on host: rhf_identity_trial is eye(M)[:, :na] by
    # definition, and the axon tunnel rejects some device->host transfers
    # (UNIMPLEMENTED) that a plain TPU runtime allows.
    psia_h = np.eye(m, dtype=np.complex64)[:, :na]
    phi = jax.jit(lambda d, p: p[None] + 0.1 * d)(
        dev_c((w, m, na)), to_device(psia_h.astype(np.complex64)))
    psi = to_device(psia_h.astype(np.complex64))
    xs = dev_c((w, 2 * nq))
    phi_cat = jnp.concatenate([phi, phi], axis=-1)

    from pauxy_tpu.ops import clinalg, greens
    from pauxy_tpu.estimators import local_energy as le
    from pauxy_tpu.propagation.generic import apply_exponential_taylor

    def timed(name, fn, *operands):
        def fenced(*a):
            r = fn(*a)
            return sum(jnp.abs(leaf).sum()
                       for leaf in jax.tree_util.tree_leaves(r)
                       if leaf is not None)

        f = jax.jit(fenced)
        np.asarray(f(*operands))
        best = 1e30
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = None
            for _i in range(args.iters):
                r = f(*operands)
            np.asarray(r)  # readback fence
            dt = (time.perf_counter() - t0) / args.iters
            best = min(best, dt)
        print(json.dumps({"op": name, "ms": round(best * 1e3, 3)}),
              flush=True)
        return best

    # NOTE: trial/prop/ham are passed as jit OPERANDS, never closed over —
    # closure capture inlines their device arrays as MLIR constants, which
    # forces a device->host copy the axon tunnel rejects (UNIMPLEMENTED).
    res = {}
    res["greens_full"] = timed(
        "greens_full", lambda p, ps: greens.greens_function(p, ps).Ghalf,
        phi, psi)
    g_obj = jax.jit(greens.greens_function)(phi, psi)
    res["force_bias_fft"] = timed(
        "force_bias_fft",
        lambda pr, tr, ga: pr.force_bias(tr, ga, ga), prop, trial, g_obj)
    res["vhs_assemble"] = timed(
        "vhs_assemble", lambda pr, x: pr.build_vhs(x), prop, xs)
    vhs = jax.jit(lambda pr, x: pr.build_vhs(x))(prop, xs)
    res["taylor_xla"] = timed(
        "taylor_xla", lambda v, p: apply_exponential_taylor(v, p),
        vhs, phi_cat)
    def one_body(pr, p):
        if pr.BH1.ndim == 2:                              # diagonal B_{T/2}
            return pr.BH1[0][None, :, None] * p
        return jnp.einsum("pq,wqn->wpn", pr.BH1[0], p)

    res["one_body_half"] = timed("one_body_half", one_body, prop, phi)
    res["cholesky_qr2"] = timed(
        "cholesky_qr2", lambda p: clinalg.cholesky_qr2(p)[0], phi)
    res["energy_fft"] = timed(
        "energy_fft",
        lambda h, tr, ga, gb: le.local_energy_ueg_half(h, tr, ga, gb),
        ham, trial, g_obj.Ghalf, g_obj.Ghalf)

    # The bench step: 1 greens + FB + VHS + taylor + 2 one-body halves per
    # step, QR every 5 steps, energy every 10.
    step = (res["greens_full"] + res["force_bias_fft"]
            + res["vhs_assemble"] + res["taylor_xla"]
            + 2 * res["one_body_half"] + res["cholesky_qr2"] / 5
            + res["energy_fft"] / 10)
    print(json.dumps({"approx_step_ms": round(step * 1e3, 2),
                      "implied_wsps": round(w / step, 0)}), flush=True)


if __name__ == "__main__":
    main()
