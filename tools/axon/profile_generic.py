"""Per-op-class timing of the Generic phaseless step's constituents.

Times each phase in isolation at the bench shapes (readback-fenced,
iters-deep fori_loop to amortize dispatch) to apportion the Generic
walker-step cost: overlap einsum, batched complex solve (LU on the 2n
real embedding), slogdet scan, CholeskyQR2, VHS build, Taylor apply
(xla vs pallas), force bias, exchange energy (xla vs pallas).

Usage: python tools/axon/profile_generic.py [--w 1024] [--iters 5] [--cpu]
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
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--x", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pauxy_tpu import config
    from pauxy_tpu.utils.transfer import to_device

    config.set_matmul_precision(None)

    w, m, n, x = args.w, args.m, args.n, args.x
    iters = args.iters
    rng = np.random.default_rng(0)

    def dev_c(shape):
        a = rng.normal(size=shape).astype(np.float32)
        b = rng.normal(size=shape).astype(np.float32)
        return jax.jit(lambda p, q: (p + 1j * q).astype(jnp.complex64))(
            to_device(a), to_device(b))

    phi = dev_c((w, m, n))
    psi = dev_c((m, n))
    s_wnn = dev_c((w, n, n))
    # Make s well conditioned / PD-able.
    s_wnn = jax.jit(lambda s: s @ jnp.swapaxes(s.conj(), -1, -2)
                    + 4.0 * jnp.eye(n, dtype=s.dtype))(s_wnn)
    xs = dev_c((w, x))
    vhs = jax.jit(lambda v: 0.05 * v)(dev_c((w, m, m)))
    chol = to_device(rng.normal(size=(m, m, x)).astype(np.float32))
    rchol = to_device(rng.normal(size=(x, n, m)).astype(np.float32))
    ghalf = dev_c((w, n, m))

    from pauxy_tpu.ops import clinalg, greens
    from pauxy_tpu.ops.contract import cr_einsum
    from pauxy_tpu.propagation.generic import apply_exponential_taylor
    from pauxy_tpu.ops.taylor_pallas import apply_taylor_pallas
    from pauxy_tpu.estimators import local_energy as le

    def timed(name, fn, *operands):
        """fn maps operands -> array; the jit folds in a REAL scalar
        reduction so the readback fence never moves a complex buffer
        (axon cannot transfer complex)."""
        def fenced(*a):
            r = fn(*a)
            return sum(jnp.abs(leaf).sum()
                       for leaf in jax.tree_util.tree_leaves(r))

        f = jax.jit(fenced)
        np.asarray(f(*operands))
        best = 1e30
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = None
            for _i in range(iters):
                r = f(*operands)
            np.asarray(r)  # readback fence
            dt = (time.perf_counter() - t0) / iters
            best = min(best, dt)
        print(json.dumps({"op": name, "ms": round(best * 1e3, 3)}),
              flush=True)
        return best

    res = {}
    res["overlap_einsum"] = timed(
        "overlap_einsum", lambda p, ps: greens.overlap_matrix(p, ps),
        phi, psi)
    res["slogdet_scan"] = timed(
        "slogdet_scan", lambda s: clinalg.slogdet(s), s_wnn)
    res["solve_lu_2n"] = timed(
        "solve_lu_2n",
        lambda s, p: clinalg.solve(s, jnp.swapaxes(p, -1, -2)), s_wnn, phi)
    res["greens_full"] = timed(
        "greens_full", lambda p, ps: greens.greens_function(p, ps).Ghalf,
        phi, psi)
    res["cholesky_qr2"] = timed(
        "cholesky_qr2", lambda p: clinalg.cholesky_qr2(p)[0], phi)
    res["vhs_build"] = timed(
        "vhs_build",
        lambda c, z: cr_einsum("pqx,wx->wpq", c.reshape(m, m, -1), z,
                               optimize=True), chol, xs)
    res["taylor_xla"] = timed(
        "taylor_xla", lambda v, p: apply_exponential_taylor(v, p), vhs, phi)
    if not args.cpu:
        res["taylor_pallas"] = timed(
            "taylor_pallas", lambda v, p: apply_taylor_pallas(v, p), vhs,
            phi)
    res["force_bias"] = timed(
        "force_bias",
        lambda rc, gh: cr_einsum("xim,wim->wx", rc, gh, optimize=True),
        rchol, ghalf)
    res["exx_xla"] = timed(
        "exx_xla", lambda rc, gh: le._exx_xla(rc, gh)
        if hasattr(le, "_exx_xla") else le._exx(rc, gh), rchol, ghalf)
    if not args.cpu:
        from pauxy_tpu.ops.exx_pallas import exx_pallas

        res["exx_pallas"] = timed(
            "exx_pallas", lambda rc, gh: exx_pallas(rc, gh), rchol, ghalf)

    total_step = (2 * res["greens_full"] + 2 * res["cholesky_qr2"] / 5
                  + res["vhs_build"] + res["taylor_xla"]
                  + res["force_bias"] + res["exx_xla"])
    print(json.dumps({"approx_step_ms": round(total_step * 1e3, 2),
                      "implied_wsps": round(w / total_step, 0)}))


if __name__ == "__main__":
    main()
