"""Per-op-class throughput on the chip for the Hubbard step's constituents.

Times each op class in isolation at the bench shapes (readback-fenced,
marginal cost via an n-iteration fori_loop to amortize dispatch), to find
which class accounts for the ~20us/walker-step cost profile_hubbard.py
measures. Classes:

  matmul    einsum('pm,wmn->wpn') complex64, M=16, n=7   (kinetic/B apply)
  greens    overlap solve path: S = psi^dag phi, inv via solve, G build
  slogdet   batched log-determinant of [w, 7, 7]
  qr        batched QR of [w, 16, 7] (reortho)
  sort      argsort + gather of the full state (comb pop control shape)
  expfield  per-site exp/gather field application [w, 16]
  rng       jax.random.normal([w, 16]) + uniform

Usage: python tools/axon/profile_ops.py [--w 8192] [--iters 50] [--cpu]
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
    ap.add_argument("--w", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    w, m, n = args.w, 16, 7
    iters = args.iters
    key = jax.random.key(0)
    phia = jax.random.normal(key, (w, m, n)) + 0.1j * jax.random.normal(
        jax.random.key(1), (w, m, n)
    )
    phia = phia.astype(jnp.complex64)
    bt2 = (jnp.eye(m) + 0.01j * jnp.ones((m, m))).astype(jnp.complex64)
    psi = phia[0]

    def bench(name, fn, per_iter_items):
        jf = jax.jit(fn)
        out = jf(phia)  # compile
        np.asarray(jnp.real(jnp.sum(out)))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = jf(phia)
            np.asarray(jnp.real(jnp.sum(r)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(json.dumps({
            "op": name,
            "total_s": round(t, 4),
            "us_per_walker_iter": round(t / (iters * w) * 1e6, 3),
            "walker_iters_per_s": round(iters * w / t, 1),
        }), flush=True)

    def loop(body):
        def f(x):
            def it(i, c):
                return body(i, c)
            return jax.lax.fori_loop(0, iters, it, x)
        return f

    # matmul: B phi
    bench("matmul_bt2", loop(
        lambda i, p: jnp.einsum("pm,wmn->wpn", bt2, p) * 0.999
    ), iters)

    # greens: S = psi^dag phi; inv; G = phi S^-1 psi^dag
    def greens_body(i, p):
        s = jnp.einsum("mi,wmj->wij", psi.conj(), p)
        inv = jnp.linalg.solve(
            s, jnp.broadcast_to(jnp.eye(n, dtype=p.dtype), s.shape)
        )
        g = jnp.einsum("wmi,wij,pj->wmp", p, inv, psi.conj())
        return p + 1e-6 * jnp.einsum("wmp,wpn->wmn", g, p)

    bench("greens_solve", loop(greens_body), iters)

    # slogdet
    def slog_body(i, p):
        s = jnp.einsum("mi,wmj->wij", psi.conj(), p)
        sign, ld = jnp.linalg.slogdet(s)
        return p * (1.0 + 1e-9 * ld[:, None, None]).astype(p.dtype)

    bench("slogdet", loop(slog_body), iters)

    # qr reortho
    def qr_body(i, p):
        q, r = jnp.linalg.qr(p)
        return q * jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1).real)[
            :, None, :
        ].astype(p.dtype)

    bench("qr", loop(qr_body), iters)

    # sort + gather (comb shape)
    wts = jnp.abs(phia[:, 0, 0])

    def sort_body(i, p):
        ww = jnp.abs(p[:, 0, 0])
        ix = jnp.argsort(ww)
        return p[ix] * (1.0 + 1e-9 * i)

    bench("sort_gather", loop(sort_body), iters)
    del wts

    # field exp application
    def field_body(i, p):
        x = jax.random.normal(jax.random.fold_in(key, i), (w, m))
        ex = jnp.exp(0.1j * x).astype(p.dtype)
        return p * ex[:, :, None]

    bench("rng_expfield", loop(field_body), iters)

    # pure elementwise traffic: how fast can we even stream the state?
    bench("elementwise", loop(lambda i, p: p * 0.9999 + 1e-8), iters)


if __name__ == "__main__":
    main()
