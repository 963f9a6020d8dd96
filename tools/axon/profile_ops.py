"""Per-op-class throughput on the chip for the Hubbard step's constituents.

Times each op class in isolation at the bench shapes (readback-fenced,
n-iteration fori_loop to amortize dispatch), to apportion the
~20us/walker-step cost profile_hubbard.py measures. Axon-safe: complex
inputs are built by jitted combines (no eager complex primitives), and all
operands are explicit jit arguments (no closure capture of device buffers).

Usage: python tools/axon/profile_ops.py [--w 8192] [--iters 20] [--cpu]
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pauxy_tpu.utils.transfer import to_device

    w, m, n = args.w, 16, 7
    iters = args.iters
    rng = np.random.default_rng(0)
    phia = to_device(
        (rng.normal(size=(w, m, n)) + 0.1j * rng.normal(size=(w, m, n)))
        .astype(np.complex64)
    )
    bt2 = to_device(
        (np.eye(m) + 0.01j * np.ones((m, m))).astype(np.complex64)
    )
    psi = to_device(
        (rng.normal(size=(m, n)) + 0.1j * rng.normal(size=(m, n)))
        .astype(np.complex64)
    )
    key = jax.random.key(0)

    def bench(name, body):
        @jax.jit
        def jf(p, psi, bt2):
            def it(i, c):
                return body(i, c, psi, bt2)
            return jax.lax.fori_loop(0, iters, it, p)

        out = jf(phia, psi, bt2)  # compile
        np.asarray(jnp.real(jnp.sum(out)))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = jf(phia, psi, bt2)
            np.asarray(jnp.real(jnp.sum(r)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(json.dumps({
            "op": name,
            "total_s": round(t, 4),
            "us_per_walker_iter": round(t / (iters * w) * 1e6, 3),
        }), flush=True)

    # matmul: B phi
    bench("matmul_bt2", lambda i, p, psi, bt2:
          jnp.einsum("pm,wmn->wpn", bt2, p) * 0.999)

    # greens: S = psi^dag phi; inv via solve; touch result
    def greens_body(i, p, psi, bt2):
        s = jnp.einsum("mi,wmj->wij", psi.conj(), p)
        gh = jnp.linalg.solve(s, jnp.swapaxes(p, -1, -2))   # [w, n, m]
        return p + 1e-6 * jnp.swapaxes(gh, -1, -2)

    bench("greens_solve", greens_body)

    # slogdet
    def slog_body(i, p, psi, bt2):
        s = jnp.einsum("mi,wmj->wij", psi.conj(), p)
        sign, ld = jnp.linalg.slogdet(s)
        return p * (1.0 + 1e-9 * ld[:, None, None]).astype(p.dtype)

    bench("slogdet", slog_body)

    # clinalg cholesky_qr2 (the reortho actually used)
    from pauxy_tpu.ops import clinalg

    def qr_body(i, p, psi, bt2):
        q, _ = clinalg.cholesky_qr2(p)
        return q

    bench("cholesky_qr2", qr_body)

    # lanes-layout greens (the fast path's inner op)
    from pauxy_tpu.ops import lanelinalg as ll

    def lanes_greens_body(i, p, psi, bt2):
        # p arrives [m, n, W] here? No — keep [w, m, n] and convert once
        # outside the loop cost; this body measures gauss itself.
        pl = jnp.moveaxis(p, 0, -1)
        s = jnp.swapaxes(ll.overlap_lanes(psi, pl), 0, 1)
        logdet, gh = ll.gauss(s, jnp.swapaxes(pl, 0, 1))
        return p + 1e-6 * jnp.moveaxis(jnp.swapaxes(gh, 0, 1), -1, 0)

    bench("lanes_gauss_greens", lanes_greens_body)

    # sort + gather (comb shape)
    def sort_body(i, p, psi, bt2):
        ww = jnp.abs(p[:, 0, 0])
        ix = jnp.argsort(ww)
        return p[ix] * (1.0 + 1e-9 * i)

    bench("sort_gather", sort_body)

    # rng + field exp application
    def field_body(i, p, psi, bt2):
        x = jax.random.normal(jax.random.fold_in(key, i), (w, m))
        ex = jnp.exp(0.1j * x).astype(p.dtype)
        return p * ex[:, :, None]

    bench("rng_expfield", field_body)

    # pure elementwise traffic: how fast can we even stream the state?
    bench("elementwise", lambda i, p, psi, bt2: p * 0.9999 + 1e-8)

    # lanes-layout elementwise (layout sensitivity of pure streaming)
    def lanes_elem(i, p, psi, bt2):
        pl = jnp.moveaxis(p, 0, -1)
        return jnp.moveaxis(pl * 0.9999 + 1e-8, -1, 0)

    bench("elementwise_lanes_roundtrip", lanes_elem)


if __name__ == "__main__":
    main()
