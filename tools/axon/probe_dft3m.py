"""Probe: 3M (Karatsuba) vs plain complex matmul for the pw_fft
matmul-DFT passes at the UEG bench shape. Unlike the per-walker batched
Taylor GEMMs (overhead-bound; 3M loses there), the DFT contracts every
cube against ONE unbatched [289, 289] matrix — a single large GEMM where
pass count should dominate. Usage: python tools/axon/probe_dft3m.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax
    import jax.numpy as jnp

    import pauxy_tpu.config as cfg
    from pauxy_tpu.utils.transfer import to_device
    from pauxy_tpu.propagation import pw_fft

    cfg.set_matmul_precision("float32")
    qmesh = (17, 17, 17)
    w, n = 512, 14
    ng = int(np.prod(qmesh))
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(w, n, ng))
         + 1j * rng.normal(size=(w, n, ng))).astype(np.complex64)
    xd = to_device(x)
    rb = jax.jit(lambda v: jnp.sum(jnp.abs(v)))
    K = 10

    def plain_dft3(cube, inverse=False):
        d0, d1, d2 = qmesh
        y = cube.reshape(cube.shape[:-1] + (d0, d1 * d2))
        f12 = jnp.asarray(pw_fft._dft_mat2(d1, d2, inverse).astype(y.dtype))
        y = jnp.matmul(y, f12)
        f0 = jnp.asarray(pw_fft._dft_mat(d0, inverse).astype(y.dtype))
        y = jnp.moveaxis(jnp.matmul(jnp.moveaxis(y, -2, -1), f0), -1, -2)
        return y.reshape(cube.shape)

    def loop(fn):
        def f(c):
            def body(i, t):
                o = fn(t)
                return o / jnp.maximum(jnp.max(jnp.abs(o)), 1e-30)
            return jax.lax.fori_loop(0, K, body, c)
        return jax.jit(f)

    def bench(f):
        o = f(xd)
        float(np.asarray(rb(o)))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            o = f(xd)
            float(np.asarray(rb(o)))
            best = min(best, (time.perf_counter() - t0) / K)
        return best * 1e3

    t3m = bench(loop(lambda c: pw_fft._dft3(c, qmesh, False)))
    t4m = bench(loop(lambda c: plain_dft3(c)))
    d = float(np.asarray(jax.jit(
        lambda c: jnp.max(jnp.abs(pw_fft._dft3(c, qmesh, False)
                                  - plain_dft3(c))))(xd)))
    print(f"dft3 [w={w}, n={n}, {qmesh}]: 3m={t3m:.3f} ms  "
          f"plain-complex={t4m:.3f} ms  maxdiff={d:.3e}", flush=True)


if __name__ == "__main__":
    main()
