"""Probe: Pallas fused-Taylor legality + timing at the UEG bench shape
(M=257 — first non-128-multiple M the kernel sees on hardware) vs the XLA
Taylor loop. Usage: python tools/axon/probe_taylor_ueg.py [--w 512]"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--m", type=int, default=257)
    ap.add_argument("--n", type=int, default=14)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pauxy_tpu.ops.taylor_pallas import apply_taylor_pallas
    from pauxy_tpu.propagation.generic import apply_exponential_taylor
    from pauxy_tpu.utils.transfer import to_device

    w, m, n = args.w, args.m, args.n
    rng = np.random.default_rng(0)
    # to_device: complex transfers are UNIMPLEMENTED on the axon backend
    # and poison downstream buffers (utils/transfer.py).
    vhs = to_device(
        (0.1 * (rng.normal(size=(w, m, m)) + 1j * rng.normal(size=(w, m, m))))
        .astype(np.complex64))
    phi = to_device(
        (rng.normal(size=(w, m, n)) + 1j * rng.normal(size=(w, m, n)))
        .astype(np.complex64))

    # Reductions stay INSIDE jit and end real-valued: eager/complex
    # readbacks on the axon backend raise UNIMPLEMENTED and wedge the
    # client (bench.py header, utils/transfer.py).
    absmean = jax.jit(lambda r: jnp.abs(r).mean())

    def bench(name, f):
        try:
            t0 = time.perf_counter()
            r = jax.block_until_ready(f(vhs, phi))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = f(vhs, phi)
            jax.block_until_ready(r)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(f"{name}: {ms:.2f} ms (compile {compile_s:.1f}s)",
                  flush=True)
            return np.asarray(absmean(r))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
            return None

    xla = jax.jit(lambda v, p: apply_exponential_taylor(v, p, 6))
    ref = bench("taylor_xla", xla)
    for wb in (2, 4, 8):
        for lowp in (False, True):
            tag = f"pallas_wb{wb}" + ("_bf16" if lowp else "")
            f = jax.jit(lambda v, p, _wb=wb, _lp=lowp: apply_taylor_pallas(
                v, p, 6, lowp=_lp, wb=_wb))
            got = bench(tag, f)
            if got is not None and ref is not None:
                print(f"  |mean| rel diff vs xla: "
                      f"{abs(got - ref) / abs(ref):.2e}", flush=True)


if __name__ == "__main__":
    main()
