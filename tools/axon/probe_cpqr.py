"""On-chip probe: pivoted-QR lanes kernel (ops/cpqr_pallas.py) vs the
XLA implementations (ops/cpqr._cpqr_xla deferred-pivot/WY default and
the textbook _cpqr_xla_swaps loop) at the thermal stratification shape
classes, readback-fenced, numerics validated against host numpy. Decides
the ops/cpqr auto-dispatch default (PAUXY_TPU_CPQR).

Usage: python tools/axon/probe_cpqr.py [--cpu] [--iters 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pauxy_tpu.ops import cpqr
    from pauxy_tpu.utils.transfer import to_device, to_host

    print("devices:", jax.devices(), flush=True)

    # (batch, m): thermal stratification classes — [w or w*2spins, M, M]
    # at M = 16 (4x4 hubbard), 36/64 (lanes-legal mid sizes), 93 (UEG
    # ecut=4; above CPQR_MAX_M=64 -> the lanes column records the guard).
    cases = [(256, 16), (128, 36), (128, 64), (128, 93)]
    for b, m in cases:
        rng = np.random.default_rng(m)
        a = (rng.normal(size=(b, m, m))
             + 1j * rng.normal(size=(b, m, m))).astype(np.complex64)
        # Thermal-like conditioning: orthogonal x growing diagonal scales.
        a *= np.exp(rng.normal(scale=2.0, size=(1, 1, m))).astype(np.float32)
        ad = to_device(a)
        row = {"shape": f"[{b},{m},{m}]"}
        for impl in ("xla", "xla_swaps", "lanes"):
            try:
                fn = jax.jit(lambda x, _i=impl: cpqr.cpqr(x, impl=_i))
                q, r, perm = fn(ad)
                qh, rh, ph = to_host((q, r, perm))       # readback fence
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    q, r, perm = fn(ad)
                qh, rh, ph = to_host((q, r, perm))
                dt = (time.perf_counter() - t0) / args.iters
                # Validate: reconstruction + unitarity on the host.
                ap_ = np.take_along_axis(a, ph[:, None, :], axis=-1)
                rec = np.abs(ap_ - qh @ rh).max() / np.abs(a).max()
                uni = np.abs(np.einsum("bmi,bmj->bij", qh.conj(), qh)
                             - np.eye(m)).max()
                row[impl] = f"{1e3*dt:.1f} ms (rec {rec:.1e}, uni {uni:.1e})"
                row[impl + "_ms"] = 1e3 * dt
            except Exception as e:  # noqa: BLE001 — probe records failures
                row[impl] = f"{type(e).__name__}: {str(e)[:100]}"
        if "xla_ms" in row and "lanes_ms" in row:
            row["speedup"] = round(row["xla_ms"] / row["lanes_ms"], 2)
        print(row, flush=True)


if __name__ == "__main__":
    main()
