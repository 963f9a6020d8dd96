"""One-shot on-chip validation queue: run after a tunnel recovery.

Order: (1) probe, (2) family smoke (tools/axon/smoke.py), (3) the lanes
kernels at the sizes the thermal path now routes through the adaptive lane
block (n = 93 -> 64-lane block, n = 128 -> 32-lane block — compiled, not
interpret), (4) full bench (prints the JSON line and refreshes
bench_last_tpu.json).

Run: python tools/axon/validate.py [--skip-bench]
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, ROOT)


def probe(timeout=120):
    # Single source of truth for the liveness probe lives in bench.py.
    import bench

    return bench._probe_tunnel(timeout=timeout)


def lanes_check():
    import numpy as np

    import jax.numpy as jnp
    from pauxy_tpu.ops import batchla_pallas as bp

    rng = np.random.default_rng(3)
    for n in (16, 93, 128):
        t0 = time.time()
        s = (rng.standard_normal((8, n, n))
             + 1j * rng.standard_normal((8, n, n))).astype(np.complex64)
        s += 4 * np.eye(n)
        ld, inv = bp.inv_logdet_lanes(jnp.asarray(s))
        ld = np.asarray(ld)
        ref_sign, ref_ld = np.linalg.slogdet(s)
        np.testing.assert_allclose(ld.real, ref_ld, rtol=5e-4, atol=5e-4)
        err = np.abs(np.asarray(inv) @ s - np.eye(n)).max()
        assert err < 5e-3, (n, err)
        print(f"OK lanes n={n}: logdet + inverse "
              f"({time.time() - t0:.1f}s incl compile)", flush=True)


def main():
    print("# probing tunnel...", flush=True)
    if not probe():
        print("TUNNEL DOWN — aborting", flush=True)
        sys.exit(1)
    print("# tunnel alive; family smoke...", flush=True)
    subprocess.run([sys.executable, os.path.join(HERE, "smoke.py")],
                   check=True, cwd=ROOT)
    print("# lanes kernels at adaptive block sizes...", flush=True)
    lanes_check()
    if "--skip-bench" not in sys.argv:
        print("# full bench...", flush=True)
        subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       check=True, cwd=ROOT)
    print("# VALIDATION COMPLETE", flush=True)


if __name__ == "__main__":
    main()
