"""Thermal UEG walker-count scaling probe (bench shape: ecut=4, M=93,
beta=1, dt=0.05 -> 20 slices).

The per-slice cost is dominated by the QDT re-stratification whose cpqr
column loop is SEQUENTIAL in the basis index but fully batched over
walkers — so the walker-slice-steps/s rate should scale nearly linearly
with nwalkers until the VPU saturates. This probe measures that curve to
pick the bench THERMAL_NWALKERS. Usage:
python tools/axon/profile_thermal.py [--nw 64 256 512]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nw", type=int, nargs="+", default=[64, 256, 512])
    ap.add_argument("--nblocks", type=int, default=3)
    ap.add_argument("--beta", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pauxy_tpu.models import make_ueg
    from pauxy_tpu.models.thermal_trial import make_one_body_trial
    from pauxy_tpu.qmc import QMCOpts
    from pauxy_tpu.qmc.thermal_afqmc import ThermalAFQMC

    beta, dt = args.beta, 0.05
    ham = make_ueg(nup=7, ndown=7, rs=1.0, ecut=4.0)
    trial = make_one_body_trial(ham, beta, dt, mu=0.9)
    print({"M": int(ham.nbasis), "nbins": int(trial.nbins),
           "stack_size": int(trial.stack_size)}, flush=True)

    for nw in args.nw:
        qmc = QMCOpts(nwalkers=nw, dt=dt, nsteps=1,
                      nblocks=args.nblocks + 1, beta=beta,
                      npop_control=1, rng_seed=8)
        af = ThermalAFQMC(ham, trial, qmc, filename="/tmp/profile_thermal.h5")
        nslices = af.ntime_slices
        af.run_block()                                    # compile + warm
        best = 0.0
        for _rep in range(2):
            t0 = time.perf_counter()
            rows = [af.run_block() for _ in range(args.nblocks)]
            vals = np.asarray([r[2] for r in rows]).real  # readback fence
            elapsed = time.perf_counter() - t0
            assert np.isfinite(vals).all()
            best = max(best, nw * nslices * args.nblocks / elapsed)
        print(f"nw={nw}: {best:.1f} walker-slice-steps/s "
              f"({1e3 * nw * nslices / best:.1f} ms/block)", flush=True)


if __name__ == "__main__":
    main()
