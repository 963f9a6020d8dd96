"""Headline benchmark: walker-steps/sec/chip, 4x4 Hubbard U=4, 1k walkers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (pauxy, numpy, single CPU core of this host) measured
at 2901 walker-steps/sec for the identical physics configuration (4x4 Hubbard
U=4 (7,7), continuous HS, force bias + hybrid phaseless update, local energy
every step, pop control every step, reortho every 10) via the serial oracle:

    PYTHONPATH=tools/oracle:/root/reference python ... AFQMC(...).run()

Run on the real TPU chip (no env overrides) or CPU (it adapts precision).
"""

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_WALKER_STEPS_PER_SEC = 2901.0  # measured 2026-08-16, see docstring

NWALKERS = 1024
NSTEPS = 10
NBLOCKS_MEASURE = 5


def main():
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if not on_tpu:
        jax.config.update("jax_enable_x64", False)

    from pauxy_tpu.models import make_hubbard, free_electron_trial
    from pauxy_tpu.qmc import AFQMC, QMCOpts

    ham = make_hubbard(nup=7, ndown=7, U=4.0, nx=4, ny=4)
    trial = free_electron_trial(ham)
    qmc = QMCOpts(
        nwalkers=NWALKERS,
        dt=0.01,
        nsteps=NSTEPS,
        nblocks=NBLOCKS_MEASURE + 1,
        nstblz=10,
        npop_control=1,
        rng_seed=8,
    )
    af = AFQMC(
        ham,
        trial,
        qmc,
        estimator_options={"mixed": {"energy_eval_freq": 1}},
        verbose=False,
        filename="bench_estimates.h5",
    )

    # Warm-up block: compile + first execution.
    af.run_block()
    jax.block_until_ready(af.state.weight)

    t0 = time.perf_counter()
    for _ in range(NBLOCKS_MEASURE):
        af.run_block()
    jax.block_until_ready(af.state.weight)
    elapsed = time.perf_counter() - t0

    walker_steps = NWALKERS * NSTEPS * NBLOCKS_MEASURE
    rate = walker_steps / elapsed
    print(
        json.dumps(
            {
                "metric": "walker_steps_per_sec_4x4_hubbard_1k",
                "value": round(rate, 1),
                "unit": "walker-steps/s/chip",
                "vs_baseline": round(rate / REFERENCE_WALKER_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
