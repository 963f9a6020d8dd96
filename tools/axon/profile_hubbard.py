"""On-chip breakdown of the 4x4 Hubbard headline benchmark (VERDICT r2 #1).

Resolves "tunnel-latency bound" vs "flat in batch" by separating, with
readback-fenced timings:

  (a) tunnel round-trip latency of a trivial program,
  (b) per-scan-iteration overhead of a trivial-body loop,
  (c) the fused block's cost decomposed into fixed-per-dispatch +
      marginal-per-step via nsteps differencing (10 vs 50 vs 100),
  (d) batch scaling at 1k / 8k / 64k walkers.

Every timing is min/median/max over reps (VERDICT r2 weak #7: record the
spread, not just best-of-N). Run on the axon chip:

    python tools/axon/profile_hubbard.py [--walkers 1024,8192,65536]

Prints one JSON document at the end.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def fence(x):
    """Readback fence: on the axon tunnel only a device->host transfer
    reliably proves execution finished."""
    return np.asarray(x)


def timed(fn, reps=5):
    """Run fn() reps times; each call must itself be readback-fenced.
    Returns dict of seconds (min/med/max)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return {"min": ts[0], "med": ts[len(ts) // 2], "max": ts[-1], "n": reps}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers", default="1024,8192,65536")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}

    # (a) trivial dispatch+readback latency --------------------------------
    @jax.jit
    def trivial(x):
        return x * 2.0 + 1.0

    x = jnp.ones((8, 128))
    fence(trivial(x))  # compile
    out["trivial_roundtrip_s"] = timed(lambda: fence(trivial(x)), args.reps)

    # (b) per-iteration overhead of a compiled loop with a tiny body -------
    def loop_prog(n):
        @jax.jit
        def f(x):
            def body(i, c):
                return c * 1.000001 + 1e-7
            return jax.lax.fori_loop(0, n, body, x)
        fence(f(x))  # compile
        return timed(lambda: fence(f(x)), args.reps)

    t100 = loop_prog(100)
    t1000 = loop_prog(1000)
    out["loop_tinybody_100iter_s"] = t100
    out["loop_tinybody_1000iter_s"] = t1000
    out["per_iteration_overhead_us"] = (
        (t1000["med"] - t100["med"]) / 900.0 * 1e6
    )

    # (c)+(d) the fused Hubbard block --------------------------------------
    from pauxy_tpu.models import make_hubbard, free_electron_trial
    from pauxy_tpu.qmc import AFQMC, QMCOpts
    from pauxy_tpu.qmc import afqmc as afq
    from pauxy_tpu.utils.transfer import device_zeros

    ham = make_hubbard(nup=7, ndown=7, U=4.0, nx=4, ny=4)
    trial = free_electron_trial(ham)

    results = {}
    for nw in [int(s) for s in args.walkers.split(",")]:
        qmc = QMCOpts(nwalkers=nw, dt=0.01, nsteps=10, nblocks=2,
                      nstblz=10, npop_control=1, rng_seed=8)
        af = AFQMC(ham, trial, qmc,
                   estimator_options={"mixed": {"energy_eval_freq": 1}},
                   verbose=False, filename="/tmp/profile_estimates.h5")
        state0 = af.state
        eshift = device_zeros((), state0.log_ovlp.dtype)
        key = jax.random.key(8)

        per_nsteps = {}
        for nsteps in (10, 50, 100):
            statics = dict(
                nsteps=nsteps, nstblz=10, npop_control=1,
                pop_method="comb", target_weight=float(nw),
                energy_eval_freq=1, free_projection=False,
            )

            def block(state, sub):
                st, _a, _b, _c = afq.run_block(
                    ham, trial, af.prop, state, sub, eshift,
                    jnp.asarray(1, jnp.int32), **statics,
                )
                return st

            k1, k2 = jax.random.split(key)
            state = block(state0, k1)      # compile + warm
            fence(state.weight)

            def run():
                s = block(state0, k2)
                v = fence(s.weight)
                assert np.isfinite(v).all()

            per_nsteps[nsteps] = timed(run, args.reps)
            print(f"# nw={nw} nsteps={nsteps}: "
                  f"{per_nsteps[nsteps]}", file=sys.stderr, flush=True)

        # Marginal per-step cost from the 100-vs-10 difference; fixed
        # dispatch overhead = extrapolation to nsteps=0.
        t10, t100b = per_nsteps[10]["med"], per_nsteps[100]["med"]
        marginal = (t100b - t10) / 90.0
        fixed = t10 - 10.0 * marginal
        results[nw] = {
            "per_nsteps_s": per_nsteps,
            "marginal_step_s": marginal,
            "fixed_dispatch_s": fixed,
            "onchip_walker_steps_per_s": (nw / marginal) if marginal > 0
            else None,
            "e2e_rate_at_nsteps100": nw * 100.0 / t100b,
        }

    out["hubbard"] = results
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
