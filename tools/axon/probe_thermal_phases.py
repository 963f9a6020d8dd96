"""Per-phase breakdown of one thermal UEG slice at the bench shape.

Times, on the real chip, the candidate hot phases of
ThermalContinuous.propagate at the bench config (M=93, nw=256, beta=2,
stack_size=10 -> nbins=4):

  sample_b      force bias + dense_bv Taylor + BH1 sandwich
  update_stack  stack push einsums
  qdt_product   the stratified fold (nbins sequential cpqr + matmuls)
  greens        qdt_product + assembly/inversion + logdet
  one cpqr      a single fold-shape factorization

Each phase is timed as jit(checksum(phase(...))) with a HOST READBACK of
the scalar checksum — on the axon tunnel ``block_until_ready`` does not
fence, so the readback is the only honest timing barrier.

Usage: python tools/axon/probe_thermal_phases.py [--nw 256] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def checksum(out):
    import jax
    import jax.numpy as jnp

    return sum(
        jnp.sum(jnp.abs(leaf))
        for leaf in jax.tree_util.tree_leaves(out)
        if hasattr(leaf, "dtype")
    )


def timeit(fn, *args, reps=3):
    """fn must return a scalar; float() readback is the fence."""
    val = float(fn(*args))  # compile + warm
    assert np.isfinite(val), val
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nw", type=int, default=256)
    ap.add_argument("--beta", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pauxy_tpu.models import make_ueg
    from pauxy_tpu.models.thermal_trial import make_one_body_trial
    from pauxy_tpu.propagation.thermal import make_thermal_propagator
    from pauxy_tpu.walkers import thermal_state as tws
    from pauxy_tpu.estimators import thermal as th
    from pauxy_tpu.ops import cpqr

    beta, dt = args.beta, 0.05
    ham = make_ueg(nup=7, ndown=7, rs=1.0, ecut=4.0)
    trial = make_one_body_trial(ham, beta, dt, mu=0.9)
    prop = make_thermal_propagator(ham, trial, dt)
    nw = args.nw
    m = int(ham.nbasis)
    print({"M": m, "nbins": int(trial.nbins),
           "stack_size": int(trial.stack_size)}, flush=True)

    state = tws.init_thermal_walkers(trial, nw)
    key = jax.random.PRNGKey(0)

    full = jax.jit(
        lambda pr, tr, s, k: checksum(pr.propagate(tr, s, k, 3)))
    t_full = timeit(full, prop, trial, state, key)
    print(f"full slice        : {1e3 * t_full:8.1f} ms", flush=True)

    sample = jax.jit(
        lambda pr, s, k: checksum(pr._sample_b(s, k, s.log_m0.dtype)))
    t_sb = timeit(sample, prop, state, key)
    print(f"  sample_b        : {1e3 * t_sb:8.1f} ms", flush=True)

    b, _cfb, _cmf = jax.jit(
        lambda pr, s, k: pr._sample_b(s, k, s.log_m0.dtype))(
            prop, state, key)
    upd = jax.jit(
        lambda tr, s, bb: checksum(tws.update_stack(tr, s, bb, 3)))
    t_st = timeit(upd, trial, state, b)
    print(f"  update_stack    : {1e3 * t_st:8.1f} ms", flush=True)

    state3 = jax.jit(lambda tr, s, bb: tws.update_stack(tr, s, bb, 3))(
        trial, state, b)
    stack_s = jnp.swapaxes(state3.stack, 1, 2)

    qdt = jax.jit(lambda s: checksum(th.qdt_product(s)))
    t_qdt = timeit(qdt, stack_s)
    print(f"  qdt_product     : {1e3 * t_qdt:8.1f} ms", flush=True)

    gf = jax.jit(lambda s: checksum(th.greens_function_qdt_logdet(s)))
    t_gf = timeit(gf, stack_s)
    print(f"  greens (qdt+asm): {1e3 * t_gf:8.1f} ms "
          f"(assembly ~{1e3 * (t_gf - t_qdt):.1f} ms)", flush=True)

    b0 = stack_s[:, :, 0].reshape((-1, m, m))
    one = jax.jit(lambda x: checksum(cpqr.cpqr(x)))
    t_c1 = timeit(one, b0)
    print(f"  one cpqr [{b0.shape[0]},{m},{m}]: {1e3 * t_c1:8.1f} ms",
          flush=True)

    print(f"accounted: sample {1e3*t_sb:.0f} + stack {1e3*t_st:.0f} + "
          f"greens {1e3*t_gf:.0f} = "
          f"{1e3*(t_sb+t_st+t_gf):.0f} ms vs full {1e3*t_full:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
