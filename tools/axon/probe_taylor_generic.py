"""On-chip probes for the Generic Taylor GEMM chain's MFU ceiling
(VERDICT r4 item 6): the order-6 expm-apply is 6 batched
[w, M, M] x [w, M, 2n] complex GEMMs whose narrow RHS (2n = 32 of the
128-wide lane tile) wastes 3/4 of every MXU pass. Each candidate
reformulation is timed readback-fenced at the bench shape
(w=1024, M=128, n=16 -> RHS 32) against the baseline, at f32/HIGHEST
and at the bfloat16_3x ladder tier:

  base      — the production chain (propagation/generic.apply_exponential_taylor)
  rhs_major — transposed recurrence temp' = (temp^T) (vhs^T): the narrow
              axis moves to the SUBLANE dim (8-granular) instead of the
              lane dim (128-granular)
  pair2     — 2 walkers packed block-diagonally into [2M, 2M] x [2M, 4n]
  pair4     — 4 walkers, [4M, 4M] x [4M, 8n]
  realsplit — explicit 3M (Karatsuba) complex multiply, 3 real GEMM
              chains instead of XLA's complex lowering
  pallas    — fused VMEM kernel (ops/taylor_pallas.py), bf16 tier only

Results land in docs/PERFORMANCE.md's probe ledger.

TUNNEL-PHASE CAVEAT (measured 2026-08-20): the axon tunnel has slow
phases where every rate is uniformly ~18x down AND relative orderings
shift (a wedged run showed realsplit "1.46x faster"; a healthy rerun
minutes later showed the two within 2%). Each tier therefore re-times
``base`` at the END as ``base2`` — if base2 deviates from base by more
than ~20%, discard the whole tier's ordering and rerun.

Usage: python tools/axon/probe_taylor_generic.py [--w 1024] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--n", type=int, default=32)   # 2n: spin-concat RHS
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pauxy_tpu import config
    from pauxy_tpu.propagation.generic import apply_exponential_taylor
    from pauxy_tpu.utils.transfer import to_device

    w, m, n, iters = args.w, args.m, args.n, args.iters
    rng = np.random.default_rng(0)

    def dev_c(shape, scale=1.0):
        a = (scale * rng.normal(size=shape)).astype(np.float32)
        b = (scale * rng.normal(size=shape)).astype(np.float32)
        return jax.jit(lambda p, q: (p + 1j * q).astype(jnp.complex64))(
            to_device(a), to_device(b))

    vhs = dev_c((w, m, m), scale=0.3 / np.sqrt(m))
    phi = dev_c((w, m, n))

    # Effective FLOPs of the baseline algorithm (complex MAC = 8 real):
    flops = 6 * 8 * w * m * m * n * iters

    def timed(name, fn, *operands):
        jf = jax.jit(fn)
        out = jf(*operands)
        np.asarray(jax.tree_util.tree_leaves(out)[0].real)  # fence
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(*operands)
            np.asarray(jax.tree_util.tree_leaves(out)[0].real)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:20s} {1e3 * best / iters:8.2f} ms/chain "
              f"{flops / best / 1e12:7.2f} TF/s-effective", flush=True)
        return best

    def chain(body):
        def run(vhs, phi):
            def it(i, p):
                return body(vhs, p)
            return jax.lax.fori_loop(0, iters, it, phi)
        return run

    def base_body(vhs, p):
        return apply_exponential_taylor(vhs, p)

    def rhs_major_body(vhs, p):
        # temp [w, n, m]: narrow axis on sublanes; lanes carry M=128.
        def body(k, carry):
            temp, acc = carry
            temp = jnp.einsum("wnq,wpq->wnp", temp, vhs,
                              optimize=True) / k
            return temp, acc + temp
        pt = jnp.swapaxes(p, -1, -2)
        _, out = jax.lax.fori_loop(1, 7, body, (pt, pt))
        return jnp.swapaxes(out, -1, -2)

    def packed_body(k_pack):
        """Block-diagonal walker packing: LHS [wb, kM, kM] (k VHS blocks
        on the diagonal), RHS row-stacked [wb, kM, n]. Fewer, bigger
        batch elements (wb = w/k) at k x the raw tile work — probes
        whether XLA's per-batch-element GEMM overhead or raw tile work
        dominates at this shape."""
        def run(vhs, p):
            wb = w // k_pack
            vb = jnp.zeros((wb, k_pack * m, k_pack * m), vhs.dtype)
            v4 = vhs.reshape(wb, k_pack, m, m)
            for i in range(k_pack):
                vb = vb.at[:, i * m:(i + 1) * m, i * m:(i + 1) * m].set(
                    v4[:, i])
            pb = p.reshape(wb, k_pack * m, n)
            def body(kk, carry):
                temp, acc = carry
                temp = jnp.einsum("wpq,wqn->wpn", vb, temp,
                                  optimize=True) / kk
                return temp, acc + temp
            def it(i, pp):
                _, out = jax.lax.fori_loop(1, 7, body, (pp, pp))
                return out
            return jax.lax.fori_loop(0, iters, it, pb)
        return run

    def realsplit_body(vhs, p):
        vr, vi = vhs.real, vhs.imag
        def body(k, carry):
            tr, ti, ar, ai = carry
            # 3M: m1 = vr (tr+ti), m2 = tr (vi - vr)... use the classic
            # Karatsuba split: p1 = vr tr, p2 = vi ti, p3 = (vr+vi)(tr+ti).
            p1 = jnp.einsum("wpq,wqn->wpn", vr, tr, optimize=True)
            p2 = jnp.einsum("wpq,wqn->wpn", vi, ti, optimize=True)
            p3 = jnp.einsum("wpq,wqn->wpn", vr + vi, tr + ti,
                            optimize=True)
            tr, ti = (p1 - p2) / k, (p3 - p1 - p2) / k
            return tr, ti, ar + tr, ai + ti
        tr, ti = p.real, p.imag
        _, _, ar, ai = jax.lax.fori_loop(1, 7, body, (tr, ti, tr, ti))
        return ar + 1j * ai

    for tier in ("float32", "bfloat16_3x"):
        got = config.set_matmul_precision(tier)
        print(f"--- tier {tier} (active: {got}) ---", flush=True)
        timed("base", chain(base_body), vhs, phi)
        timed("rhs_major", chain(rhs_major_body), vhs, phi)
        timed("realsplit", chain(realsplit_body), vhs, phi)
        for kp in (2, 4):
            try:
                timed(f"pair{kp}", packed_body(kp), vhs, phi)
            except Exception as e:  # noqa: BLE001 — probe records failures
                print(f"pair{kp}: {type(e).__name__}: {str(e)[:100]}",
                      flush=True)
        if tier == "bfloat16_3x":
            from pauxy_tpu.ops.taylor_pallas import apply_taylor_pallas

            def pallas_body(vhs, p):
                return apply_taylor_pallas(vhs, p, lowp=True)
            try:
                timed("pallas_bf16", chain(pallas_body), vhs, phi)
            except Exception as e:  # noqa: BLE001
                print(f"pallas_bf16: {type(e).__name__}: {str(e)[:100]}",
                      flush=True)
        # Tunnel-phase control (see module docstring): base re-timed last.
        timed("base2", chain(base_body), vhs, phi)
    config.set_matmul_precision("float32")


if __name__ == "__main__":
    main()
