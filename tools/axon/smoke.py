"""One tiny jitted block per system family ON THE AMBIENT BACKEND (the axon
TPU when run without overrides). The axon tunnel cannot run *eager* complex
primitives or complex transfers; this script is the canary that every driver
path stays inside those constraints. Run: python tools/axon/smoke.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def rb(x):
    """Real readback (proof of execution)."""
    import jax, jax.numpy as jnp

    return float(np.asarray(jax.jit(lambda v: jnp.sum(jnp.abs(v)))(x)))


def drive(name, ham, trial, nw=8, **kw):
    import jax, jax.numpy as jnp
    from pauxy_tpu.qmc import AFQMC, QMCOpts
    from pauxy_tpu.qmc import afqmc as afq
    from pauxy_tpu.utils.transfer import device_zeros

    t0 = time.time()
    qmc = QMCOpts(nwalkers=nw, dt=0.005, nsteps=3, nblocks=2, nstblz=3,
                  npop_control=1, rng_seed=8)
    af = AFQMC(ham, trial, qmc,
               estimator_options={"mixed": {"energy_eval_freq": 3}},
               verbose=False, filename=f"/tmp/smoke_{name}.h5", **kw)
    state = af.state
    eshift = device_zeros((), state.log_ovlp.dtype)
    statics = dict(nsteps=3, nstblz=3, npop_control=1,
                   pop_method=qmc.pop_control_method, target_weight=float(nw),
                   energy_eval_freq=3, free_projection=False)
    st, acc, _, _ = afq.run_block(
        ham, trial, af.prop, state, jax.random.key(1), eshift,
        jnp.asarray(0, jnp.int32), **statics)
    w = rb(st.weight)
    a = rb(acc)
    assert np.isfinite(w) and np.isfinite(a), (name, w, a)
    print(f"OK {name}: weight={w:.4f} acc={a:.3e} ({time.time()-t0:.1f}s)",
          flush=True)


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    failures = []

    def guard(name, fn):
        try:
            fn()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    def hubbard():
        from pauxy_tpu.models import make_hubbard, free_electron_trial

        ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
        drive("hubbard", ham, free_electron_trial(ham))

    def hubbard_discrete():
        from pauxy_tpu.models import make_hubbard, free_electron_trial

        ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
        drive("hubbard_discrete", ham, free_electron_trial(ham),
              propagator_options={"hubbard_stratonovich": "discrete"})

    def generic():
        from pauxy_tpu.models.generic import make_generic
        from pauxy_tpu.models.trial import rhf_identity_trial

        rng = np.random.default_rng(7)
        nmo = 12
        chol = rng.normal(scale=0.02, size=(nmo, nmo, 30))
        chol = 0.5 * (chol + chol.transpose(1, 0, 2))
        h1 = rng.normal(scale=0.1, size=(nmo, nmo))
        h1 = 0.5 * (h1 + h1.T)
        ham = make_generic((3, 3), np.stack([h1, h1]), chol, ecore=0.0)
        drive("generic", ham, rhf_identity_trial(ham))

    def ueg():
        from pauxy_tpu.models import make_ueg, rhf_identity_trial

        ham = make_ueg(nup=7, ndown=7, rs=1.0, ecut=1.0)
        drive("ueg", ham, rhf_identity_trial(ham))

    def pw_fft():
        from pauxy_tpu.models import make_pw_fft, rhf_identity_trial

        ham = make_pw_fft(nup=2, ndown=2, rs=1.0, ecut=0.5)
        drive("pw_fft", ham, rhf_identity_trial(ham))

    def thermal():
        from pauxy_tpu.models import make_ueg
        from pauxy_tpu.models.thermal_trial import make_one_body_trial
        from pauxy_tpu.qmc.thermal_afqmc import ThermalAFQMC
        from pauxy_tpu.qmc import QMCOpts

        t0 = time.time()
        ham = make_ueg(nup=1, ndown=1, rs=1.0, ecut=0.5)
        beta, dt = 0.25, 0.05
        trial = make_one_body_trial(ham, beta, dt, mu=0.245)
        qmc = QMCOpts(nwalkers=4, dt=dt, nsteps=1, nblocks=2,
                      npop_control=1, rng_seed=8, beta=beta)
        af = ThermalAFQMC(ham, trial, qmc, verbose=False,
                          filename="/tmp/smoke_thermal.h5")
        rows = af.run()
        assert np.isfinite(np.asarray(rows).real).all()
        print(f"OK thermal ({time.time()-t0:.1f}s)", flush=True)

    def ghf():
        from pauxy_tpu.models import make_hubbard, free_electron_trial
        from pauxy_tpu.models.ghf import ghf_trial_from_uhf
        from pauxy_tpu.utils.transfer import to_host

        ham = make_hubbard(nup=3, ndown=3, U=4.0, nx=3, ny=3)
        fe = free_electron_trial(ham)
        trial = ghf_trial_from_uhf(ham, np.asarray(to_host(fe.psia)),
                                   np.asarray(to_host(fe.psib)))
        drive("ghf", ham, trial,
              propagator_options={"hubbard_stratonovich": "discrete"})

    def multi_coherent():
        from pauxy_tpu.models.hubbard_holstein import make_hubbard_holstein
        from pauxy_tpu.models.multi_coherent import multi_coherent_trial

        ham = make_hubbard_holstein(nup=1, ndown=1, U=4.0, nx=3, ny=1,
                                    w0=0.8, lmbda=0.5)
        drive("multi_coherent", ham, multi_coherent_trial(ham))

    def thermal_low_rank():
        from pauxy_tpu.models import make_ueg
        from pauxy_tpu.models.thermal_trial import make_one_body_trial
        from pauxy_tpu.qmc.thermal_afqmc import ThermalAFQMC
        from pauxy_tpu.qmc import QMCOpts

        t0 = time.time()
        ham = make_ueg(nup=1, ndown=1, rs=1.0, ecut=0.5)
        beta, dt = 0.25, 0.05
        trial = make_one_body_trial(ham, beta, dt, mu=0.245)
        qmc = QMCOpts(nwalkers=4, dt=dt, nsteps=1, nblocks=2,
                      npop_control=1, rng_seed=8, beta=beta)
        af = ThermalAFQMC(ham, trial, qmc, verbose=False,
                          walker_options={"low_rank": True},
                          filename="/tmp/smoke_tlr.h5")
        rows = af.run()
        assert np.isfinite(np.asarray(rows).real).all()
        print(f"OK thermal_low_rank ({time.time()-t0:.1f}s)", flush=True)

    def thermal_discrete():
        from pauxy_tpu.models import make_hubbard
        from pauxy_tpu.models.thermal_trial import make_one_body_trial
        from pauxy_tpu.qmc.thermal_afqmc import ThermalAFQMC
        from pauxy_tpu.qmc import QMCOpts

        t0 = time.time()
        ham = make_hubbard(nup=2, ndown=2, U=4.0, nx=2, ny=2)
        beta, dt = 0.5, 0.05
        trial = make_one_body_trial(ham, beta, dt)
        qmc = QMCOpts(nwalkers=4, dt=dt, nsteps=1, nblocks=2,
                      npop_control=2, rng_seed=8, beta=beta)
        af = ThermalAFQMC(
            ham, trial, qmc, verbose=False,
            propagator_options={"hubbard_stratonovich": "discrete"},
            filename="/tmp/smoke_thermal_discrete.h5")
        rows = af.run()
        assert np.isfinite(np.asarray(rows).real).all()
        print(f"OK thermal_discrete ({time.time()-t0:.1f}s)", flush=True)

    for name, fn in [("hubbard", hubbard),
                     ("hubbard_discrete", hubbard_discrete),
                     ("generic", generic), ("ueg", ueg),
                     ("pw_fft", pw_fft), ("thermal", thermal),
                     ("ghf", ghf), ("multi_coherent", multi_coherent),
                     ("thermal_low_rank", thermal_low_rank),
                     ("thermal_discrete", thermal_discrete)]:
        guard(name, fn)

    if failures:
        print("SMOKE FAILURES:", failures, flush=True)
        sys.exit(1)
    print("ALL SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
