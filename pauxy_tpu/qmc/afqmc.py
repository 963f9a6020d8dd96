"""Zero-temperature AFQMC driver.

TPU-native counterpart of ``pauxy/qmc/afqmc.py:27-330``. The reference's hot
loop — a Python ``for`` over steps containing a Python ``for`` over walkers
(``afqmc.py:223-255``) — becomes ONE jitted ``lax.scan`` over the steps of a
block, with the whole walker population propagated as batched linear algebra
and population control / re-orthogonalisation dispatched by ``lax.cond`` on
the step index. Only block boundaries touch the host (stdout/HDF5 row,
eshift update).

Multi-chip: the walker axis of the state pytree is sharded over a
``jax.sharding.Mesh``; the same step program then runs SPMD with XLA
inserting the collectives (sums for estimators, gather traffic for
population control) over ICI.
"""

from __future__ import annotations

import functools
import uuid

import jax
import jax.numpy as jnp
import numpy as np

from pauxy_tpu import config
from pauxy_tpu.estimators import mixed
from pauxy_tpu.propagation import continuous
from pauxy_tpu.utils.io import H5EstimatorHelper, create_estimates_file
from pauxy_tpu.qmc.options import QMCOpts
from pauxy_tpu.walkers import pop_control as pc
from pauxy_tpu.walkers import state as walker_state


@functools.partial(
    jax.jit,
    static_argnames=(
        "nsteps",
        "nstblz",
        "npop_control",
        "pop_method",
        "target_weight",
        "energy_eval_freq",
        "free_projection",
    ),
)
def run_block(
    ham,
    trial,
    prop,
    state,
    block_key,
    eshift,
    step0,
    *,
    nsteps: int,
    nstblz: int,
    npop_control: int,
    pop_method: str,
    target_weight: float,
    energy_eval_freq: int,
    free_projection: bool,
):
    """Run ``nsteps`` QMC steps and return (state, summed accumulator).

    Step ordering matches ``afqmc.py:223-255``: reortho (on nstblz steps),
    propagate, weight cap at 10% of total weight, population control (on
    npop_control steps), estimator update.
    """

    def one_step(state, inp):
        step, key = inp
        kprop, kpop = jax.random.split(key)

        state = jax.lax.cond(
            step % nstblz == 0,
            lambda s: walker_state.orthogonalise(s, free_projection),
            lambda s: s,
            state,
        )

        state = prop.propagate(trial, state, kprop, eshift)

        # Cap runaway weights at 10% of the total (afqmc.py:235-236).
        cap = 0.10 * state.total_weight
        state = state.replace(
            weight=jnp.where(
                (step > 1) & (jnp.abs(state.weight) > cap), cap, state.weight
            )
        )

        state = jax.lax.cond(
            step % npop_control == 0,
            lambda s: pc.pop_control(s, kpop, target_weight, pop_method),
            lambda s: s,
            state,
        )

        acc = mixed.update(
            ham,
            trial,
            state,
            eval_energy=(step % energy_eval_freq == 0),
            free_projection=free_projection,
        )
        return state, acc

    steps = step0 + 1 + jnp.arange(nsteps)
    keys = jax.random.split(block_key, nsteps)
    state, accs = jax.lax.scan(one_step, state, (steps, keys))
    return state, jnp.sum(accs, axis=0)


class AFQMC:
    """Zero-temperature AFQMC simulation.

    Parameters mirror the reference driver's constituents: a Hamiltonian
    container, a trial wavefunction, QMC options and propagator options.
    """

    def __init__(
        self,
        ham,
        trial,
        qmc: QMCOpts,
        propagator_options: dict | None = None,
        estimator_options: dict | None = None,
        verbose: bool = False,
        filename: str | None = None,
        precision=None,
    ):
        self.uuid = str(uuid.uuid1())
        self.ham = ham
        self.trial = trial
        self.qmc = qmc
        self.verbose = verbose
        self.prec = config.get_precision(precision)
        popts = dict(propagator_options or {})
        eopts = dict(estimator_options or {})

        self.free_projection = popts.get("free_projection", False)
        self.hybrid = popts.get("hybrid", True)

        self.prop = self._build_propagator(popts)
        # Discrete propagation reports the projected (not hybrid) energy as
        # the shift (hubbard.py:82 sets hybrid=False).
        self.hybrid = getattr(self.prop, "hybrid", self.hybrid)

        self.state = walker_state.init_walkers(
            trial, qmc.nwalkers, total_weight=float(qmc.nwalkers)
        )
        self.eshift = 0.0

        mixed_opts = eopts.get("mixed", {})
        self.energy_eval_freq = mixed_opts.get("energy_eval_freq", qmc.nsteps)
        if filename is None:
            filename = eopts.get("filename", "estimates.0.h5")
        self.filename = filename
        create_estimates_file(
            filename,
            mixed.HEADER,
            metadata=self._metadata(popts),
        )
        self.reporter = mixed.MixedReporter(
            qmc.nsteps,
            output=H5EstimatorHelper(filename, "basic"),
            verbose=verbose,
        )

        seed = qmc.rng_seed if qmc.rng_seed is not None else 7
        self.key = jax.random.key(seed)
        self.step = 0

    # ------------------------------------------------------------------
    def _build_propagator(self, popts: dict):
        name = self.ham.name
        hs = popts.get("hubbard_stratonovich", "continuous")
        if "discrete" in hs:
            # Discrete Hirsch propagator (propagation/utils.py:8-45 dispatch).
            if name != "Hubbard":
                raise NotImplementedError(
                    f"no discrete propagator for system {name!r}"
                )
            from pauxy_tpu.propagation.hirsch import make_hirsch

            return make_hirsch(
                self.ham,
                self.trial,
                self.qmc.dt,
                charge_decomposition=popts.get("charge_decomposition", False),
                free_projection=self.free_projection,
                precision=self.prec,
            )
        if name == "Hubbard":
            from pauxy_tpu.propagation.hubbard import make_hubbard_continuous

            inner = make_hubbard_continuous(
                self.ham,
                self.trial,
                self.qmc.dt,
                charge_decomposition=popts.get("charge_decomposition", True),
                precision=self.prec,
            )
        elif name == "Generic":
            from pauxy_tpu.propagation.generic import make_generic_continuous

            inner = make_generic_continuous(
                self.ham, self.trial, self.qmc.dt, precision=self.prec
            )
        elif name == "UEG":
            from pauxy_tpu.propagation.planewave import make_planewave

            inner = make_planewave(
                self.ham, self.trial, self.qmc.dt, precision=self.prec
            )
        else:
            raise NotImplementedError(f"no propagator for system {name!r}")
        return continuous.Continuous(
            inner=inner,
            dt=self.qmc.dt,
            free_projection=self.free_projection,
            hybrid=self.hybrid,
            force_bias=popts.get("force_bias", not self.free_projection),
        )

    def _metadata(self, popts: dict) -> dict:
        return {
            "uuid": self.uuid,
            "system": {
                "name": self.ham.name,
                "nup": self.ham.nup,
                "ndown": self.ham.ndown,
                "nbasis": self.ham.nbasis,
            },
            "qmc": {
                "nwalkers": self.qmc.nwalkers,
                "dt": self.qmc.dt,
                "nsteps": self.qmc.nsteps,
                "nblocks": self.qmc.nblocks,
                "nstblz": self.qmc.nstblz,
                "npop_control": self.qmc.npop_control,
                "rng_seed": self.qmc.rng_seed,
            },
            "trial": {"name": self.trial.name, "etrial": self.trial.etrial},
            "propagators": {
                "free_projection": self.free_projection,
                "hybrid": self.hybrid,
            },
            "estimators": {"mixed": {"energy_eval_freq": self.energy_eval_freq}},
        }

    # ------------------------------------------------------------------
    def run_block(self):
        """Advance one block (nsteps) and report."""
        self.key, sub = jax.random.split(self.key)
        rdtype = self.state.weight.dtype
        self.state, acc = run_block(
            self.ham,
            self.trial,
            self.prop,
            self.state,
            sub,
            jnp.asarray(self.eshift, self.state.log_ovlp.dtype),
            jnp.asarray(self.step, jnp.int32),
            nsteps=self.qmc.nsteps,
            nstblz=self.qmc.nstblz,
            npop_control=self.qmc.npop_control,
            pop_method=self.qmc.pop_control_method,
            target_weight=float(self.qmc.nwalkers),
            energy_eval_freq=self.energy_eval_freq,
            free_projection=self.free_projection,
        )
        self.step += self.qmc.nsteps
        from pauxy_tpu.utils.transfer import to_host

        row = self.reporter.block_row(self.step, to_host(acc))
        # eshift follows the latest block estimate (afqmc.py:251-254).
        if self.step < self.qmc.neqlb:
            self.eshift = self.reporter.get_shift(self.hybrid)
        else:
            self.eshift = self.reporter.get_shift()
        return row

    def run(self):
        """Run all blocks (``afqmc.py:200-255``)."""
        if self.verbose:
            self.reporter.print_header()
        rows = [self.run_block() for _ in range(self.qmc.nblocks)]
        return np.array(rows)
