"""Device mesh + walker-axis sharding.

The reference parallelizes over MPI ranks: walkers split per rank
(``pauxy/qmc/afqmc.py:167-176``), Allgather/Reduce collectives for population
control and estimators (``walkers/handler.py:230``, ``estimators/
mixed.py:261``), point-to-point walker exchange for branching.

Here: ONE program over global arrays. The walker axis is sharded over a 1-D
``jax.sharding.Mesh``; the jitted block program is compiled SPMD and XLA
inserts the collectives (psum-like reductions for the estimator sums,
all-to-all gathers for the comb permutation) over ICI. Multi-host (DCN) uses
the same code path with a larger mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WALKER_AXIS = "walker"


def walker_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'walker'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (WALKER_AXIS,))


def shard_walkers(state, mesh: Mesh):
    """Place a WalkerState with the walker axis sharded over the mesh.

    Per-walker arrays get P('walker', ...); scalars (total_weight) are
    replicated. Equivalent to the reference's per-rank walker split at
    ``afqmc.py:167-176`` — but the global arrays stay addressable.
    """
    sharded = NamedSharding(mesh, P(WALKER_AXIS))
    replicated = NamedSharding(mesh, P())

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1:
            return jax.device_put(x, sharded)
        return jax.device_put(x, replicated)

    return jax.tree_util.tree_map(place, state)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (Hamiltonian/trial/propagator tables) on the mesh."""
    replicated = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x), replicated), tree
    )
