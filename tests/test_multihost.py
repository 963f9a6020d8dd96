"""Multi-PROCESS (DCN-analogue) dry run: 2 jax.distributed processes x 2
virtual CPU devices, one walker-sharded block across the process boundary,
and a sharded-checkpoint save/restore where each process touches only the
shard files it addresses (reference analogue: mpio collective-HDF5 restart,
``pauxy/walkers/handler.py:151,444-509``)."""

import pytest


@pytest.mark.integration
def test_dryrun_multihost():
    import __graft_entry__ as g

    g.dryrun_multihost(n_processes=2, devices_per_process=2)
