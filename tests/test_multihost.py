"""Real two-process multi-host execution (reference DDP role,
``/root/reference/main.py:17-20``, ``datasets/dataset_utils.py:502-598``).

``__graft_entry__.dryrun_multihost`` spawns 2 REAL processes, each with 4
virtual CPU devices, joined through ``jax.distributed.initialize`` (Gloo
collectives): host-strided train loaders, multi-process ``shard_batch``
(global batch = concat over hosts — the reference's per-rank batch_size
semantics), a shard_map'd train step over the GLOBAL 8-device mesh,
host-local eval with ``process_allgather`` count reduction, and a
CHAMMI-style replicated-eval row-alignment check. The run asserts the train
losses match a single-process 8-device run of the same program (rtol 1e-4)
and the eval counts are identical.
"""

import os
import sys

import pytest


@pytest.mark.slow
def test_two_process_multihost_matches_single_process():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    # spawns its own subprocesses with explicit JAX_PLATFORMS/XLA_FLAGS env —
    # independent of this process's jax state; raises on any mismatch
    g.dryrun_multihost(2, port=12841)
