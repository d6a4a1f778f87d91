"""Multi-host initialization.

The reference has no distributed backend at all (SURVEY §2: zero
NCCL/MPI/Gloo references).  Here, multi-host runs initialize the JAX
distributed runtime and build the same ('dp','ip') mesh over all hosts'
devices — ICI within a host/slice, DCN across; the ShardedEngine's
collectives are unchanged because shard_map + NamedSharding place them.

Usage (one process per host):

    from cu2rec_tpu.parallel.distributed import initialize
    initialize(coordinator="host0:1234", num_processes=4, process_id=rank)
    engine = ShardedEngine(train_csr, test_csr, cfg)   # global devices

On TPU pods the three arguments are inferred from the environment and may
be omitted.  For CPU-based testing, set ``jax_num_cpu_devices`` per
process before calling (see tests/test_distributed.py).
"""

from __future__ import annotations

import jax


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()
