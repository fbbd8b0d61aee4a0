"""Multi-host initialisation and host-sharded input planning.

The reference's multi-node story was "run a separate process per FASTA
shard" (reference ``swift/cfrk.swf:14-20``).  On a TPU pod slice the
equivalent is one jax process per host inside a single SPMD program:

* :func:`maybe_initialize_distributed` wires ``jax.distributed`` from
  the standard coordinator env vars (no-op on a single host / when
  already initialised);
* :func:`host_shard` deals a file list across hosts so per-read mode
  (zero collectives) reads disjoint inputs per host — the Swift/K
  sharding pattern, without the scheduler;
* global-spectrum / sparse modes then merge across hosts through the
  regular mesh collectives (psum / psum_scatter / all_to_all ride ICI
  within a host and DCN across hosts; XLA picks the transport).
"""

from __future__ import annotations

import os

__all__ = ["maybe_initialize_distributed", "host_shard"]

_COORD_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
)


def maybe_initialize_distributed(force: bool = False) -> bool:
    """Initialise ``jax.distributed`` when a coordinator is configured.

    Returns True if initialisation ran.  Safe to call unconditionally:
    without coordinator env vars (and force=False) it is a no-op, so
    single-host runs need no changes.

    On managed clusters (GKE TPU pods, SLURM) ``initialize()``
    auto-detects everything.  For manual launches the standard triplet
    is read from ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` and passed explicitly (jax only auto-detects on
    recognised cluster environments).
    """
    import jax

    if not force and not any(os.environ.get(v) for v in _COORD_VARS):
        return False
    kwargs = {}
    addr = next(
        (os.environ[v] for v in _COORD_VARS if os.environ.get(v)), None
    )
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e):
            return False
        raise
    return True


def host_shard(paths: list, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """The subset of ``paths`` this host owns (round-robin deal).

    Per-read counting needs no cross-host data exchange, so each host
    streams only its own files — the multi-host analog of the
    reference's one-process-per-shard layout.
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [p for i, p in enumerate(paths) if i % pc == pi]
