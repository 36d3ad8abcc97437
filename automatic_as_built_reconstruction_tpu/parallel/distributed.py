"""Multi-host (multi-slice / DCN) initialization.

Within one pod slice, ``jit`` + shardings ride ICI and need no setup.
Across hosts/slices, JAX needs ``jax.distributed.initialize`` before any
backend touch; this module wraps it with environment autodetection so the
same ``train --num_devices`` CLI scales from one chip to a multi-host
fleet [ref: SURVEY.md §2.8/§5.8 — the reference has no comm backend at
all; this is the TPU-native upgrade path].

Usage (identical program on every host):

    from automatic_as_built_reconstruction_tpu.parallel import distributed
    distributed.ensure_initialized()          # no-op on single host
    train(cfg, model_dir, num_devices=len(jax.devices()))

On Cloud TPU the coordinator/process-id/process-count are autodetected by
JAX; elsewhere pass them explicitly or via the standard env vars
(``JAX_COORDINATOR_ADDRESS``, ``JAX_PROCESS_ID``, ``JAX_NUM_PROCESSES``).
"""
from __future__ import annotations

import os
from typing import Optional

_initialized = False


def multi_host_env() -> Optional[dict]:
    """Distributed settings from env vars, or None for single-host."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if not addr or not nproc or int(nproc) <= 1:
        return None
    return {
        "coordinator_address": addr,
        "num_processes": int(nproc),
        "process_id": int(os.environ.get("JAX_PROCESS_ID", "0")),
    }


def ensure_initialized(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed once; returns True if multi-host.

    Explicit args > env vars > single-host no-op.  Must run before the
    first JAX backend use on every host.
    """
    global _initialized
    if _initialized:
        return True
    if coordinator_address is None:
        env = multi_host_env()
        if env is None:
            return False
        coordinator_address = env["coordinator_address"]
        num_processes = env["num_processes"]
        process_id = env["process_id"]
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return True


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch (per-host input
    sharding: each host feeds its own shard of every global batch)."""
    import jax
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
