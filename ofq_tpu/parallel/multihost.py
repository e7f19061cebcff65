"""Multi-host (pod) support.

The reference is single-node only (`mp.spawn` over local GPUs,
train.py:1093).  On TPU pods the same SPMD program spans hosts: each host
runs this code once, `jax.distributed.initialize()` wires DCN, and the
global mesh covers every chip — gradients ride ICI within a slice and DCN
across slices, inserted by GSPMD with no hand-written comm layer
(SURVEY.md §2.6's TPU-native equivalence).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

_logger = logging.getLogger("ofq_tpu")


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed bring-up.

    With TPU metadata available (GKE/GCE pods) all arguments are inferred;
    explicit values support manual rendezvous.  Single-process runs are a
    no-op.  Must run before any backend use — do NOT query jax.devices()/
    process_count() first (that would initialize the local backend and
    defeat distributed bring-up).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        _logger.info("multihost: process %d/%d, %d local / %d global devices",
                     jax.process_index(), jax.process_count(),
                     jax.local_device_count(), jax.device_count())
    except Exception as e:  # single-host dev boxes
        if jax.process_count() > 1 or num_processes not in (None, 1):
            _logger.warning("multihost init FAILED (%s); continuing as "
                            "independent single-host processes", e)
        else:
            _logger.debug("multihost init skipped: %s", e)


def host_batch_slice(global_batch: int) -> tuple[int, int]:
    """(per-host batch, offset) for host-local data loading: each host
    feeds its shard of the global batch; `jax.make_array_from_process_
    local_data` assembles the sharded global array."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    per = global_batch // n
    return per, per * jax.process_index()


def local_to_global(batch: dict, mesh, batch_sharding) -> dict:
    """Assemble host-local numpy batches into globally-sharded jax arrays."""
    out = {}
    for k, v in batch.items():
        sharding = batch_sharding[k]
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.asarray(v), global_shape)
    return out
