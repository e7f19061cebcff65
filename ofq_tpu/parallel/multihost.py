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
import os
from typing import Optional

import jax
import numpy as np

_logger = logging.getLogger("ofq_tpu")

# Environment markers of a real multi-host launch (GKE/GCE TPU pods,
# manual rendezvous) — checkable WITHOUT initializing the local backend.
_COORD_ENV_HINTS = ("MEGASCALE_COORDINATOR_ADDRESS",
                    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")


def _pod_env_markers() -> list[str]:
    """Env vars that declare a MULTI-host launch.  TPU_WORKER_HOSTNAMES
    counts only with >1 entry: single-host TPU VMs (incl. this repo's
    dev box) set it to one hostname at interpreter startup."""
    markers = [k for k in _COORD_ENV_HINTS if os.environ.get(k)]
    hosts = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
             if h.strip()]
    if len(hosts) > 1:
        markers.append("TPU_WORKER_HOSTNAMES")
    return markers


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
        # On a failed init we must NOT query jax.process_count() — that
        # initializes the local backend (the very thing the docstring
        # forbids) and always answers 1, which round-3 review found made
        # the old multi-process guard dead code.  Decide from the launch
        # intent instead: explicit multi-process args or pod environment
        # markers mean a real pod launch, where continuing would silently
        # run N independent trainings that all believe they are rank 0
        # and clobber the same checkpoint directory.
        explicit_multi = (num_processes not in (None, 1)
                          or coordinator_address is not None
                          or process_id not in (None, 0))
        pod_env = _pod_env_markers()
        if explicit_multi or pod_env:
            raise RuntimeError(
                "jax.distributed.initialize failed on what is declared a "
                "multi-process launch "
                f"({'explicit args' if explicit_multi else pod_env}); "
                "refusing to continue as independent single-host "
                "trainings") from e
        _logger.debug("multihost init skipped (single-host): %s", e)


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
