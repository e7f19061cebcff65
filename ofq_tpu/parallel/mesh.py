"""Device mesh and sharding rules.

The reference's only distribution strategy is single-node DDP over NCCL
(reference: train.py:474, 718-727, mp.spawn at 1093).  The TPU-native
equivalent is a single jitted program over a `Mesh`:

  * axis 'data'  — batch sharding; gradient reduction becomes an XLA
    all-reduce over ICI (what DDP's NCCL all-reduce did),
  * axis 'model' — optional tensor parallelism over attention heads and
    MLP hidden units (absent in the reference; sized 1 by default).

Sharding is expressed declaratively: every param gets a PartitionSpec from
`param_spec`, inputs are batch-sharded, and GSPMD propagates the rest —
including the StatsQ per-output-column scale reductions, which stay local
to the 'model' shard because the mean reduces over the replicated in-axis.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


# Kernels sharded over the 'model' axis: (path-suffix, spec).
# Column-parallel producers (out axis sharded) feed row-parallel consumers
# (in axis sharded) so each block needs only one all-reduce, mirroring the
# Megatron layout — expressed purely as param annotations for GSPMD.
def param_spec(path, leaf) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    if len(names) >= 2:
        parent, leafname = names[-2], names[-1]
        if leafname == "kernel":
            if parent in ("qkv", "fc1"):
                return P(None, "model")   # column parallel
            if parent in ("proj", "fc2"):
                return P("model", None)   # row parallel
        if leafname == "bias" and parent in ("qkv", "fc1"):
            return P("model")
        if leafname in ("q_kernel", "k_kernel", "v_kernel"):
            return P(None, "model")
        if leafname == "v_bias":
            return P("model")
    return P()  # replicated


def shard_params(params, mesh: Mesh):
    """device_put the param pytree with the declarative specs.

    Downstream state (Adam moments, EMA) is created *inside* jit from these
    sharded params, so GSPMD propagates matching shardings automatically —
    no hand-built opt-state sharding tree needed.
    """
    shardings = jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, param_spec(p, x)), params)
    return jax.device_put(params, shardings)


def batch_shardings(mesh: Mesh):
    """Inputs: batch axis over 'data'."""
    return {
        "image": NamedSharding(mesh, P("data")),
        "label": NamedSharding(mesh, P("data")),
    }


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
