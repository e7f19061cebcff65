"""Orbax checkpointing with CheckpointSaver-compatible retention.

Reference semantics (timm CheckpointSaver, train.py:791-808 + auto-resume
at :698-706):
  * rank-0 writes `last` every epoch plus a retained set of the best-k
    checkpoints by the eval metric (`--checkpoint-hist`, default 10),
  * `args.yaml` dumped alongside,
  * auto-resume from `<output>/<experiment>/last` when present,
  * `--initial-checkpoint` loads weights only (strict=False).

Implemented with orbax CheckpointManager (async-capable, multi-host safe).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def abstract_like(state) -> Any:
    """Abstract pytree carrying shape/dtype AND the *current* sharding of
    every leaf, for StandardRestore.

    `jax.eval_shape(lambda: state)` drops shardings, which makes orbax
    fall back to the sharding file written at save time — wrong (and
    "unsafe", per orbax's own warning) when the runtime mesh topology
    differs from the save-time one.  Passing the live target state's
    shardings makes orbax re-shard on load, so a checkpoint saved under
    e.g. {'data': 8} restores correctly under {'data': 4, 'model': 2} or
    a single device (the reference resumes across world sizes,
    train.py:691-706)."""

    def leaf(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                    sharding=getattr(x, "sharding", None))

    return jax.tree.map(leaf, state)


def make_manager(directory: str, *, max_to_keep: int = 10,
                 metric_name: str = "top1") -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        best_fn=lambda m: m.get(metric_name, float("-inf")),
        best_mode="max",
        create=True,
        # async: the device->host copy is synchronous inside save() (so
        # donated buffers are safe to reuse immediately), the disk/GCS
        # write overlaps the next epoch — no epoch-boundary stall on pods.
        enable_async_checkpointing=True,
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_epoch(mgr: ocp.CheckpointManager, epoch: int, state,
               metrics: Optional[dict] = None) -> None:
    """Async save; call mgr.wait_until_finished() before process exit or
    before restoring from the same directory."""
    mgr.save(
        epoch,
        args=ocp.args.StandardSave(state),
        metrics={k: float(v) for k, v in (metrics or {}).items()},
    )


def restore_latest(mgr: ocp.CheckpointManager, abstract_state) -> tuple[Any, int]:
    """Restore the newest checkpoint; returns (state, next_epoch)."""
    step = mgr.latest_step()
    if step is None:
        return None, 0
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
    return state, step + 1


def restore_best(mgr: ocp.CheckpointManager, abstract_state):
    step = mgr.best_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
