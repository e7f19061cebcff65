"""Worker for the real multi-process multihost smoke test.

Launched twice (process_id 0/1) by tests/test_multihost.py.  Each process
owns 2 virtual CPU devices; jax.distributed wires them into one 4-device
global mesh.  Exercises initialize_multihost, host_batch_slice,
local_to_global, a jitted train step and a global eval batch end-to-end —
the code path a TPU pod runs, minus the ICI.
"""

import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    coordinator = sys.argv[2]
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()

    from ofq_tpu.parallel import initialize_multihost

    initialize_multihost(coordinator_address=coordinator,
                         num_processes=2, process_id=proc_id)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    from ofq_tpu.models import DeiTConfig, VisionTransformer
    from ofq_tpu.parallel import (
        batch_shardings,
        host_batch_slice,
        local_to_global,
        make_mesh,
        shard_params,
    )
    from ofq_tpu.quant import default_deit_qmodules, policy_from_args
    from ofq_tpu.train import TrainState, make_eval_step, make_train_step

    pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                           qmodules=default_deit_qmodules(2))
    cfg = DeiTConfig(img_size=16, patch_size=8, embed_dim=12, depth=2,
                     num_heads=2, num_classes=5)
    model = VisionTransformer(cfg=cfg, policy=pol)

    global_batch = 8
    per_host, offset = host_batch_slice(global_batch)
    assert per_host == 4 and offset == 4 * proc_id

    # identical calibration on every host (host-invariant init contract)
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.normal(size=(global_batch, 16, 16, 3)),
                        jnp.float32)
    variables = jax.jit(
        lambda k, xx: model.init({"params": k}, xx, train=False)
    )(jax.random.key(0), calib)

    mesh = make_mesh()  # all 4 global devices
    tx = optax.adam(1e-3)
    with jax.set_mesh(mesh):
        params = {**variables,
                  "params": shard_params(variables["params"], mesh)}
        state = jax.jit(lambda p: TrainState.create(p, tx))(params)
        step = jax.jit(make_train_step(model, tx, loss_kind="ce"))
        bs = batch_shardings(mesh)

        # each host contributes ITS slice of the global batch
        full = np.asarray(
            np.random.default_rng(1).normal(
                size=(global_batch, 16, 16, 3)), np.float32)
        labels = (np.arange(global_batch) % 5).astype(np.int32)
        local = {"image": full[offset:offset + per_host],
                 "label": labels[offset:offset + per_host]}
        dev_batch = local_to_global(local, mesh, bs)
        assert dev_batch["image"].shape == (global_batch, 16, 16, 3)

        state, metrics = step(state, dev_batch, jax.random.key(2))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)

        eval_step = jax.jit(make_eval_step(model))
        out = eval_step(state.params, dev_batch)
        count = int(out["count"])
        assert count == global_batch, count

    print(f"MULTIHOST_OK proc={proc_id} loss={loss:.6f} count={count}",
          flush=True)

    # ---- phase 2 (optional): UNEVEN ImageFolder eval sharding ----------
    # A real on-disk dataset whose sample count is NOT divisible by
    # (hosts x batch): the pipeline pads shards to equal length with
    # label=-1 sentinels and the eval step masks them, so every real
    # sample is counted exactly once across the pod (loop.py:203-205).
    if len(sys.argv) > 3:
        data_dir = sys.argv[3]
        from ofq_tpu.data import DataConfig, make_dataset

        eval_cfg = DataConfig(
            data_dir=data_dir, img_size=16, batch_size=2, num_classes=2,
            seed=7, shard_index=proc_id, shard_count=2)
        totals = None
        with jax.set_mesh(mesh):
            for b in make_dataset(eval_cfg, train=False):
                dev = local_to_global(
                    {"image": b["image"], "label": b["label"]}, mesh, bs)
                # calibration-init params (host-invariant, identical to
                # what a single-process run computes from the same calib
                # batch) so the test process can assert top1/top5/loss
                # equality, not just the count
                out = eval_step(variables, dev)
                totals = out if totals is None else jax.tree.map(
                    jnp.add, totals, out)
        n_eval = int(totals["count"])
        print(f"MULTIHOST_EVAL_OK proc={proc_id} eval_count={n_eval} "
              f"correct1={int(totals['correct1'])} "
              f"correct5={int(totals['correct5'])} "
              f"loss_sum={float(totals['loss_sum']):.6f}",
              flush=True)


if __name__ == "__main__":
    main()
