"""Real multi-process multihost smoke (VERDICT r1 #6).

Launches two jax.distributed processes on localhost (CPU backend, 2
virtual devices each) and runs one sharded train step + eval through
initialize_multihost / host_batch_slice / local_to_global.  Verifies both
processes compute the IDENTICAL global loss — the SPMD contract a pod
relies on.
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_imagefolder(root, *, n_a=6, n_b=5, size=16):
    """Tiny 2-class ImageFolder with 11 samples — NOT divisible by
    (2 hosts x 2 batch): exercises the label=-1 shard-padding path."""
    from PIL import Image

    import numpy as np

    rng = np.random.default_rng(0)
    for cls, n in (("a", n_a), ("b", n_b)):
        d = os.path.join(root, "validation", cls)
        os.makedirs(d)
        for i in range(n):
            arr = rng.integers(0, 255, size=(size, size, 3)).astype("uint8")
            Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))
    return n_a + n_b


def test_failed_init_raises_on_declared_multiprocess(monkeypatch):
    """A failed jax.distributed.initialize on a declared multi-process
    launch must raise — continuing would run N independent trainings
    that all believe they are rank 0 and clobber one checkpoint dir.
    The handler must NOT query jax.process_count() (backend init)."""
    import jax

    from ofq_tpu.parallel import initialize_multihost

    def boom(**kw):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)

    def no_backend(*a, **kw):  # the forbidden call
        raise AssertionError("handler initialized the local backend")

    monkeypatch.setattr(jax, "process_count", no_backend)
    # explicit multi-process args -> hard failure
    with pytest.raises(RuntimeError, match="multi-process launch"):
        initialize_multihost(coordinator_address="localhost:1",
                             num_processes=2, process_id=0)
    # pod environment markers -> hard failure even with inferred args
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    with pytest.raises(RuntimeError, match="multi-process launch"):
        initialize_multihost()
    # single-host TPU VMs set ONE hostname at interpreter startup (this
    # repo's dev box does) — that must stay a silent no-op
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    initialize_multihost()
    # plain single-host dev box -> silent no-op
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    initialize_multihost()


def test_two_process_train_step(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    coordinator = f"localhost:{_free_port()}"
    n_samples = _write_imagefolder(str(tmp_path))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # scrub the session-wide 8-device flag; the worker sets its own
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["PYTHONPATH"] = os.path.dirname(here)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), coordinator, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK proc=\d loss=([0-9.]+) count=8", out)
        assert m, out[-3000:]
        losses.append(float(m.group(1)))
        # uneven-shard eval: 11 samples across 2 hosts pad to 6+6 with one
        # label=-1 sentinel; the global count must be exactly 11 (each
        # real sample once, the pad contributing nothing)
        me = re.search(
            r"MULTIHOST_EVAL_OK proc=\d eval_count=(\d+) correct1=(\d+) "
            r"correct5=(\d+) loss_sum=([0-9.]+)", out)
        assert me, out[-3000:]
        assert int(me.group(1)) == n_samples, out[-2000:]
    # SPMD: every host computes the same global loss
    assert losses[0] == losses[1], losses

    # ---- single-process reference: top1/top5/count/loss must be what a
    # one-host eval of the same data computes (verdict r3 weak #3: an
    # off-by-one in the label=-1 shard padding would bias pod top-1) ----
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ofq_tpu.data import DataConfig, make_dataset
    from ofq_tpu.models import DeiTConfig, VisionTransformer
    from ofq_tpu.quant import default_deit_qmodules, policy_from_args
    from ofq_tpu.train import make_eval_step

    pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                           qmodules=default_deit_qmodules(2))
    cfg = DeiTConfig(img_size=16, patch_size=8, embed_dim=12, depth=2,
                     num_heads=2, num_classes=5)
    model = VisionTransformer(cfg=cfg, policy=pol)
    rng = np.random.default_rng(0)   # the worker's calibration batch
    calib = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    variables = jax.jit(
        lambda k, xx: model.init({"params": k}, xx, train=False)
    )(jax.random.key(0), calib)
    eval_step = jax.jit(make_eval_step(model))
    eval_cfg = DataConfig(data_dir=str(tmp_path), img_size=16, batch_size=4,
                          num_classes=2, seed=7, shard_index=0,
                          shard_count=1)
    totals = None
    for b in make_dataset(eval_cfg, train=False):
        dev = {"image": jnp.asarray(b["image"]),
               "label": jnp.asarray(b["label"])}
        out = eval_step(variables, dev)
        totals = out if totals is None else jax.tree.map(jnp.add, totals,
                                                         out)
    want = (int(totals["count"]), int(totals["correct1"]),
            int(totals["correct5"]))
    assert want[0] == n_samples
    for out in outs:
        me = re.search(
            r"MULTIHOST_EVAL_OK proc=\d eval_count=(\d+) correct1=(\d+) "
            r"correct5=(\d+) loss_sum=([0-9.]+)", out)
        got = (int(me.group(1)), int(me.group(2)), int(me.group(3)))
        assert got == want, (got, want)
        # fp reduction order differs across mesh layouts — tolerance only
        # on the loss sum, never on the integer counts
        assert abs(float(me.group(4)) - float(totals["loss_sum"])) < 1e-3
