"""Preemption handling: SIGTERM mid-training must checkpoint and exit 0.

TPU pods evict jobs with SIGTERM; the runner installs a handler that
finishes the in-flight step, writes a step-indexed recovery snapshot,
and returns cleanly so auto-resume can pick the run back up.
"""

import os
import signal
import subprocess
import sys
import time

import pytest


def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "out"
    proc = subprocess.Popen(
        [sys.executable, "-m", "ofq_tpu.cli.train", "synthetic",
         "--model", "deit_test_distilled", "--img-size", "32",
         "--num-classes", "4", "--batch-size", "8",
         "--epochs", "1", "--cooldown-epochs", "0",
         "--steps-per-epoch", "100000",  # never finishes epoch 0 naturally
         "--log-interval", "1",
         "--output", str(out), "--experiment", "preempt"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
    # wait until training steps are actually running, then evict
    deadline = time.time() + 240
    seen_step = False
    lines = []
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if "step 3" in line:
            seen_step = True
            proc.send_signal(signal.SIGTERM)
            break
    assert seen_step, "training never reached step 3:\n" + "".join(lines[-20:])
    rest, _ = proc.communicate(timeout=180)
    lines.append(rest)
    text = "".join(lines)
    assert proc.returncode == 0, text[-3000:]
    assert "preempted at epoch" in text, text[-3000:]
    assert (out / "preempt" / "recovery").exists(), text[-2000:]

    # restart: auto-resume must pick up the recovery snapshot (it is ahead
    # of any epoch checkpoint — none was written) AND actually train
    # through to completion from it (small epoch so the run finishes)
    res = subprocess.run(
        [sys.executable, "-m", "ofq_tpu.cli.train", "synthetic",
         "--model", "deit_test_distilled", "--img-size", "32",
         "--num-classes", "4", "--batch-size", "8",
         "--epochs", "1", "--cooldown-epochs", "0",
         "--steps-per-epoch", "6",
         "--output", str(out), "--experiment", "preempt"],
        capture_output=True, text=True, env=env, timeout=240,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    text2 = res.stdout + res.stderr
    assert "resumed from recovery snapshot" in text2, text2[-3000:]
    assert "best top1" in text2, text2[-3000:]  # trained + evaluated


def test_save_recovery_replaces_stale_foreign_snapshot(tmp_path):
    """A same-step-id recovery snapshot written by a PRIOR run (different
    lineage: changed seed/config on a reused output dir) must be replaced
    by the live state, not kept — auto-resume would otherwise silently
    restore a different trajectory.  A re-save of a step THIS process
    already wrote is skipped (no redundant IO)."""
    import numpy as np

    from ofq_tpu.cli.runner import Runner
    from ofq_tpu.train.checkpoint import make_manager, save_epoch

    class Shim:
        out_dir = str(tmp_path)
        _save_recovery = Runner._save_recovery

    stale = {"w": np.full((2,), 1.0, np.float32)}
    live = {"w": np.full((2,), 2.0, np.float32)}

    # a prior run's snapshot at step 7
    prior = make_manager(str(tmp_path / "recovery"), max_to_keep=2)
    save_epoch(prior, 7, stale)
    prior.wait_until_finished()
    prior.close()

    r = Shim()
    assert r._save_recovery(7, live) is True  # replaced, not kept
    r._recovery_mgr.wait_until_finished()
    import orbax.checkpoint as ocp
    got = r._recovery_mgr.restore(
        7, args=ocp.args.StandardRestore({"w": np.zeros((2,), np.float32)}))
    assert float(got["w"][0]) == 2.0, "stale foreign snapshot survived"
    # same step, same process: skip
    assert r._save_recovery(7, live) is False
    r._recovery_mgr.close()
