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
