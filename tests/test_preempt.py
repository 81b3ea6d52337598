"""Preemption-safe training (train/preempt.py + driver wiring)."""
import glob
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
from scipy.io import wavfile

from audio8_tpu.train.preempt import PreemptionGuard


def test_guard_fires_once_on_sigterm():
    g = PreemptionGuard()
    assert not g.should_save(1)
    os.kill(os.getpid(), signal.SIGTERM)
    # the python-level handler runs on the next bytecode boundary
    time.sleep(0.01)
    assert g.should_save(2)
    assert not g.should_save(3)  # fires once; driver is already stopping


def _corpus(root):
    words = ["hello", "world", "audio", "model"]
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        wavfile.write(os.path.join(root, f"c{i}.wav"), 16000,
                      (rng.randn(16000) * 3000).astype(np.int16))
        lines.append(f"c{i}.wav\t16000")
    for split in ("train", "valid"):
        with open(os.path.join(root, f"{split}.tsv"), "w") as f:
            f.write(root + "\n" + "\n".join(lines) + "\n")
        with open(os.path.join(root, f"{split}.ltr"), "w") as f:
            for i in range(8):
                w = " ".join(words[(i + j) % len(words)] for j in range(3))
                f.write(" ".join(list(w.replace(" ", "|"))) + " |\n")
    chars = sorted({c for w in words for c in w} | {"|"})
    with open(os.path.join(root, "dict.ltr.txt"), "w") as f:
        for c in chars:
            f.write(f"{c} 1\n")


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    """Drive the real CTC training CLI, SIGTERM it mid-run, and check it
    saves a step checkpoint and exits 0 (not killed)."""
    _corpus(str(tmp_path))
    out = str(tmp_path / "run")
    # force the CPU backend in the child (env alone is overridden by the
    # session sitecustomize — tests/conftest.py recipe)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    argv = ["--root_dir", str(tmp_path), "--train_dataset", "train.tsv",
            "--valid_dataset", "valid.tsv", "--d_model", "64",
            "--num_layers", "2", "--num_heads", "4", "--d_ff", "128",
            "--train_steps", "500", "--steps_per_checkpoint", "40",
            "--warmup_steps", "1", "--target_tokens_per_batch", "32000",
            "--pad_to_multiple", "4000", "--grad_accum", "1",
            "--basedir", out]
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"from audio8_tpu.cli.train import train; train({argv!r})")
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo")
    # wait for the first throughput report (training loop is live)
    deadline = time.time() + 300
    seen = []
    for line in proc.stdout:
        seen.append(line)
        if "steps/min" in line or time.time() > deadline:
            break
    assert any("steps/min" in l for l in seen), "".join(seen[-20:])
    proc.send_signal(signal.SIGTERM)
    try:
        rest = proc.communicate(timeout=240)[0]
    except subprocess.TimeoutExpired:
        proc.kill()
        pytest.fail("driver did not exit after SIGTERM")
    assert proc.returncode == 0, rest[-2000:]
    assert "preempted: saved step" in rest, rest[-2000:]
    ckpts = glob.glob(os.path.join(out, "checkpoint-step-*"))
    assert ckpts, rest[-2000:]
