"""Mesh-DP serving: cli/serve.main on a multi-device host shards request
batches over the ('data',) mesh (params replicated by load_acoustic)."""
import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.io import wavfile

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.train.checkpoint import save_checkpoint


def test_load_acoustic_replicates_params_on_mesh(tmp_path):
    from audio8_tpu.cli.transcribe import load_acoustic, parse_args

    letters = list("ABC") + ["|"]
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in letters:
            f.write(f"{ch} 1\n")
    cfg = AcousticConfig(num_labels=4 + len(letters), d_model=32,
                         num_heads=2, num_layers=1, d_ff=64)
    model = Wav2Vec2AcousticModel(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8000)))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 0)

    args = parse_args(["x.wav", "--checkpoint", str(tmp_path / "ckpt-step-0"),
                       "--dict_file", str(tmp_path / "dict.ltr.txt"),
                       "--d_model", "32", "--num_heads", "2",
                       "--num_layers", "1", "--d_ff", "64"])
    _, forward, _, _, _ = load_acoustic(args)
    assert forward.mesh is not None  # conftest forces 8 CPU devices
    # forward accepts a device-count-multiple batch and returns all rows
    sig = np.random.default_rng(0).normal(size=(8, 8000)).astype(np.float32)
    lp, frames = forward(jnp.asarray(sig),
                         jnp.asarray([8000] * 8, jnp.int32))
    assert lp.shape[0] == 8 and int(frames[0]) > 0


@pytest.mark.slow
def test_serve_main_mesh_e2e(tmp_path):
    """Boot the real a8t-serve process under the 8-virtual-device CPU
    backend, drive /healthz + /transcribe over HTTP, shut down clean."""
    letters = list("ABC") + ["|"]
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in letters:
            f.write(f"{ch} 1\n")
    cfg = AcousticConfig(num_labels=4 + len(letters), d_model=32,
                         num_heads=2, num_layers=1, d_ff=64)
    model = Wav2Vec2AcousticModel(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8000)))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 0)
    wav = (np.random.default_rng(0).normal(size=24_000) * 4000)
    wavfile.write(str(tmp_path / "u.wav"), 16000, wav.astype(np.int16))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    # env alone is not enough: the session sitecustomize re-forces the
    # axon TPU platform per process, so the child must also call
    # jax.config.update (the tests/conftest.py recipe)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    argv = ["--checkpoint", str(tmp_path / "ckpt-step-0"),
            "--dict_file", str(tmp_path / "dict.ltr.txt"),
            "--host", "127.0.0.1", "--port", str(port),
            "--chunk_seconds", "1.0", "--context_seconds", "0.2",
            "--batch", "3",  # deliberately not a multiple of 8 -> snaps to 8
            "--timestamps", "true",
            "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
            "--d_ff", "64"]
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"from audio8_tpu.cli.serve import main; main({argv!r})")
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo")
    try:
        deadline = time.time() + 240
        body = None
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    body = json.loads(r.read())
                break
            except Exception:
                if proc.poll() is not None:
                    pytest.fail(proc.stdout.read()[-3000:])
                time.sleep(1.0)
        assert body and body["ok"], body

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe",
            data=open(tmp_path / "u.wav", "rb").read())
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert "text" in out and "words" in out
        assert out["audio_seconds"] == pytest.approx(1.5, abs=0.01)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            log = proc.communicate(timeout=30)[0]
        except subprocess.TimeoutExpired:
            proc.kill()
            log = proc.communicate()[0]
    # the snap log proves the mesh path engaged
    assert "snapped --batch to 8" in log, log[-3000:]
