"""TRUE multi-host data parallelism: two JAX processes (4 virtual CPU
devices each) run the REAL cli.train loop with --distributed, and the
resulting parameters must equal a single-process 8-device run on the same
corpus — proving the row-shard data contract + global arrays + XLA psums
keep the replicas in lockstep (the round-1 footgun trained diverging
replicas)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.test_mesh_driver import make_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_SNIPPET = """
import jax
jax.config.update("jax_platforms", "cpu")
from audio8_tpu.cli.train import train
train([
    "--basedir", {basedir!r},
    "--root_dir", {root!r},
    "--train_dataset", "train.tsv",
    "--valid_dataset", "valid.tsv",
    "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
    "--d_ff", "64", "--pad_to_multiple", "4000",
    "--target_tokens_per_batch", "40000",
    "--train_steps", "3",
    "--grad_accum", "1",
    "--steps_per_checkpoint", "3",
    "--valid_steps", "1",
    "--warmup_steps", "2",
    "--unfreeze_enc_after_step", "1",
    "--dropout", "0.0",
    "--timestep_masking", "0.0",
    "--channel_masking", "0.0",
    "--optim", "sgd",
    "--lr", "0.05",
    "--distributed", "true",
])
"""


def _env(n_local, extra=None):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS",
                        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    env.update(extra or {})
    return env


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    corpus = make_corpus(tmp_path)

    # single process, 8 devices
    code = TRAIN_SNIPPET.format(basedir=str(tmp_path / "single"), root=str(corpus))
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=_env(8),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    # two processes x 4 devices, real jax.distributed bootstrap
    _run_pair(TRAIN_SNIPPET, tmp_path / "multi", corpus)
    _assert_params_match(tmp_path / "single", tmp_path / "multi")


def _run_pair(snippet, basedir, corpus, timeout=900):
    """Launch the snippet as two 4-device processes with a real
    jax.distributed bootstrap; assert both exit 0. Both children are
    killed if either hangs (a coordinator-bootstrap deadlock must not
    orphan two training processes on the 1-vCPU box and starve every
    later slow-lane test)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    try:
        for pid in range(2):
            code = snippet.format(basedir=str(basedir), root=str(corpus))
            extra = {"JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                     "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(pid)}
            procs.append(subprocess.Popen(
                [sys.executable, "-c", code], cwd=REPO, env=_env(4, extra),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]


def _assert_params_match(dir_a, dir_b, step=3, rtol=1e-4):
    import orbax.checkpoint as ocp
    import jax

    ckptr = ocp.StandardCheckpointer()
    s1 = ckptr.restore(str(dir_a / f"checkpoint-step-{step}"))
    s2 = ckptr.restore(str(dir_b / f"checkpoint-step-{step}"))
    l1, t1 = jax.tree_util.tree_flatten(s1["params"])
    l2, t2 = jax.tree_util.tree_flatten(s2["params"])
    assert t1 == t2
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=1e-6)


@pytest.mark.slow
def test_two_process_fsdp_training_matches_single_process(tmp_path):
    """--fsdp (ZeRO-3: parameters themselves shard over the data axis)
    under REAL multi-host: two processes x 4 devices must produce the
    same parameters as one process x 8 devices running the identical
    FSDP config — the sharded-parameter all-gather/reduce-scatter data
    contract across process boundaries, not just within one process
    (VERDICT r4 #7).

    sgd on purpose (like the DP test above): the comparison must be
    well-conditioned. Early AdamW steps are sign-like (m_hat/sqrt(v_hat)
    ~ sign(g)), so the few-ULP reduce-order differences between the two
    topologies flip update signs at near-zero-gradient elements and
    amplify to O(lr) param differences — measured: a different leaf
    diverging each run at up to rel 5.6 under adamw, vs <1e-4
    everywhere under sgd. AdamW + cross-process sharded moments are
    covered by test_two_process_zero1_adamw_checkpoints below."""
    corpus = make_corpus(tmp_path)
    snippet = TRAIN_SNIPPET.replace(
        '"--distributed", "true",',
        '"--distributed", "true",\n    "--fsdp", "true",')

    code = snippet.format(basedir=str(tmp_path / "single"), root=str(corpus))
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=_env(8),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    _run_pair(snippet, tmp_path / "multi", corpus)
    _assert_params_match(tmp_path / "single", tmp_path / "multi")


@pytest.mark.slow
def test_two_process_tensor_parallel_matches_single_process(tmp_path):
    """--tensor_parallel 2 under REAL multi-host: the (data=4, model=2)
    mesh spans both processes, so Megatron-style column/row shards and
    their psums cross the process boundary; parameters must equal the
    single-process 8-device run of the identical TP config."""
    corpus = make_corpus(tmp_path)
    snippet = TRAIN_SNIPPET.replace(
        '"--distributed", "true",',
        '"--distributed", "true",\n    "--tensor_parallel", "2",')

    code = snippet.format(basedir=str(tmp_path / "single"), root=str(corpus))
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=_env(8),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    _run_pair(snippet, tmp_path / "multi", corpus)
    _assert_params_match(tmp_path / "single", tmp_path / "multi")


@pytest.mark.slow
def test_two_process_zero1_adamw_checkpoints(tmp_path):
    """--zero1 under REAL multi-host: AdamW moments shard across the two
    processes, so the checkpoint save must all-gather non-fully-addressable
    arrays (train/checkpoint.py to_host path) instead of crashing in
    jax.device_get — the exact failure mode of the pre-fix code."""
    corpus = make_corpus(tmp_path)
    snippet = TRAIN_SNIPPET.replace('"--optim", "sgd",',
                                    '"--optim", "adamw",\n    "--zero1", "true",')
    _run_pair(snippet, tmp_path / "z1", corpus)

    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        str(tmp_path / "z1" / "checkpoint-step-3"))
    # the saved tree carries the gathered global moments
    import jax as _jax
    leaves = [l for l in _jax.tree_util.tree_leaves(restored["opt_state"])
              if hasattr(l, "ndim") and l.ndim >= 1]
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
