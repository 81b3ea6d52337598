"""Mesh data parallelism in the REAL drivers + dataset sharding contracts.

The centerpiece runs the actual ``cli.train.train`` loop in two
subprocesses — one with a single CPU device, one with 8 virtual devices —
on the same corpus and seeds, and asserts the final checkpoints match: the
8-device mesh (sharded batches, XLA gradient psums, snapped batch sizes
with loss-weighted padding rows) must reproduce single-device numerics.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_corpus(tmp_path, n_per_split=6):
    from scipy.io import wavfile

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    words = ["CAT", "DOG", "GO ON", "HI", "SO SO", "NO WAY"][:n_per_split]
    letters = sorted(set("".join(w.replace(" ", "") for w in words)) | {"|"})
    with open(tmp_path / "dict.ltr.txt", "w") as df:
        for ch in letters:
            df.write(f"{ch} 1\n")
    for split in ["train", "valid"]:
        with open(tmp_path / f"{split}.tsv", "w") as tf, \
             open(tmp_path / f"{split}.ltr", "w") as lf:
            tf.write(str(audio_dir) + "\n")
            for i, w in enumerate(words):
                n = 8000 + 2000 * i
                name = f"{split}{i}.wav"
                data = (rng.normal(size=n) * 5000).astype(np.int16)
                wavfile.write(str(audio_dir / name), 16000, data)
                tf.write(f"{name}\t{n}\n")
                spelled = " ".join(list(w.replace(" ", "|"))) + " |"
                lf.write(spelled + "\n")
    return tmp_path


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
    "--train_steps", "4",
    "--grad_accum", "1",
    "--steps_per_checkpoint", "2",
    "--valid_steps", "1",
    "--warmup_steps", "2",
    "--unfreeze_enc_after_step", "1",
    "--dropout", "0.0",
    "--timestep_masking", "0.0",
    "--channel_masking", "0.0",
    # SGD: AdamW's m/(sqrt(v)+eps) amplifies f32 reduction-order noise to
    # full-lr scale on near-zero-gradient leaves, which would swamp the
    # equality this test is about (gradient equivalence across meshes)
    "--optim", "sgd",
    "--lr", "0.05",
] + {extra!r})
"""


def _run_train(basedir, root, n_devices, extra=()):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    code = TRAIN_SNIPPET.format(basedir=str(basedir), root=str(root),
                                extra=list(extra))
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"


@pytest.mark.slow
def test_driver_numerics_match_across_device_counts(tmp_path):
    corpus = make_corpus(tmp_path)
    _run_train(tmp_path / "run1", corpus, 1)
    _run_train(tmp_path / "run8", corpus, 8)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    s1 = ckptr.restore(str(tmp_path / "run1" / "checkpoint-step-4"))
    s8 = ckptr.restore(str(tmp_path / "run8" / "checkpoint-step-4"))
    leaves1, tree1 = __import__("jax").tree_util.tree_flatten(s1["params"])
    leaves8, tree8 = __import__("jax").tree_util.tree_flatten(s8["params"])
    assert tree1 == tree8
    for l1, l8 in zip(leaves1, leaves8):
        np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_driver_tensor_parallel_matches_single_device(tmp_path):
    """`--tensor_parallel 2` through the REAL cli.train loop on a 4x2 mesh
    must reproduce single-device numerics (Megatron split changes the
    reduction layout, not the math)."""
    corpus = make_corpus(tmp_path)
    _run_train(tmp_path / "run1", corpus, 1)
    _run_train(tmp_path / "run8tp", corpus, 8, extra=["--tensor_parallel", "2"])

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    s1 = ckptr.restore(str(tmp_path / "run1" / "checkpoint-step-4"))
    stp = ckptr.restore(str(tmp_path / "run8tp" / "checkpoint-step-4"))
    leaves1, tree1 = __import__("jax").tree_util.tree_flatten(s1["params"])
    leavestp, treetp = __import__("jax").tree_util.tree_flatten(stp["params"])
    assert tree1 == treetp
    for l1, ltp in zip(leaves1, leavestp):
        np.testing.assert_allclose(l1, ltp, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_driver_fsdp_matches_single_device(tmp_path):
    """`--fsdp` (ZeRO-3: params + moments sharded over 'data') through the
    REAL cli.train loop must reproduce single-device numerics — the
    annotation changes where weights live and which collectives XLA
    inserts (all-gather at use, reduce-scatter of grads), not the math."""
    corpus = make_corpus(tmp_path)
    _run_train(tmp_path / "run1", corpus, 1)
    _run_train(tmp_path / "run8f", corpus, 8, extra=["--fsdp", "true"])

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    s1 = ckptr.restore(str(tmp_path / "run1" / "checkpoint-step-4"))
    sf = ckptr.restore(str(tmp_path / "run8f" / "checkpoint-step-4"))
    leaves1, tree1 = __import__("jax").tree_util.tree_flatten(s1["params"])
    leavesf, treef = __import__("jax").tree_util.tree_flatten(sf["params"])
    assert tree1 == treef
    for l1, lf in zip(leaves1, leavesf):
        np.testing.assert_allclose(l1, lf, rtol=1e-4, atol=1e-6)


def test_fsdp_shardings_specs():
    """Every divisible weight leaf carries 'data'; scalars stay replicated;
    under TP the Megatron axis is preserved and 'data' lands on a free
    axis."""
    import jax
    from jax.sharding import PartitionSpec as P
    from audio8_tpu.parallel.sharding import (TP_RULES, fsdp_shardings,
                                              make_mesh)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    state = {
        "params": {
            "encoder_0": {"self_attn": {"w_Q": {
                "kernel": np.zeros((64, 64), np.float32)}}},
            "proj": {"bias": np.zeros((64,), np.float32)},
            "tiny": {"w": np.zeros((3,), np.float32)},
        },
        "step": np.zeros((), np.int32),
    }
    sh = fsdp_shardings(state, mesh, TP_RULES)
    # Megatron axis kept on the out dim, 'data' added on the free in dim
    assert sh["params"]["encoder_0"]["self_attn"]["w_Q"]["kernel"].spec == \
        P("data", "model")
    assert sh["params"]["proj"]["bias"].spec == P("data")
    # 3 not divisible by 4 -> replicated; scalar step replicated
    assert sh["params"]["tiny"]["w"].spec == P(None)
    assert sh["step"].spec == P()


@pytest.mark.slow
def test_driver_pipeline_parallel_matches_single_device(tmp_path):
    """`--pipeline_parallel 4 --pp_microbatches 2` through the REAL
    cli.train loop on a ('pipe' 4 x 'data' 2) mesh must reproduce
    single-device numerics (GPipe staging changes the schedule, not the
    math). Both runs never freeze (the PP step always trains the stack)."""
    corpus = make_corpus(tmp_path)
    # 4 layers so they split over 4 stages; identical model in both runs
    base = ["--unfreeze_enc_after_step", "-1", "--num_layers", "4"]
    _run_train(tmp_path / "run1", corpus, 1, extra=base)
    _run_train(tmp_path / "run8pp", corpus, 8,
               extra=base + ["--pipeline_parallel", "4",
                             "--pp_microbatches", "2"])

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    s1 = ckptr.restore(str(tmp_path / "run1" / "checkpoint-step-4"))
    spp = ckptr.restore(str(tmp_path / "run8pp" / "checkpoint-step-4"))
    leaves1, tree1 = __import__("jax").tree_util.tree_flatten(s1["params"])
    leavespp, treepp = __import__("jax").tree_util.tree_flatten(spp["params"])
    assert tree1 == treepp
    for l1, lpp in zip(leaves1, leavespp):
        np.testing.assert_allclose(l1, lpp, rtol=1e-4, atol=1e-6)


# ------------------------------------------------------- dataset contracts


def _letter_dataset(corpus, **kw):
    from audio8_tpu.data.datasets import AudioTextLetterDataset
    from audio8_tpu.models.text import TextVectorizer, read_vocab_list

    vocab_list = read_vocab_list(str(corpus / "dict.ltr.txt"))
    vec = TextVectorizer({v: i for i, v in enumerate(vocab_list)})
    defaults = dict(shuffle=False, is_infinite=False, pad_to_multiple=4000)
    defaults.update(kw)
    return AudioTextLetterDataset(str(corpus / "train.tsv"), vec, 40_000,
                                  **defaults)


def test_batch_grid_and_padding_rows(tmp_path):
    corpus = make_corpus(tmp_path)
    ds = _letter_dataset(corpus, batch_multiple=4)
    shapes = set()
    for b in iter(ds):
        bsz = b["signal"].shape[0]
        assert bsz % 4 == 0
        shapes.add((bsz, b["signal"].shape[1], b["token_ids"].shape[1]))
        n_real = b["num_real"]
        assert n_real <= bsz
        # padding rows: zero signal, zero lengths, all-PAD tokens, at tail
        assert (b["signal_lengths"][n_real:] == 0).all()
        assert (b["token_lengths"][n_real:] == 0).all()
        assert (b["signal"][n_real:] == 0).all()
        assert (b["signal_lengths"][:n_real] > 0).all()
    assert len(shapes) <= 20


def test_row_shard_blocks_assemble_to_global_batch(tmp_path):
    corpus = make_corpus(tmp_path)
    global_ds = _letter_dataset(corpus, batch_multiple=2)  # global mult = 2
    shard0 = _letter_dataset(corpus, batch_multiple=1, row_shard=True,
                             shard_index=0, num_shards=2)
    shard1 = _letter_dataset(corpus, batch_multiple=1, row_shard=True,
                             shard_index=1, num_shards=2)
    for g, b0, b1 in zip(iter(global_ds), iter(shard0), iter(shard1)):
        assert b0["row_offset"] == 0
        assert b1["row_offset"] == b0["signal"].shape[0]
        assert b0["num_real"] == b1["num_real"] == g["num_real"]
        for key in ["signal", "signal_lengths", "token_ids", "token_lengths"]:
            stitched = np.concatenate([b0[key], b1[key]], axis=0)
            np.testing.assert_array_equal(stitched, g[key])


def _make_manifest(tmp_path, sizes):
    man = tmp_path / "pre.tsv"
    with open(man, "w") as f:
        f.write(str(tmp_path) + "\n")
        for i, sz in enumerate(sizes):
            f.write(f"f{i}.wav\t{sz}\n")
    return str(man)


def test_bucketing_shard_coverage_and_no_overlap(tmp_path):
    from audio8_tpu.data.datasets import BucketingAudioDataset

    rng = np.random.default_rng(1)
    sizes = rng.integers(4000, 20000, size=400).tolist()
    man = _make_manifest(tmp_path, sizes)
    buckets = [4000, 8000, 16000]
    num_shards = 4
    per_shard_buckets = {}
    seen_rows = {}
    for s in range(num_shards):
        ds = BucketingAudioDataset(buckets, man, 20000, 32000,
                                   shard_index=s, num_shards=num_shards,
                                   shuffle=True, seed=0, read_workers=1)
        order = list(range(len(ds.files)))
        ds._rng.shuffle(order)
        comp = list(ds._compose(order))
        mine = [(rows, t) for bi, (rows, t) in enumerate(comp)
                if bi % num_shards == s]
        per_shard_buckets[s] = {t for _, t in mine}
        for rows, _ in mine:
            for r in rows:
                assert r not in seen_rows, f"row {r} duplicated across shards"
                seen_rows[r] = s
    # every shard sees every length class
    for s in range(num_shards):
        assert per_shard_buckets[s] == set(buckets), per_shard_buckets


def test_dense_pretrain_batch_multiple(tmp_path):
    from scipy.io import wavfile
    from audio8_tpu.data.datasets import AudioFileDataset

    rng = np.random.default_rng(2)
    sizes = rng.integers(4000, 12000, size=40).tolist()
    for i, sz in enumerate(sizes):
        wavfile.write(str(tmp_path / f"f{i}.wav"), 16000,
                      (rng.normal(size=sz) * 1000).astype(np.int16))
    man = _make_manifest(tmp_path, sizes)
    ds = AudioFileDataset(man, 12000, 24000, batch_multiple=4, seed=0,
                          read_workers=1)
    it = iter(ds)
    for _ in range(6):
        b = next(it)
        assert b.ndim == 2 and b.shape[0] % 4 == 0
        assert b.dtype == np.float32


def test_clip_loss_ignores_padding_rows(rng):
    import jax
    import jax.numpy as jnp
    from audio8_tpu.models.dual_encoder import SymmetricCLIPLoss

    loss_mod = SymmetricCLIPLoss(init_temperature=0.07, learn_temperature=False)
    a = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
    base, _ = loss_mod.apply({"params": {}}, a, t)
    pad = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    a8 = jnp.concatenate([a, pad], axis=0)
    t8 = jnp.concatenate([t, pad], axis=0)
    mask = jnp.asarray([1.0] * 6 + [0.0] * 2)
    padded, _ = loss_mod.apply({"params": {}}, a8, t8, mask)
    np.testing.assert_allclose(float(base), float(padded), rtol=1e-6)
