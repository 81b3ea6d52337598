"""End-to-end CLI smoke: tiny corpus -> a few CTC train steps ->
checkpoint -> offline eval (the minimum end-to-end slice of SURVEY.md §7)."""
import os

import numpy as np
import pytest

from audio8_tpu.utils import Offsets


@pytest.fixture
def corpus(tmp_path):
    from scipy.io import wavfile

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    words = ["CAT", "DOG", "GO ON", "HI", "SO SO", "NO WAY"]
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


SMALL_ARGS = [
    "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
    "--d_ff", "64", "--pad_to_multiple", "4000",
]


def test_ctc_train_and_eval_cli(corpus, tmp_path):
    from audio8_tpu.cli.train import train
    from audio8_tpu.cli.test import evaluate

    basedir = str(tmp_path / "run")
    state = train(SMALL_ARGS + [
        "--basedir", basedir,
        "--root_dir", str(corpus),
        "--train_dataset", "train.tsv",
        "--valid_dataset", "valid.tsv",
        "--target_tokens_per_batch", "40000",
        "--train_steps", "4",
        "--grad_accum", "1",
        "--steps_per_checkpoint", "2",
        "--valid_steps", "2",
        "--warmup_steps", "2",
        "--unfreeze_enc_after_step", "2",
        "--timestep_masking", "0.1",
        "--channel_masking", "0.0",
    ])
    assert int(state.step) == 4
    cks = [d for d in os.listdir(basedir) if d.startswith("checkpoint-step")]
    assert cks, os.listdir(basedir)

    metrics = evaluate(SMALL_ARGS + [
        "--basedir", basedir,
        "--root_dir", str(corpus),
        "--valid_dataset", "valid.tsv",
        "--target_tokens_per_batch", "40000",
        "--valid_steps", "5",
    ])
    assert "wer" in metrics and metrics["wer"] >= 0


@pytest.mark.slow
def test_seq2seq_train_cli(corpus, tmp_path):
    from audio8_tpu.cli.train_seq2seq import train

    state = train(SMALL_ARGS + [
        "--basedir", str(tmp_path / "s2s"),
        "--root_dir", str(corpus),
        "--train_dataset", "train.tsv",
        "--valid_dataset", "valid.tsv",
        "--target_tokens_per_batch", "40000",
        "--train_steps", "2",
        "--grad_accum", "1",
        "--steps_per_checkpoint", "2",
        "--valid_steps", "1",
        "--warmup_steps", "2",
        "--decoder_layers", "1",
        "--decoder_heads", "2",
        "--timestep_masking", "0.0",
        "--channel_masking", "0.0",
    ])
    assert int(state.step) == 2


def test_pretrain_cli(corpus, tmp_path):
    from audio8_tpu.cli.pretrain import train

    state = train([
        "--basedir", str(tmp_path / "pre"),
        "--manifest_dir", str(corpus),
        "--train_manifest_file", "train.tsv",
        "--valid_manifest_file", "valid.tsv",
        "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
        "--d_ff", "64",
        "--num_vq_vars", "8", "--num_vq_groups", "2",
        "--tokens_per_batch", "16000",
        "--max_sample_len", "12000",
        "--train_steps", "2",
        "--steps_per_checkpoint", "2",
        "--valid_steps", "1",
        "--warmup_steps", "2",
        "--n_negatives", "10",
        "--buckets", "4000", "8000", "12000",
    ])
    assert int(state.step) == 2


@pytest.mark.slow
def test_pretrain_then_finetune_cli(corpus, tmp_path):
    """The reference's primary usage story — pretrain.py then train.py
    --restart_from (/root/reference/audio8/train.py:215-252) — end to
    end through the real CLIs on a synthetic corpus: SSL-pretrain a tiny
    encoder, warm-start a CTC fine-tune from that checkpoint with the
    encoder frozen, then eval. The frozen encoder's feature-extractor
    weights in the FINE-TUNED checkpoint must equal the PRETRAIN
    checkpoint's exactly: --restart_from really transferred the
    pretrained weights (with sgd + zero grads under freeze, any
    difference could only come from a broken warm start)."""
    from audio8_tpu.cli.pretrain import train as pretrain
    from audio8_tpu.cli.test import evaluate
    from audio8_tpu.cli.train import train as finetune

    pre_dir = str(tmp_path / "pre")
    state = pretrain([
        "--basedir", pre_dir,
        "--manifest_dir", str(corpus),
        "--train_manifest_file", "train.tsv",
        "--valid_manifest_file", "valid.tsv",
        "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
        "--d_ff", "64",
        "--num_vq_vars", "8", "--num_vq_groups", "2",
        "--tokens_per_batch", "16000",
        "--max_sample_len", "12000",
        "--train_steps", "2",
        "--steps_per_checkpoint", "2",
        "--valid_steps", "1",
        "--warmup_steps", "2",
        "--n_negatives", "10",
        "--buckets", "4000", "8000", "12000",
    ])
    assert int(state.step) == 2

    ft_dir = str(tmp_path / "ft")
    state = finetune(SMALL_ARGS + [
        "--basedir", ft_dir,
        "--root_dir", str(corpus),
        "--train_dataset", "train.tsv",
        "--valid_dataset", "valid.tsv",
        "--target_tokens_per_batch", "40000",
        "--train_steps", "2",
        "--grad_accum", "1",
        "--steps_per_checkpoint", "2",
        "--valid_steps", "1",
        "--warmup_steps", "1",
        "--restart_from", pre_dir,
        "--restart_tt", "ignore",
        "--unfreeze_enc_after_step", "100",  # frozen for all 2 steps
        "--optim", "sgd",
        "--dropout", "0.0",
        "--timestep_masking", "0.0",
        "--channel_masking", "0.0",
    ])
    assert int(state.step) == 2

    import jax
    import orbax.checkpoint as ocp

    from audio8_tpu.train.checkpoint import find_latest_checkpoint

    ck = ocp.StandardCheckpointer()
    pre = ck.restore(find_latest_checkpoint(pre_dir)[0])
    ft = ck.restore(find_latest_checkpoint(ft_dir)[0])
    la, ta = jax.tree_util.tree_flatten(pre["params"]["feature_extractor"])
    lb, tb = jax.tree_util.tree_flatten(
        ft["params"]["encoder"]["feature_extractor"])
    assert ta == tb
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    metrics = evaluate(SMALL_ARGS + [
        "--basedir", ft_dir,
        "--root_dir", str(corpus),
        "--valid_dataset", "valid.tsv",
        "--target_tokens_per_batch", "40000",
        "--valid_steps", "3",
    ])
    assert "wer" in metrics and metrics["wer"] >= 0


@pytest.mark.slow
def test_paired_cli(corpus, tmp_path):
    from audio8_tpu.cli.pretrain_paired import train

    # build .wrd transcripts for paired training
    for split in ["train", "valid"]:
        with open(corpus / f"{split}.ltr") as rf, open(corpus / f"{split}.wrd", "w") as wf:
            for line in rf:
                word = line.replace(" ", "").replace("|", " ").strip()
                wf.write(word + "\n")
    with open(corpus / "dict.wrd.txt", "w") as df:
        words = {w for s in ["train", "valid"]
                 for line in open(corpus / f"{s}.wrd") for w in line.split()}
        for w in sorted(words):
            df.write(f"{w} 1\n")

    state = train(SMALL_ARGS + [
        "--basedir", str(tmp_path / "paired"),
        "--root_dir", str(corpus),
        "--train_dataset", "train.tsv",
        "--valid_dataset", "valid.tsv",
        "--target_type", "wrd",
        "--target_tokens_per_batch", "40000",
        "--train_steps", "2",
        "--grad_accum", "1",
        "--steps_per_checkpoint", "2",
        "--valid_steps", "1",
        "--warmup_steps", "2",
        "--text_d_model", "32", "--text_num_heads", "2",
        "--text_num_layers", "1", "--text_d_ff", "64",
        "--output_dim", "16",
    ])
    assert int(state.step) == 2
