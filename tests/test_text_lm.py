"""Causal text LM (models/text.CausalTextLM), a8t-train-lm, rescoring."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio8_tpu.cli.train_lm import pack_token_stream, train
from audio8_tpu.config import TextLMConfig
from audio8_tpu.models.text import CausalTextLM, TextVectorizer
from audio8_tpu.utils import Offsets

TINY = dict(d_model=32, num_heads=2, num_layers=2, d_ff=64, dropout=0.0,
            rpr_k=4)


def _write_corpus(path, lines):
    with open(path, "w") as f:
        for l in lines:
            f.write(l + "\n")


def test_pack_token_stream_covers_every_token(tmp_path):
    vec = TextVectorizer({"A": 4, "B": 5, "|": 6})
    p = tmp_path / "t.ltr"
    _write_corpus(p, ["A B | A", "B B"])
    blocks = pack_token_stream([str(p)], vec, block_len=4, shuffle=False)
    flat = blocks.reshape(-1)
    assert blocks.shape[1] == 5
    assert blocks[0, 0] == Offsets.GO
    # every line closed by EOS; 6 tokens + 2 EOS + GO = 9 ids -> 2 blocks
    assert (flat == Offsets.EOS).sum() == 2
    # non-PAD targets across blocks == len(stream) - 1 (each token once)
    tgts = blocks[:, 1:]
    assert (tgts != Offsets.PAD).sum() == 8
    # block b starts where block b-1's last id was (overlap by one)
    assert blocks[1, 0] == blocks[0, -1]


def test_causal_lm_is_causal():
    cfg = TextLMConfig(vocab_size=12, **TINY)
    m = CausalTextLM(config=cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 12, (1, 9)))
    params = m.init(jax.random.PRNGKey(0), ids)["params"]
    lp = m.apply({"params": params}, ids)
    ids2 = ids.at[0, 6].set((ids[0, 6] + 1) % 12)
    lp2 = m.apply({"params": params}, ids2)
    np.testing.assert_allclose(np.asarray(lp[0, :6]), np.asarray(lp2[0, :6]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(lp[0, 6:]), np.asarray(lp2[0, 6:]))


def test_sequence_logp_matches_manual():
    cfg = TextLMConfig(vocab_size=12, **TINY)
    m = CausalTextLM(config=cfg)
    rng = np.random.RandomState(1)
    ids = np.full((2, 8), Offsets.PAD, np.int32)
    ids[0, :6] = [Offsets.GO, 4, 5, 6, 7, Offsets.EOS]
    ids[1, :4] = [Offsets.GO, 8, 9, Offsets.EOS]
    lens = np.asarray([6, 4], np.int32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    got = np.asarray(m.apply({"params": params}, jnp.asarray(ids),
                             jnp.asarray(lens), method=m.sequence_logp))
    lp = np.asarray(m.apply({"params": params}, jnp.asarray(ids)))
    for b, L in enumerate(lens):
        want = sum(lp[b, t, ids[b, t + 1]] for t in range(L - 1))
        assert got[b] == pytest.approx(want, rel=1e-5)


@pytest.mark.slow
def test_train_lm_learns_and_rescorer_uses_it(tmp_path):
    """Drive the real a8t-train-lm on a 2-phrase corpus, then check the
    rescorer prefers in-domain strings and rescore_nbest combines
    acoustic + LM scores."""
    lines = ["H E L L O |", "W O R L D |"] * 40
    _write_corpus(tmp_path / "t.ltr", lines)
    _write_corpus(tmp_path / "v.ltr", lines[:4])
    letters = sorted({c for l in lines for c in l.split()})
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for c in letters:
            f.write(f"{c} 1\n")
    out = str(tmp_path / "lm")
    train(["--text", str(tmp_path / "t.ltr"),
           "--valid_text", str(tmp_path / "v.ltr"),
           "--dict_file", str(tmp_path / "dict.ltr.txt"),
           "--basedir", out, "--d_model", "32", "--num_heads", "2",
           "--num_layers", "2", "--d_ff", "64", "--rpr_k", "4",
           "--block_len", "32", "--batch_size", "8", "--lr", "1e-2",
           "--warmup_steps", "5", "--train_steps", "120",
           "--steps_per_checkpoint", "120"])
    assert os.path.exists(os.path.join(out, "lm_config.json"))

    from audio8_tpu.models.text import read_vocab_list
    from audio8_tpu.ops.rescore import NeuralLMRescorer, rescore_nbest

    vocab_list = read_vocab_list(str(tmp_path / "dict.ltr.txt"))
    v = {c: i for i, c in enumerate(vocab_list)}
    resc = NeuralLMRescorer(out, alpha=1.0)
    hello = [v[c] for c in "HELLO"] + [v["|"]]
    junk = [v[c] for c in "DOLEH"] + [v["|"]]
    lp = resc.lm_logp([hello, junk])
    assert lp[0] > lp[1], lp  # in-domain phrase scores higher

    # rescore_nbest: equal acoustic evidence for both -> LM decides
    T, V = 24, len(vocab_list)
    frame_lp = np.full((T, V), -8.0, np.float32)
    frame_lp[:, Offsets.GO] = -0.05  # blank-heavy frames: both fit
    best = rescore_nbest(frame_lp, T, [junk, hello], resc)
    assert best == 1  # the LM prefers HELLO

    # alpha=0 falls back to pure acoustic: make junk acoustically easy
    resc.alpha = 0.0
    easy = np.full((T, V), -8.0, np.float32)
    for t, tok in enumerate(junk):
        easy[2 * t, tok] = -0.01
        easy[2 * t + 1, Offsets.GO] = -0.01
    best = rescore_nbest(easy, T, [junk, hello], resc)
    assert best == 0


@pytest.mark.slow
def test_eval_cli_lm_rescore_e2e(tmp_path):
    """Full chain through the real CLIs: CTC train -> LM train ->
    a8t-test --beam 4 --lm_rescore reports the rescored WER key."""
    from scipy.io import wavfile

    from audio8_tpu.cli.test import evaluate
    from audio8_tpu.cli.train import train as train_ctc

    words = ["hello", "world", "audio", "beam"]
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        wavfile.write(os.path.join(tmp_path, f"c{i}.wav"), 16000,
                      (rng.randn(16000) * 3000).astype(np.int16))
        lines.append(f"c{i}.wav\t16000")
    for split in ("train", "valid"):
        with open(tmp_path / f"{split}.tsv", "w") as f:
            f.write(str(tmp_path) + "\n" + "\n".join(lines) + "\n")
        with open(tmp_path / f"{split}.ltr", "w") as f:
            for i in range(8):
                w = " ".join(words[(i + j) % len(words)] for j in range(3))
                f.write(" ".join(list(w.replace(" ", "|"))) + " |\n")
    chars = sorted({c for w in words for c in w} | {"|"})
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for c in chars:
            f.write(f"{c} 1\n")

    out = str(tmp_path / "am")
    train_ctc(["--root_dir", str(tmp_path), "--train_dataset", "train.tsv",
               "--valid_dataset", "valid.tsv", "--d_model", "64",
               "--num_layers", "2", "--num_heads", "4", "--d_ff", "128",
               "--train_steps", "4", "--steps_per_checkpoint", "4",
               "--warmup_steps", "1", "--target_tokens_per_batch", "32000",
               "--grad_accum", "1",  # e2e convention: the accum path is
               # numerics-tested in test_grad_accum.py; XLA-CPU collectives
               # under 8 virtual devices abort flakily with it in-process
               "--pad_to_multiple", "4000", "--basedir", out])
    lm_out = str(tmp_path / "lm")
    train(["--text", str(tmp_path / "train.ltr"),
           "--dict_file", str(tmp_path / "dict.ltr.txt"),
           "--basedir", lm_out, "--d_model", "32", "--num_heads", "2",
           "--num_layers", "2", "--d_ff", "64", "--rpr_k", "4",
           "--block_len", "32", "--batch_size", "8", "--lr", "1e-2",
           "--warmup_steps", "5", "--train_steps", "60",
           "--steps_per_checkpoint", "60"])
    metrics = evaluate(["--root_dir", str(tmp_path),
                        "--valid_dataset", "valid.tsv", "--basedir", out,
                        "--d_model", "64", "--num_layers", "2",
                        "--num_heads", "4", "--d_ff", "128",
                        "--target_tokens_per_batch", "32000",
                        "--pad_to_multiple", "4000", "--beam", "4",
                        "--lm_rescore", lm_out, "--rescore_alpha", "0.5"])
    assert "werr_rescore_4" in metrics, metrics
    assert np.isfinite(metrics["werr_rescore_4"])


def test_rescore_transducer_nbest_combination():
    """rescore_transducer_nbest: the beam's exact marginals combine with
    LM and length scores without any acoustic recompute."""
    from audio8_tpu.ops.rescore import rescore_transducer_nbest

    class Stub:
        alpha = 1.0
        word_bonus = 0.0

        def lm_logp(self, hyps):
            # prefers the second hypothesis
            return np.asarray([-10.0, -1.0][: len(hyps)], np.float32)

    hyps = [[4, 5], [6, 7]]
    # acoustic tie -> LM decides
    assert rescore_transducer_nbest([-2.0, -2.0], hyps, Stub()) == 1
    # acoustic dominance the other way
    assert rescore_transducer_nbest([-1.0, -30.0], hyps, Stub()) == 0
    # alpha=0 -> pure acoustic
    s = Stub(); s.alpha = 0.0
    assert rescore_transducer_nbest([-5.0, -4.0], hyps, s) == 1
    # word_bonus prefers longer hyps on an otherwise tied score
    s2 = Stub(); s2.alpha = 0.0; s2.word_bonus = 1.0
    assert rescore_transducer_nbest([-2.0, -2.0], [[4], [5, 6, 7]], s2) == 1
    # empty hypotheses never win unless everything is empty
    assert rescore_transducer_nbest([0.0, -9.0], [[], [4]], Stub()) == 1
    assert rescore_transducer_nbest([0.0], [[]], Stub()) == 0
