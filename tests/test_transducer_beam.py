"""RNN-T beam search (Transducer.decode_beam): beam-1 == greedy,
unpruned beam score == exact lattice marginal, n-best ordering."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio8_tpu.config import TransducerConfig
from audio8_tpu.models.transducer import Transducer
from audio8_tpu.utils import Offsets
from tests.test_transducer import np_rnnt_nll


def _cfg(v=10):
    return TransducerConfig(
        vocab_size=v, d_model=32, num_heads=2, num_layers=1, d_ff=64,
        pred_layers=1, pred_dim=32, pred_embed_dim=16, d_joint=32,
        timestep_masking=0.0, channel_masking=0.0, dropout=0.0,
        pred_dropout=0.0, freeze_fx=False)


def _init(cfg, seed=0):
    model = Transducer(config=cfg)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8000)),
                        jnp.asarray([8000], jnp.int32),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return model, params


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam1_equals_greedy(seed):
    """A width-1 beam makes exactly greedy's argmax choice each round,
    so the decoded tokens match token-for-token."""
    cfg = _cfg()
    model, params = _init(cfg, seed)
    wav = np.random.default_rng(seed).normal(size=(2, 16_000)) * 0.1
    sig = jnp.asarray(wav, jnp.float32)
    lens = jnp.asarray([16_000, 12_000], jnp.int32)

    toks_g, n_g = model.apply({"params": params}, sig, lens, 64, 4,
                              method=Transducer.decode)
    toks_b, n_b, score = model.apply({"params": params}, sig, lens, 1, 64,
                                     4, method=Transducer.decode_beam)
    for r in range(2):
        g = np.asarray(toks_g)[r, :int(n_g[r])].tolist()
        bb = np.asarray(toks_b)[r, 0, :int(n_b[r, 0])].tolist()
        assert bb == g
    assert np.all(np.isfinite(np.asarray(score)[:, 0]))


@pytest.mark.slow
def test_unpruned_beam_scores_are_exact_marginals():
    """On a 2-frame input with a beam wide enough to never prune, each
    returned sequence's beam score equals its true lattice marginal
    log P(y | x) (brute-force numpy DP) — the merging machinery sums
    alignments exactly."""
    cfg = _cfg(v=4)  # blank=GO=1 + 3 real labels under default Offsets
    model, params = _init(cfg, 3)
    # 720 samples -> exactly 2 conv frames (stride 320, RF 400)
    wav = np.random.default_rng(0).normal(size=(1, 720)).astype(np.float32)
    sig = jnp.asarray(wav)
    lens = jnp.asarray([720], jnp.int32)

    # max 2 labels/frame, T=2 -> any sequence with len(y) <= 2 has ALL
    # its alignments within the per-frame emission cap
    toks, n, scores = model.apply({"params": params}, sig, lens, 128, 8, 2,
                                  method=Transducer.decode_beam)
    toks, n, scores = (np.asarray(toks), np.asarray(n), np.asarray(scores))

    blank = int(Offsets.GO)
    checked = 0
    seen = set()
    for kk in range(128):
        if scores[0, kk] < -1e20:
            continue
        y = tuple(toks[0, kk, :n[0, kk]].tolist())
        assert y not in seen, f"duplicate sequence {y} in the beam"
        seen.add(y)
        if len(y) > 2:
            continue
        y_arr = (jnp.asarray([list(y) + [0] * (4 - len(y))], jnp.int32)
                 if len(y) else jnp.zeros((1, 4), jnp.int32))
        lp, _ = model.apply({"params": params}, sig, lens, y_arr)
        nll = np_rnnt_nll(np.asarray(lp)[0], 2, list(y) + [0] * 4, len(y),
                          blank)
        np.testing.assert_allclose(scores[0, kk], -nll, rtol=1e-4,
                                   atol=1e-4)
        checked += 1
    assert checked >= 5  # empty seq + several length-1/2 sequences


def test_nbest_sorted_and_scores_bounded_by_marginals():
    """Beams come back score-sorted, and every returned hypothesis's beam
    score sums alignments over a SUBSET of its lattice paths (only those
    surviving per-frame pruning), so it can never exceed the exact
    marginal log P(y | x) (brute-force numpy DP).

    Note: 'a wider beam's 1-best >= the width-1 beam's score' is NOT a
    theorem under per-frame pruning + the max_symbols cap (beam search
    is not monotone in width), and asserting it was order-flaky; the
    subset bound below is guaranteed."""
    cfg = _cfg()
    model, params = _init(cfg, 7)
    wav = np.random.default_rng(4).normal(size=(1, 16_000)) * 0.1
    sig = jnp.asarray(wav, jnp.float32)
    lens = jnp.asarray([16_000], jnp.int32)

    dec = functools.partial(model.apply, {"params": params}, sig, lens,
                            method=Transducer.decode_beam)
    toks, n, s8 = dec(8, 64, 4)
    toks, n = np.asarray(toks), np.asarray(n)
    s8 = np.asarray(s8)[0]
    finite = s8 > -1e20
    assert finite.any()
    assert np.all(np.diff(s8[finite]) <= 1e-6)  # score-sorted
    assert np.all(s8[finite] <= 1e-4)  # log-probabilities

    blank = int(Offsets.GO)
    for kk in range(min(3, int(finite.sum()))):
        y = toks[0, kk, :n[0, kk]].tolist()
        u_pad = max(len(y) + 1, 4)
        y_arr = jnp.asarray([y + [0] * (u_pad - len(y))], jnp.int32)
        lp, _ = model.apply({"params": params}, sig, lens, y_arr)
        t_frames = np.asarray(lp).shape[1]
        nll = np_rnnt_nll(np.asarray(lp)[0], t_frames,
                          y + [0] * u_pad, len(y), blank)
        assert s8[kk] <= -nll + 1e-3, (
            f"beam score {s8[kk]} exceeds exact marginal {-nll} for {y}")


@pytest.mark.slow
def test_transcribe_cli_transducer_beam(tmp_path):
    """a8t-transcribe --transducer --beam 4 decodes through
    Transducer.decode_beam (1-best)."""
    from scipy.io import wavfile

    from audio8_tpu.train.checkpoint import save_checkpoint

    letters = ["A", "B", "C", "|"]
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in letters:
            f.write(f"{ch} 1\n")
    cfg = _cfg(4 + len(letters))
    model = Transducer(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)),
                        jnp.asarray([8000], jnp.int32),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 0)
    rng = np.random.default_rng(2)
    wavfile.write(str(tmp_path / "u.wav"), 16_000,
                  (rng.normal(size=16_000) * 4000).astype(np.int16))

    from audio8_tpu.cli.transcribe import main

    args = [str(tmp_path / "u.wav"),
            "--checkpoint", str(tmp_path / "ckpt-step-0"),
            "--dict_file", str(tmp_path / "dict.ltr.txt"),
            "--transducer", "true", "--max_decode_len", "16",
            "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
            "--d_ff", "64", "--pred_layers", "1", "--pred_dim", "32",
            "--pred_embed_dim", "16", "--d_joint", "32"]
    out = main(args + ["--beam", "4"])
    assert len(out) == 1 and isinstance(out[0][1], str)

    with pytest.raises(SystemExit):  # streaming beam is not a thing
        main(args + ["--beam", "4", "--chunk_seconds", "1.0"])


@pytest.mark.slow
def test_eval_driver_transducer(tmp_path):
    """a8t-test --transducer: manifest eval with WER/CER from the
    transducer search (greedy and beam agree on the metric keys)."""
    from scipy.io import wavfile

    from audio8_tpu.train.checkpoint import save_checkpoint

    rng = np.random.default_rng(0)
    rows, ltr = [], []
    for i in range(3):
        name = f"v{i}.wav"
        wavfile.write(str(tmp_path / name), 16_000,
                      (rng.normal(size=8_000) * 4000).astype(np.int16))
        rows.append(f"{name}\t8000")
        ltr.append("A B |")
    with open(tmp_path / "valid.tsv", "w") as f:
        f.write(str(tmp_path) + "\n" + "\n".join(rows) + "\n")
    with open(tmp_path / "valid.ltr", "w") as f:
        f.write("\n".join(ltr) + "\n")
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in ["A", "B", "C", "|"]:
            f.write(f"{ch} 1\n")

    cfg = _cfg(4 + 4)
    model = Transducer(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)),
                        jnp.asarray([8000], jnp.int32),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 0)

    from audio8_tpu.cli.test import evaluate

    base = ["--root_dir", str(tmp_path), "--valid_dataset", "valid.tsv",
            "--checkpoint", str(tmp_path / "ckpt-step-0"),
            "--transducer", "true", "--max_decode_len", "16",
            "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
            "--d_ff", "64", "--pred_layers", "1", "--pred_dim", "32",
            "--pred_embed_dim", "16", "--d_joint", "32",
            "--target_tokens_per_batch", "32000",
            "--pad_to_multiple", "4000"]
    m = evaluate(base)
    assert {"wer", "cer", "step"} <= set(m)
    assert m["wer"] >= 0 and m["cer"] >= 0

    m_beam = evaluate(base + ["--beam", "4"])
    assert m_beam["wer"] >= 0

    with pytest.raises(ValueError):
        evaluate(base + ["--lm_rescore", "x"])


@pytest.mark.slow
def test_trainer_valid_beam(tmp_path):
    """a8t-train-transducer --valid_beam 2: the driver validates through
    the beam decode path end-to-end."""
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    for split, cnt in (("train", 4), ("valid", 2)):
        rows, ltr = [], []
        for i in range(cnt):
            name = f"{split}{i}.wav"
            wavfile.write(str(tmp_path / name), 16_000,
                          (rng.normal(size=8_000) * 4000).astype(np.int16))
            rows.append(f"{name}\t8000")
            ltr.append("A B |")
        with open(tmp_path / f"{split}.tsv", "w") as f:
            f.write(str(tmp_path) + "\n" + "\n".join(rows) + "\n")
        with open(tmp_path / f"{split}.ltr", "w") as f:
            f.write("\n".join(ltr) + "\n")
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in ["A", "B", "C", "|"]:
            f.write(f"{ch} 1\n")

    from audio8_tpu.cli.train_transducer import train

    state = train([
        "--root_dir", str(tmp_path), "--train_dataset", "train.tsv",
        "--valid_dataset", "valid.tsv", "--d_model", "32",
        "--num_layers", "1", "--num_heads", "2", "--d_ff", "64",
        "--pred_layers", "1", "--pred_dim", "32", "--pred_embed_dim", "16",
        "--d_joint", "32", "--train_steps", "2", "--steps_per_checkpoint",
        "2", "--warmup_steps", "1", "--unfreeze_enc_after_step", "1",
        "--target_tokens_per_batch", "32000", "--pad_to_multiple", "4000",
        "--max_decode_len", "8", "--valid_beam", "2",
        "--basedir", str(tmp_path / "run")])
    assert int(state.step) == 2


@pytest.mark.slow
def test_timed_decode_matches_untimed_and_cli_timestamps(tmp_path):
    """decode(timed=True) returns identical tokens plus a sane
    alignment; the CLI emits word rows from it."""
    from scipy.io import wavfile

    from audio8_tpu.train.checkpoint import save_checkpoint

    cfg = _cfg()
    model, params = _init(cfg, 1)
    wav = np.random.default_rng(5).normal(size=(1, 16_000)) * 0.1
    sig = jnp.asarray(wav, jnp.float32)
    lens = jnp.asarray([16_000], jnp.int32)
    toks, n = model.apply({"params": params}, sig, lens, 64, 4,
                          method=Transducer.decode)
    toks_t, n_t, times, lps = model.apply({"params": params}, sig, lens,
                                          64, 4, True,
                                          method=Transducer.decode)
    k = int(n[0])
    assert int(n_t[0]) == k
    assert np.asarray(toks)[0, :k].tolist() == \
        np.asarray(toks_t)[0, :k].tolist()
    tms = np.asarray(times)[0, :k]
    assert np.all(np.diff(tms) >= 0) and np.all(tms >= 0)  # monotone
    assert np.all(tms < 49)  # within the utterance's frame count
    assert np.all(np.asarray(lps)[0, :k] <= 0)  # log-posteriors

    # CLI: ndjson rows with word timing
    letters = ["A", "B", "C", "|"]
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in letters:
            f.write(f"{ch} 1\n")
    cfg2 = _cfg(4 + len(letters))
    m2 = Transducer(config=cfg2)
    p2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)),
                 jnp.asarray([8000], jnp.int32),
                 jnp.zeros((1, 4), jnp.int32))["params"]
    save_checkpoint({"params": p2}, str(tmp_path / "ckpt"), 0)
    wavfile.write(str(tmp_path / "u.wav"), 16_000,
                  (np.random.default_rng(2).normal(size=16_000)
                   * 4000).astype(np.int16))

    from audio8_tpu.cli.transcribe import main

    out = main([str(tmp_path / "u.wav"),
                "--checkpoint", str(tmp_path / "ckpt-step-0"),
                "--dict_file", str(tmp_path / "dict.ltr.txt"),
                "--transducer", "true", "--timestamps", "true",
                "--max_decode_len", "32",
                "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
                "--d_ff", "64", "--pred_layers", "1", "--pred_dim", "32",
                "--pred_embed_dim", "16", "--d_joint", "32"])
    assert isinstance(out[0], dict) and "words" in out[0]
    for w in out[0]["words"]:
        assert {"word", "start", "end", "confidence"} <= set(w)
        assert 0 <= w["start"] <= w["end"]
