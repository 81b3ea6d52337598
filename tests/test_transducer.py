"""RNN-T transducer: loss vs a brute-force numpy lattice, predictor
step/sequence parity, overfit + greedy-decode smoke, mesh-DP step, and
the real driver end-to-end."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.io import wavfile

from audio8_tpu.config import TransducerConfig
from audio8_tpu.models.transducer import (Transducer, TransducerPredictor,
                                          create_transducer_model)
from audio8_tpu.ops.transducer import transducer_loss
from audio8_tpu.train.optim import TrainState, create_optimizer
from audio8_tpu.train.steps import make_transducer_steps
from audio8_tpu.utils import Offsets


def np_rnnt_nll(lp, t_len, y, u_len, blank):
    """Brute-force lattice DP (Graves 2012 eq. alpha recursion)."""
    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            acc = []
            if t > 0:
                acc.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                acc.append(alpha[t, u - 1] + lp[t, u - 1, y[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(acc)
    return -(alpha[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])


def _random_lp(rng, b, t, u1, v):
    x = rng.normal(size=(b, t, u1, v)).astype(np.float32)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_loss_matches_numpy_dp(rng):
    b, t, u, v, blank = 5, 7, 5, 6, 0
    lp = _random_lp(rng, b, t, u + 1, v)
    y = rng.integers(1, v, size=(b, u)).astype(np.int32)
    # varied lengths incl. U=0 (empty transcript) and T=1 (one frame)
    t_len = np.asarray([7, 5, 6, 1, 3], np.int32)
    u_len = np.asarray([5, 3, 0, 1, 5], np.int32)
    got = transducer_loss(jnp.asarray(lp), jnp.asarray(t_len),
                          jnp.asarray(y), jnp.asarray(u_len),
                          blank=blank, reduction="none")
    want = np.asarray([np_rnnt_nll(lp[i], t_len[i], y[i], u_len[i], blank)
                       for i in range(b)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    # reductions
    s = transducer_loss(jnp.asarray(lp), jnp.asarray(t_len), jnp.asarray(y),
                        jnp.asarray(u_len), blank=blank, reduction="sum")
    assert float(s) == pytest.approx(want.sum(), rel=1e-5)


def test_loss_gradient_numeric(rng):
    b, t, u, v, blank = 2, 4, 3, 5, 1
    lp = _random_lp(rng, b, t, u + 1, v)
    y = rng.integers(2, v, size=(b, u)).astype(np.int32)
    t_len = np.asarray([4, 3], np.int32)
    u_len = np.asarray([3, 2], np.int32)

    def f(x):
        return transducer_loss(x, jnp.asarray(t_len), jnp.asarray(y),
                               jnp.asarray(u_len), blank=blank,
                               reduction="sum")

    g = jax.grad(f)(jnp.asarray(lp))
    assert bool(np.all(np.isfinite(np.asarray(g))))
    # spot-check live lattice entries by central differences
    eps = 1e-3
    for idx in [(0, 1, 1, blank), (0, 2, 1, int(y[0, 1])),
                (1, 0, 0, blank)]:
        hi, lo = lp.copy(), lp.copy()
        hi[idx] += eps
        lo[idx] -= eps
        num = (float(f(jnp.asarray(hi))) - float(f(jnp.asarray(lo)))) / (2 * eps)
        assert float(g[idx]) == pytest.approx(num, abs=2e-2), idx


def test_fused_loss_matches_autodiff(rng):
    """The analytic alpha/beta occupancy VJP (fused=True) must agree with
    the autodiff-through-scan path on loss values AND gradients, and the
    blank occupancies must sum to 1 per live frame."""
    b, t, u, v, blank = 5, 7, 5, 6, 0
    lp = _random_lp(rng, b, t, u + 1, v)
    y = rng.integers(1, v, size=(b, u)).astype(np.int32)
    t_len = np.asarray([7, 5, 6, 1, 3], np.int32)
    u_len = np.asarray([5, 3, 0, 1, 5], np.int32)
    args = (jnp.asarray(t_len), jnp.asarray(y), jnp.asarray(u_len))

    def f(x, fused):
        # weighted sum exercises non-uniform per-row cotangents
        w = jnp.asarray([1.0, 0.5, 2.0, 1.5, 0.25])
        per = transducer_loss(x, *args, blank=blank, reduction="none",
                              fused=fused)
        return jnp.sum(per * w)

    x = jnp.asarray(lp)
    v0, g0 = jax.value_and_grad(lambda x: f(x, False))(x)
    v1, g1 = jax.value_and_grad(lambda x: f(x, True))(x)
    assert float(v1) == pytest.approx(float(v0), rel=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)
    # each live frame is crossed by exactly one blank transition:
    # d ll / d blank(t, ·) sums to 1 (row 0: full lengths, weight 1)
    g_row0 = -np.asarray(g1)[0, :, :, blank]
    np.testing.assert_allclose(g_row0.sum(-1), np.ones(t), atol=1e-4)


def test_fused_loss_degenerate_rows_zero_grads(rng):
    """zero_infinity parity: a row whose lattice cannot reach its labels
    (U > T impossible? here: frame_lengths=0) gets loss 0 and grad 0,
    with no NaNs anywhere."""
    b, t, u, v = 2, 4, 6, 5
    lp = _random_lp(rng, b, t, u + 1, v)
    y = rng.integers(1, v, size=(b, u)).astype(np.int32)
    t_len = np.asarray([4, 0], np.int32)
    u_len = np.asarray([3, 6], np.int32)

    def f(x):
        return transducer_loss(x, jnp.asarray(t_len), jnp.asarray(y),
                               jnp.asarray(u_len), blank=0,
                               reduction="sum", fused=True)

    val, g = jax.value_and_grad(f)(jnp.asarray(lp))
    g = np.asarray(g)
    assert np.isfinite(float(val))
    assert bool(np.all(np.isfinite(g)))
    assert np.abs(g[1]).max() == 0.0  # dead row contributes nothing


def test_predictor_step_matches_sequence(rng):
    m = TransducerPredictor(vocab_size=11, num_layers=2, d_model=16,
                            embed_dim=8)
    ids = jnp.asarray(rng.integers(0, 11, size=(3, 6)), jnp.int32)
    p = m.init(jax.random.PRNGKey(0), ids)["params"]
    seq = m.apply({"params": p}, ids)
    carry = m.init_carry(3)
    outs = []
    for u in range(ids.shape[1]):
        out, carry = m.apply({"params": p}, carry, ids[:, u],
                             method=TransducerPredictor.step)
        outs.append(out)
    np.testing.assert_allclose(np.asarray(seq),
                               np.asarray(jnp.stack(outs, 1)), atol=1e-5)


def _tiny_cfg(vocab_size):
    return TransducerConfig(
        vocab_size=vocab_size, d_model=32, num_heads=2, num_layers=1,
        d_ff=64, pred_layers=1, pred_dim=32, pred_embed_dim=16, d_joint=32,
        timestep_masking=0.0, channel_masking=0.0, dropout=0.0,
        pred_dropout=0.0, freeze_fx=False)


@pytest.mark.slow
def test_overfit_and_greedy_decode(rng):
    """A tiny transducer must overfit two utterances and greedy-decode
    their exact label sequences back."""
    v = 10
    model = Transducer(config=_tiny_cfg(v))
    batch = {
        "signal": jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32)),
        "signal_lengths": jnp.asarray([4000, 4000], jnp.int32),
        "token_ids": jnp.asarray([[5, 6, 7, Offsets.PAD],
                                  [8, 8, Offsets.PAD, Offsets.PAD]],
                                 jnp.int32),
        "token_lengths": jnp.asarray([3, 2], jnp.int32),
    }
    tx = create_optimizer(3e-3)
    params = model.init(jax.random.PRNGKey(0), batch["signal"],
                        batch["signal_lengths"],
                        batch["token_ids"])["params"]
    state = TrainState.create(params, tx)
    grad_fn, update_fn, decode_fn, eval_loss_fn = make_transducer_steps(
        model, tx, clip=25.0)
    losses = []
    for i in range(320):
        loss, grads, bs, _ = grad_fn(state.params, batch,
                                     jax.random.PRNGKey(i), freeze=False)
        state, _ = update_fn(state, grads, bs)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.05, losses[::50]
    assert float(eval_loss_fn(state.params, batch)) < losses[0]

    toks, lengths = decode_fn(state.params, batch, max_output_len=8,
                              max_symbols=3)
    toks, lengths = np.asarray(toks), np.asarray(lengths)
    assert toks[0, :3].tolist() == [5, 6, 7] and lengths[0] == 3
    assert toks[1, :2].tolist() == [8, 8] and lengths[1] == 2


@pytest.mark.slow
def test_step_sharded_dp(rng):
    """The transducer train step through an 8-device data mesh matches
    the single-device step."""
    from audio8_tpu.parallel.sharding import (DP_ONLY_RULES, batch_sharding,
                                              make_mesh, shard_params)

    assert len(jax.devices()) == 8
    v = 10
    model = Transducer(config=_tiny_cfg(v))
    tx = create_optimizer(1e-3)
    batch_np = {
        "signal": rng.normal(size=(8, 4000)).astype(np.float32),
        "signal_lengths": np.full((8,), 4000, np.int32),
        "token_ids": np.tile(np.asarray([[5, 6, 7, Offsets.PAD]], np.int32),
                             (8, 1)),
        "token_lengths": np.full((8,), 3, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch_np["signal"]),
                        jnp.asarray(batch_np["signal_lengths"]),
                        jnp.asarray(batch_np["token_ids"]))["params"]
    grad_fn, update_fn, _, _ = make_transducer_steps(model, tx)

    loss1, g1, _, _ = grad_fn(params, {k: jnp.asarray(v_)
                                       for k, v_ in batch_np.items()},
                              jax.random.PRNGKey(7), freeze=False)

    mesh = make_mesh(data=8, model=1)
    sp = shard_params(params, mesh, DP_ONLY_RULES)
    bs = batch_sharding(mesh)
    sbatch = {k: jax.device_put(v_, bs) for k, v_ in batch_np.items()}
    loss8, g8, _, _ = grad_fn(sp, sbatch, jax.random.PRNGKey(7),
                              freeze=False)
    assert float(loss8) == pytest.approx(float(loss1), rel=1e-4)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat8 = jax.tree_util.tree_leaves(g8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_transcribe_cli_transducer(tmp_path, rng):
    """a8t-transcribe --transducer: load a transducer checkpoint, decode
    a WAV with the jitted greedy search, print path<TAB>text."""
    from audio8_tpu.train.checkpoint import save_checkpoint

    letters = ["A", "B", "C", "|"]
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in letters:
            f.write(f"{ch} 1\n")
    cfg = _tiny_cfg(4 + len(letters))
    model = Transducer(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)),
                        jnp.asarray([8000], jnp.int32),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 0)
    wav = (rng.normal(size=16000) * 4000).astype(np.int16)
    wavfile.write(str(tmp_path / "u.wav"), 16000, wav)

    from audio8_tpu.cli.transcribe import main

    out = main([str(tmp_path / "u.wav"),
                "--checkpoint", str(tmp_path / "ckpt-step-0"),
                "--dict_file", str(tmp_path / "dict.ltr.txt"),
                "--transducer", "true", "--max_decode_len", "16",
                "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
                "--d_ff", "64", "--pred_layers", "1", "--pred_dim", "32",
                "--pred_embed_dim", "16", "--d_joint", "32"])
    assert len(out) == 1 and out[0][0].endswith("u.wav")
    assert isinstance(out[0][1], str)  # random weights -> any text

    # --timestamps is supported on the whole-utterance greedy decode
    # (ops/align.word_timestamps); still rejected when combined with
    # beam search, which carries no per-token alignment
    with pytest.raises(SystemExit):
        main([str(tmp_path / "u.wav"),
              "--checkpoint", str(tmp_path / "ckpt-step-0"),
              "--dict_file", str(tmp_path / "dict.ltr.txt"),
              "--transducer", "true", "--timestamps", "true",
              "--beam", "4"])


@pytest.mark.slow
def test_driver_e2e(tmp_path):
    """The real a8t-train-transducer loop on a synthetic corpus: runs,
    validates (greedy decode WER), checkpoints."""
    rng = np.random.default_rng(0)
    words = ["AB", "BA", "ABC"]
    for split, n in (("train", 6), ("valid", 2)):
        rows, ltr = [], []
        for i in range(n):
            wav = (rng.normal(size=8000) * 4000).astype(np.int16)
            name = f"{split}{i}.wav"
            wavfile.write(str(tmp_path / name), 16000, wav)
            rows.append(f"{name}\t8000")
            w = words[i % len(words)]
            ltr.append(" ".join(list(w)) + " |")
        with open(tmp_path / f"{split}.tsv", "w") as f:
            f.write(str(tmp_path) + "\n" + "\n".join(rows) + "\n")
        with open(tmp_path / f"{split}.ltr", "w") as f:
            f.write("\n".join(ltr) + "\n")
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in ["A", "B", "C", "|"]:
            f.write(f"{ch} 1\n")

    from audio8_tpu.cli.train_transducer import train

    out = str(tmp_path / "run")
    state = train([
        "--root_dir", str(tmp_path), "--train_dataset", "train.tsv",
        "--valid_dataset", "valid.tsv", "--d_model", "32",
        "--num_layers", "1", "--num_heads", "2", "--d_ff", "64",
        "--pred_layers", "1", "--pred_dim", "32", "--pred_embed_dim", "16",
        "--d_joint", "32", "--train_steps", "6", "--steps_per_checkpoint", "3",
        "--warmup_steps", "1", "--grad_accum", "1",
        "--unfreeze_enc_after_step", "2",
        "--target_tokens_per_batch", "32000", "--pad_to_multiple", "4000",
        "--max_decode_len", "8", "--basedir", out])
    assert int(state.step) == 6
    assert any(p.startswith("checkpoint-step-") for p in os.listdir(out))
