"""data2vec-audio masked-regression pretraining: targets, EMA, train
step, and the end-to-end driver."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio8_tpu.config import Data2VecPretrainConfig
from audio8_tpu.models.data2vec import (Data2VecAudioModel, data2vec_loss,
                                        data2vec_targets, ema_decay_schedule,
                                        ema_update)


def test_targets_match_numpy_instance_norm():
    rng = np.random.default_rng(0)
    hiddens = [jnp.asarray(rng.normal(size=(2, 7, 5)).astype(np.float32))
               for _ in range(4)]
    got = np.asarray(data2vec_targets(hiddens, 3))
    want = np.zeros((2, 7, 5))
    for h in hiddens[-3:]:
        h = np.asarray(h, np.float64)
        mu = h.mean(axis=1, keepdims=True)
        var = h.var(axis=1, keepdims=True)
        want += (h - mu) / np.sqrt(var + 1e-5)
    want /= 3
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ema_schedule_and_update():
    sched = lambda s: float(ema_decay_schedule(jnp.asarray(s), 0.9, 0.99, 100))
    assert sched(0) == pytest.approx(0.9)
    assert sched(50) == pytest.approx(0.945)
    assert sched(100) == pytest.approx(0.99)
    assert sched(500) == pytest.approx(0.99)

    t = {"w": jnp.ones((3,))}
    s = {"w": jnp.zeros((3,))}
    out = ema_update(t, s, 0.75)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.75)


def test_train_step_learns_and_moves_teacher():
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_data2vec_steps

    cfg = Data2VecPretrainConfig(d_model=32, num_heads=2, num_layers=2,
                                 d_ff=64, dropout=0.0,
                                 average_top_k_layers=2,
                                 ema_decay=0.9, ema_end_decay=0.99,
                                 ema_anneal_steps=10, freeze_fx=False)
    model = Data2VecAudioModel(config=cfg)
    rng = np.random.default_rng(1)
    signal = jnp.asarray(rng.normal(size=(2, 8000)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "mask": jax.random.PRNGKey(1)}, signal)["params"]
    tx = create_optimizer(create_lrs(1e-3, 100, warmup_steps=1))
    state = TrainState.create(params, tx)
    teacher = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    # the step donates state+teacher; snapshot the init weight first
    w0 = np.asarray(params["proj_to_input"]["kernel"]).copy()
    train_step, eval_fn = make_data2vec_steps(model, tx, clip=1.0)

    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(6):
        state, teacher, m = train_step(
            state, teacher, {"signal": signal, "signal_lengths": None},
            jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
        assert float(m["target_std"]) > 0
    # same fixed batch: the student should fit the (slow-moving) targets
    assert losses[-1] < losses[0]
    # teacher is an EMA: it moved, but less than the student
    tw = np.asarray(teacher["proj_to_input"]["kernel"])
    sw = np.asarray(state.params["proj_to_input"]["kernel"])
    assert np.abs(tw - w0).max() > 0          # teacher moved
    assert np.abs(tw - sw).max() > 0          # ...but lags the student
    assert np.abs(tw - w0).max() < np.abs(sw - w0).max()

    loss, _ = eval_fn(state.params, teacher,
                      {"signal": signal, "signal_lengths": None}, key)
    assert np.isfinite(float(loss))


@pytest.fixture
def audio_corpus(tmp_path):
    from scipy.io import wavfile

    audio = tmp_path / "audio"
    audio.mkdir()
    rng = np.random.default_rng(5)
    for split, n_utts in (("train", 6), ("valid", 2)):
        with open(tmp_path / f"{split}.tsv", "w") as tf:
            tf.write(str(audio) + "\n")
            for i in range(n_utts):
                n = 8000 + 2000 * i
                wavfile.write(str(audio / f"{split}{i}.wav"), 16000,
                              (rng.normal(size=n) * 5000).astype(np.int16))
                tf.write(f"{split}{i}.wav\t{n}\n")
    return tmp_path


@pytest.mark.slow
def test_pretrain_data2vec_cli(audio_corpus, tmp_path):
    from audio8_tpu.cli.pretrain_data2vec import train

    out = tmp_path / "out"
    state, teacher = train([
        "--manifest_dir", str(audio_corpus), "--basedir", str(out),
        "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
        "--d_ff", "64", "--average_top_k_layers", "1",
        "--train_steps", "3", "--steps_per_checkpoint", "3",
        "--warmup_steps", "1", "--valid_steps", "1",
        "--tokens_per_batch", "24000", "--max_sample_len", "12000"])
    assert int(state.step) == 3
    names = os.listdir(out)
    assert any(n.startswith("checkpoint-step-") for n in names)
    assert any(n.startswith("teacher-step-") for n in names)
