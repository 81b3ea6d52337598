"""Optimizer/schedule units, checkpoint round-trip, sharded end-to-end
smoke tests (overfit a tiny CTC model; SURVEY.md §4e)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from audio8_tpu.config import AcousticConfig, PretrainConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel, Wav2Vec2Model
from audio8_tpu.parallel.sharding import (
    DP_ONLY_RULES, TP_RULES, batch_sharding, make_mesh, param_shardings, shard_params,
)
from audio8_tpu.train.checkpoint import (
    find_latest_checkpoint, load_checkpoint, parse_checkpoint_step, save_checkpoint,
)
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.steps import (
    clean_targets, current_temperature, make_ctc_steps, make_pretrain_steps,
)
from audio8_tpu.utils import Offsets

SMALL = dict(d_model=64, num_heads=4, num_layers=2, d_ff=128)


def test_lr_schedule_phases():
    sched = create_lrs(1.0, train_steps=100, sched_type="cosine", alpha=0.1,
                       warmup_steps=10, plateau_steps=5)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 0.5)
    np.testing.assert_allclose(float(sched(10)), 1.0)   # plateau
    np.testing.assert_allclose(float(sched(14)), 1.0)   # plateau
    mid = float(sched(15 + 50))
    assert 0.1 < mid < 1.0
    np.testing.assert_allclose(float(sched(115)), 0.1, atol=1e-6)  # floor alpha


def test_temperature_anneal():
    t0 = float(current_temperature(jnp.asarray(0)))
    t_mid = float(current_temperature(jnp.asarray(100_000)))
    t_end = float(current_temperature(jnp.asarray(10_000_000)))
    assert t0 == 2.0 and t_end == 0.5 and 0.5 < t_mid < 2.0


def test_clean_targets():
    t = jnp.asarray([[5, 6, Offsets.EOS, Offsets.PAD], [7, Offsets.PAD, Offsets.PAD, Offsets.PAD]])
    _, lens = clean_targets(t, jnp.asarray([3, 1]))
    assert np.asarray(lens).tolist() == [2, 1]


def test_train_state_and_clip():
    params = {"w": jnp.ones((4,))}
    sched = create_lrs(0.1, 100, warmup_steps=0)
    tx = create_optimizer(sched)
    state = TrainState.create(params, tx)
    grads = {"w": jnp.full((4,), 100.0)}
    new_state, gnorm = state.apply_gradients(grads, tx, clip_norm=1.0)
    assert float(gnorm) == 200.0
    assert int(new_state.step) == 1
    assert not np.allclose(np.asarray(new_state.params["w"]), 1.0)


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(4, dtype=jnp.float32), "b": {"c": jnp.ones((2, 2))}}
    sched = create_lrs(0.1, 100)
    tx = create_optimizer(sched)
    state = TrainState.create(params, tx, step=42)
    base = str(tmp_path / "checkpoint")
    path = save_checkpoint(state, base, 42)
    assert parse_checkpoint_step(path) == 42
    found, step = find_latest_checkpoint(str(tmp_path))
    assert step == 42
    restored = load_checkpoint(found, state)
    np.testing.assert_allclose(np.asarray(restored.params["a"]), np.arange(4))
    assert int(restored.step) == 42


def _make_ctc_setup(num_labels=8):
    cfg = AcousticConfig(num_labels=num_labels, **SMALL, dropout=0.0,
                         timestep_masking=0.0, channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    sched = create_lrs(3e-4, 200, warmup_steps=5)
    tx = create_optimizer(sched)
    return model, tx


def test_ctc_overfit_smoke():
    """~30 steps on one tiny batch must reduce the loss substantially."""
    model, tx = _make_ctc_setup()
    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32)),
        "signal_lengths": jnp.asarray([4000, 3200]),
        "token_ids": jnp.asarray([[5, 6, 7, Offsets.PAD], [6, 5, Offsets.PAD, Offsets.PAD]], jnp.int32),
        "token_lengths": jnp.asarray([3, 2]),
    }
    params = model.init(jax.random.PRNGKey(0), batch["signal"], batch["signal_lengths"])["params"]
    state = TrainState.create(params, tx)
    grad_fn, update_fn, eval_fn = make_ctc_steps(model, tx, clip=25.0)

    losses = []
    for i in range(30):
        loss, grads, bs, _ = grad_fn(state.params, batch, jax.random.PRNGKey(i),
                                     freeze=False)
        state, _ = update_fn(state, grads, bs)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::5]

    loss, frames, frame_lengths = eval_fn(state.params, batch)
    assert frames.shape[0] == 2


def test_ctc_step_sharded_dp():
    """Same step under a 8-device data-parallel mesh (virtual CPU devices)."""
    assert len(jax.devices()) == 8
    model, tx = _make_ctc_setup()
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(0)
    batch_np = {
        "signal": rng.normal(size=(8, 4000)).astype(np.float32),
        "signal_lengths": np.full((8,), 4000, np.int32),
        "token_ids": np.tile(np.asarray([[5, 6, 7, Offsets.PAD]], np.int32), (8, 1)),
        "token_lengths": np.full((8,), 3, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch_np["signal"]),
                        jnp.asarray(batch_np["signal_lengths"]))["params"]
    params = shard_params(params, mesh, DP_ONLY_RULES)
    state = TrainState.create(params, tx)
    bs = batch_sharding(mesh)
    batch = {k: jax.device_put(v, bs) for k, v in batch_np.items()}
    grad_fn, update_fn, _ = make_ctc_steps(model, tx)
    params_host = jax.device_get(params)  # before donation invalidates them
    loss, grads, bsz, _ = grad_fn(state.params, batch, jax.random.PRNGKey(0), freeze=True)
    state, gnorm = update_fn(state, grads, bsz)
    assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))

    # single-device replica for numerical agreement
    loss1, *_ = make_ctc_steps(model, tx)[0](
        params_host, {k: jnp.asarray(v) for k, v in batch_np.items()},
        jax.random.PRNGKey(0), freeze=True)
    np.testing.assert_allclose(float(loss), float(loss1), rtol=1e-4)


def test_param_shardings_tp_rules():
    model, _ = _make_ctc_setup()
    x = jnp.zeros((1, 4000))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([4000]))["params"]
    mesh = make_mesh(data=4, model=2)
    sh = param_shardings(params, mesh, TP_RULES)
    qk = sh["encoder"]["encoder"]["transformer"]["layer_0"]["self_attn"]["w_Q"]["kernel"]
    assert qk.spec == jax.sharding.PartitionSpec(None, "model")
    conv = sh["encoder"]["feature_extractor"]["conv_0"]["kernel"]
    assert conv.spec == jax.sharding.PartitionSpec(None, None, None) or conv.spec == jax.sharding.PartitionSpec()


@pytest.mark.slow
def test_pretrain_step_smoke():
    cfg = PretrainConfig(**SMALL, final_dim=32, num_vq_vars=16, num_vq_groups=2,
                         dropout=0.0)
    model = Wav2Vec2Model(config=cfg)
    sched = create_lrs(1e-4, 100, warmup_steps=5)
    tx = create_optimizer(sched, weight_decay=0.01)
    rng = np.random.default_rng(0)
    signal = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, signal, train=True)["params"]
    state = TrainState.create(params, tx)
    train_step, eval_step = make_pretrain_steps(model, tx, clip=1.0, n_negatives=10)
    for i in range(3):
        state, metrics = train_step(state, signal, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["temperature"]) <= 2.0
    loss, _ = eval_step(state.params, signal, jax.random.PRNGKey(9), state.step)
    assert np.isfinite(float(loss))
