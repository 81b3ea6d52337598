"""Sequence parallelism (Megatron-SP layout): constraining the residual
stream between transformer layers to P('data','model') must reproduce
replicated/single-device numerics exactly — XLA inserts the gather/scatter
collectives around the head-sharded matmuls. No reference equivalent
(pure DDP, /root/reference/audio8/train.py:266-268; SURVEY.md §2.6)."""
import dataclasses
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.parallel.sharding import (
    TP_RULES, batch_sharding, make_mesh, put_batch, shard_params, shard_state,
)


def _cfg(**kw):
    return AcousticConfig(num_labels=12, d_model=64, num_heads=4, num_layers=2,
                          d_ff=128, dropout=0.0, timestep_masking=0.0,
                          channel_masking=0.0, **kw)


def test_sp_forward_and_grads_match_replicated():
    assert len(jax.devices()) == 8
    ref_model = Wav2Vec2AcousticModel(config=_cfg())
    sp_model = Wav2Vec2AcousticModel(config=_cfg(sequence_parallel=True))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 4000)).astype(np.float32)
    lens = np.full((8,), 4000, np.int32)
    params = ref_model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(lens))["params"]

    ref, _ = ref_model.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(lens))
    ref = np.asarray(ref)

    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh, TP_RULES)
    bs = batch_sharding(mesh)
    xs = jax.device_put(x, bs)
    ls = jax.device_put(lens, bs)

    @jax.jit
    def fwd(p, x, l):
        lp, _ = sp_model.apply({"params": p}, x, l)
        return lp

    with mesh:
        got = np.asarray(fwd(sharded, xs, ls))
    np.testing.assert_allclose(got, ref, atol=2e-4)

    def loss(model):
        def f(p, x, l):
            lp, mask = model.apply({"params": p}, x, l)
            return jnp.sum(jnp.where(mask[..., None], lp, 0.0))
        return f

    g_ref = jax.grad(loss(ref_model))(params, jnp.asarray(x), jnp.asarray(lens))
    with mesh:
        g_sp = jax.jit(jax.grad(loss(sp_model)))(sharded, xs, ls)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_sp_full_ctc_train_step_through_factory():
    """The driver path: make_ctc_steps(mesh=) on a sequence_parallel model
    over a ('data','model') mesh — one fused train step runs and matches
    the unsharded step's loss."""
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_ctc_steps

    rng = np.random.default_rng(1)
    b, t, u = 8, 4000, 8
    batch = {
        "signal": rng.normal(size=(b, t)).astype(np.float32),
        "signal_lengths": np.full((b,), t, np.int32),
        "token_ids": rng.integers(4, 12, size=(b, u)).astype(np.int32),
        "token_lengths": np.full((b,), u, np.int32),
    }
    tx = create_optimizer(create_lrs(1e-4, 100, warmup_steps=10))

    ref_model = Wav2Vec2AcousticModel(config=_cfg())
    params = ref_model.init(jax.random.PRNGKey(0),
                            jnp.asarray(batch["signal"]),
                            jnp.asarray(batch["signal_lengths"]))["params"]
    ref_grad, _, _ = make_ctc_steps(ref_model, tx, clip=25.0)
    ref_loss, *_ = ref_grad(params, {k: jnp.asarray(v) for k, v in batch.items()},
                            jax.random.PRNGKey(0), freeze=True)

    mesh = make_mesh(data=4, model=2)
    sp_model = Wav2Vec2AcousticModel(
        config=_cfg(sequence_parallel=True))
    state = shard_state(TrainState.create(params, tx), mesh, TP_RULES)
    jbatch = put_batch(batch, mesh)
    grad_fn, update_fn, _ = make_ctc_steps(sp_model, tx, clip=25.0, mesh=mesh)
    loss, grads, bsz, _ = grad_fn(state.params, jbatch, jax.random.PRNGKey(0),
                                  freeze=True)
    state, gnorm = update_fn(state, grads, bsz)
    assert int(state.step) == 1
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    assert np.isfinite(float(gnorm))
