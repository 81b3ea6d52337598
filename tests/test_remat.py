"""Layer rematerialization (remat=True) must be a pure memory/speed
tradeoff: identical forward values and gradients, including dropout RNG
streams (flax nn.remat re-plays the same rng counters in the replay)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio8_tpu.nn.transformer import TransformerEncoderStack

KW = dict(num_heads=4, d_model=64, num_layers=2, d_ff=128,
          dropout_rate=0.1, attention_dropout=0.1)


def _value_and_grads(stack, params, x, deterministic):
    def f(p):
        rngs = {} if deterministic else {"dropout": jax.random.PRNGKey(2)}
        y = stack.apply({"params": p}, x, None, deterministic, rngs=rngs)
        return jnp.sum(y ** 2)

    return jax.value_and_grad(f)(params)


@pytest.mark.parametrize("deterministic", [True, False])
def test_remat_parity(deterministic):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 64)),
                    jnp.float32)
    plain = TransformerEncoderStack(**KW)
    remat = TransformerEncoderStack(**KW, remat=True)
    params = plain.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        x, deterministic=False)["params"]

    va, ga = _value_and_grads(plain, params, x, deterministic)
    vb, gb = _value_and_grads(remat, params, x, deterministic)
    np.testing.assert_allclose(va, vb, rtol=1e-6)
    for u, v in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(u, v, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_remat_through_model_config():
    """cfg.remat reaches the stack through Wav2Vec2 models."""
    from audio8_tpu.config import AcousticConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel

    cfg = AcousticConfig(num_labels=8, d_model=64, num_heads=4,
                         num_layers=2, d_ff=128, remat=True)
    model = Wav2Vec2AcousticModel(config=cfg)
    sig = jnp.zeros((1, 16000), jnp.float32)
    lens = jnp.full((1,), 16000, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), sig, lens)["params"]

    def loss(p):
        out, _ = model.apply({"params": p}, sig, lens)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_remat_on_tp_mesh():
    """remat composes with Megatron TP sharding on the mesh (the
    jax.checkpoint replay must not break the partitioner)."""
    from audio8_tpu.config import AcousticConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
    from audio8_tpu.parallel.sharding import (
        TP_RULES, batch_sharding, make_mesh, shard_params,
    )

    cfg = AcousticConfig(num_labels=8, d_model=64, num_heads=4, num_layers=2,
                         d_ff=128, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, remat=True)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.asarray(np.random.default_rng(0).normal(size=(8, 4000)),
                   np.float32)
    lens = np.full((8,), 4000, np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(lens))["params"]
    ref = jax.grad(lambda p: jnp.sum(model.apply(
        {"params": p}, jnp.asarray(x), jnp.asarray(lens),
        freeze=False)[0].astype(jnp.float32) ** 2))(params)

    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh, TP_RULES)
    bs = batch_sharding(mesh)
    g = jax.jit(jax.grad(lambda p, xs, ls: jnp.sum(model.apply(
        {"params": p}, xs, ls, freeze=False)[0].astype(jnp.float32) ** 2)))(
        sharded, jax.device_put(x, bs), jax.device_put(lens, bs))
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)
