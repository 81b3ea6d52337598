"""Tensor-parallel correctness: a ('data','model') mesh with Megatron-style
sharding must reproduce single-device numerics (XLA inserts the psums)."""
import numpy as np
import jax
import jax.numpy as jnp

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.parallel.sharding import (
    TP_RULES, batch_sharding, make_mesh, shard_params,
)


def test_tp_forward_matches_replicated():
    assert len(jax.devices()) == 8
    cfg = AcousticConfig(num_labels=12, d_model=64, num_heads=4, num_layers=2,
                         d_ff=128, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 4000)).astype(np.float32)
    lens = np.full((8,), 4000, np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(lens))["params"]

    ref, _ = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(lens))
    ref = np.asarray(ref)

    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh, TP_RULES)
    bs = batch_sharding(mesh)
    xs = jax.device_put(x, bs)
    ls = jax.device_put(lens, bs)

    @jax.jit
    def fwd(p, x, l):
        lp, _ = model.apply({"params": p}, x, l)
        return lp

    got = np.asarray(fwd(sharded, xs, ls))
    np.testing.assert_allclose(got, ref, atol=2e-4)

    # gradients agree too (loss = sum of log-probs at valid frames)
    def loss(p, x, l):
        lp, mask = model.apply({"params": p}, x, l)
        return jnp.sum(jnp.where(mask[..., None], lp, 0.0))

    g_ref = jax.grad(loss)(params, jnp.asarray(x), jnp.asarray(lens))
    g_tp = jax.jit(jax.grad(loss))(sharded, xs, ls)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_tp_forward_matches_replicated_wavlm():
    """Gated relative position bias (WavLM) under TP: the per-layer gate
    tensors carry the head axis, so the sharded (B,H,T,T) logits + the
    replicated bias table must still reproduce replicated numerics."""
    assert len(jax.devices()) == 8
    cfg = AcousticConfig(num_labels=12, d_model=64, num_heads=4, num_layers=2,
                         d_ff=128, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, gated_rel_pos=True,
                         rel_pos_buckets=32, rel_pos_max_distance=16)
    model = Wav2Vec2AcousticModel(config=cfg)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 4000)).astype(np.float32)
    lens = np.full((8,), 4000, np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(lens))["params"]

    ref, _ = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(lens))
    ref = np.asarray(ref)

    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh, TP_RULES)
    bs = batch_sharding(mesh)
    xs = jax.device_put(x, bs)
    ls = jax.device_put(lens, bs)

    @jax.jit
    def fwd(p, x, l):
        lp, _ = model.apply({"params": p}, x, l)
        return lp

    got = np.asarray(fwd(sharded, xs, ls))
    np.testing.assert_allclose(got, ref, atol=2e-4)

    def loss(p, x, l):
        lp, mask = model.apply({"params": p}, x, l)
        return jnp.sum(jnp.where(mask[..., None], lp, 0.0))

    g_ref = jax.grad(loss)(params, jnp.asarray(x), jnp.asarray(lens))
    g_tp = jax.jit(jax.grad(loss))(sharded, xs, ls)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)
