"""Stable-LN (pre-norm + layer extractor) topology: training-path
sanity — gradients flow to every param, remat composes, and the
pretraining model runs a full loss step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio8_tpu.config import AcousticConfig, PretrainConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel, Wav2Vec2Model

TOPO = dict(pre_norm=True, extractor_mode="layer", conv_bias=True)


@pytest.mark.slow
@pytest.mark.parametrize("remat", [False, True])
def test_prenorm_acoustic_grads_flow(remat):
    cfg = AcousticConfig(num_labels=8, d_model=64, num_heads=4, num_layers=2,
                         d_ff=128, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, remat=remat, **TOPO)
    model = Wav2Vec2AcousticModel(config=cfg)
    sig = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8000)),
                      jnp.float32)
    lens = jnp.full((2,), 8000, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), sig, lens)["params"]

    def loss(p):
        lp, _ = model.apply({"params": p}, sig, lens, freeze=False)
        return jnp.sum(lp.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves_with_path(g)
    zero = ["/".join(str(getattr(k, "key", k)) for k in p)
            for p, l in flat if not np.any(np.asarray(l))]
    # frozen fx is the default (conv extractor grads legitimately 0);
    # mask_emb is unused with timestep_masking=0
    zero = [k for k in zero
            if "feature_extractor" not in k and not k.endswith("mask_emb")]
    assert zero == [], zero


@pytest.mark.slow
def test_prenorm_pretrain_step():
    cfg = PretrainConfig(d_model=64, num_heads=4, num_layers=2, d_ff=128,
                         num_vq_vars=8, num_vq_groups=2, final_dim=16,
                         dropout=0.1, **TOPO)
    model = Wav2Vec2Model(config=cfg)
    sig = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16000)),
                      jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, sig, train=True)["params"]
    # layer-mode extractor: per-block LNs exist, no GroupNorm
    fx = params["feature_extractor"]
    assert "ln_0" in fx and "norm_0" not in fx
    assert "bias" in fx["conv_0"]
    # stable-LN: final LN lives on the stack, no pre-stack LN
    assert "ln_out" in params["encoder"]["transformer"]
    assert "ln" not in params["encoder"]

    out = model.apply({"params": params}, sig, train=True, temperature=2.0,
                      rngs={k: v for k, v in rngs.items() if k != "params"})
    context_masked, targets_masked, prob_ppl, valid = out
    for arr in (context_masked, targets_masked, prob_ppl):
        assert np.all(np.isfinite(np.asarray(arr, np.float32)))


@pytest.mark.slow
def test_prenorm_tp_forward_matches_replicated():
    """Stable-LN topology under Megatron TP: the catch-all rule
    replicates the new params (per-block extractor LNs, stack ln_out,
    conv biases) and numerics match single-device."""
    from audio8_tpu.parallel.sharding import (
        TP_RULES, batch_sharding, make_mesh, shard_params,
    )

    assert len(jax.devices()) == 8
    cfg = AcousticConfig(num_labels=12, d_model=64, num_heads=4, num_layers=2,
                         d_ff=128, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, **TOPO)
    model = Wav2Vec2AcousticModel(config=cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 4000)).astype(np.float32)
    lens = np.full((8,), 4000, np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(lens))["params"]
    ref, _ = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(lens))

    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh, TP_RULES)
    bs = batch_sharding(mesh)

    @jax.jit
    def fwd(p, xs, ls):
        lp, _ = model.apply({"params": p}, xs, ls)
        return lp

    got = fwd(sharded, jax.device_put(x, bs), jax.device_put(lens, bs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
