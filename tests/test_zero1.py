"""ZeRO-1 optimizer-state sharding (parallel/sharding.py zero1_shardings).

The reference replicates AdamW moments per GPU (plain DDP,
/root/reference/audio8/train.py:266-268); the TPU rebuild can shard them
over the 'data' mesh axis (SURVEY.md §2.6 optional extension). These tests
assert (a) the moments really land sharded, (b) training numerics are
identical to the replicated-state step.
"""
import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.parallel.sharding import (
    DP_ONLY_RULES, batch_sharding, make_mesh, shard_state, zero1_shardings)
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.steps import make_ctc_steps
from audio8_tpu.utils import Offsets

SMALL = dict(d_model=64, num_layers=2, num_heads=4, d_ff=128)


def _setup():
    Offsets.remap_fairseq_ctc()
    cfg = AcousticConfig(num_labels=12, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, **SMALL)
    model = Wav2Vec2AcousticModel(config=cfg)
    tx = create_optimizer(create_lrs(1e-3, 100, warmup_steps=1),
                          weight_decay=0.01)
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
    return model, tx, params, batch_np


def test_zero1_moments_are_sharded():
    model, tx, params, _ = _setup()
    mesh = make_mesh(data=8, model=1)
    state = TrainState.create(params, tx)
    sh = zero1_shardings(state, mesh, DP_ONLY_RULES)
    # a transformer kernel moment: (64, 64) -> P('data', None)
    mu = sh.opt_state.inner_state[0].mu
    k = mu["encoder"]["encoder"]["transformer"]["layer_0"]["self_attn"]["w_Q"]["kernel"]
    assert tuple(k.spec) in ((("data",)), ("data", None))
    # the matching param stays replicated under DP rules
    pk = sh.params["encoder"]["encoder"]["transformer"]["layer_0"]["self_attn"]["w_Q"]["kernel"]
    assert not any(pk.spec)  # P(None, None) == fully replicated
    # scalars (step counts) replicate
    assert not any(sh.step.spec)


def test_zero1_composes_with_tp_rules():
    """Under TP + ZeRO-1, moments must KEEP the Megatron 'model' split and
    ADD 'data' on a free axis — not replace it (each device then holds
    1/(dp*tp) of every TP moment)."""
    from audio8_tpu.parallel.sharding import TP_RULES

    model, tx, params, _ = _setup()
    mesh = make_mesh(data=4, model=2)
    state = TrainState.create(params, tx)
    sh = zero1_shardings(state, mesh, TP_RULES)
    mu = sh.opt_state.inner_state[0].mu
    layer = mu["encoder"]["encoder"]["transformer"]["layer_0"]
    # w_Q kernel param rule is P(None, 'model'); moment adds 'data' on axis 0
    assert tuple(layer["self_attn"]["w_Q"]["kernel"].spec) == ("data", "model")
    # w_O kernel rule is P('model', None); moment adds 'data' on axis 1
    assert tuple(layer["self_attn"]["w_O"]["kernel"].spec) == ("model", "data")


def test_zero1_numerics_match_replicated():
    assert len(jax.devices()) == 8
    model, tx, params, batch_np = _setup()
    mesh = make_mesh(data=8, model=1)
    bs = batch_sharding(mesh)
    batch = {k: jax.device_put(v, bs) for k, v in batch_np.items()}
    grad_fn, update_fn, _ = make_ctc_steps(model, tx)

    params_host = jax.device_get(params)

    def run(zero1):
        # fresh copies: update_fn donates the state, which would invalidate
        # a params tree shared between the two runs
        fresh = jax.tree_util.tree_map(jnp.asarray, params_host)
        state = shard_state(TrainState.create(fresh, tx), mesh,
                            DP_ONLY_RULES, zero1=zero1)
        loss, grads, bsz, _ = grad_fn(state.params, batch,
                                      jax.random.PRNGKey(0), freeze=False)
        state, gnorm = update_fn(state, grads, bsz)
        return float(loss), float(gnorm), jax.device_get(state.params)

    # one full step: the update is elementwise, so sharded moments must give
    # the replicated result exactly up to global_norm's reduction order
    # (~1e-7 relative); multi-step trajectories then amplify that noise
    # chaotically, so the contract is per-step equality, not long-run.
    loss_r, gnorm_r, params_r = run(False)
    loss_z, gnorm_z, params_z = run(True)
    np.testing.assert_allclose(loss_z, loss_r, rtol=1e-6)
    np.testing.assert_allclose(gnorm_z, gnorm_r, rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves(params_r)
    flat_z = jax.tree_util.tree_leaves(params_z)
    for a, b in zip(flat_r, flat_z):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
