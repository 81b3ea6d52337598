"""Pipeline parallelism (GPipe over a ('pipe','data') mesh) must reproduce
sequential-stack numerics: same forward, same fully-trained step. The
reference has no pipeline story (pure DDP, train.py:261-268); this guards
the TPU-native extension in parallel/pipeline.py."""
import numpy as np
import jax
import pytest
import jax.numpy as jnp

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.nn.transformer import (TransformerEncoderLayer,
                                       TransformerEncoderStack)
from audio8_tpu.parallel.pipeline import (
    make_pp_ctc_steps, make_pp_mesh, pipeline_layers, stack_layer_params,
)
from audio8_tpu.parallel.sharding import put_batch


def test_pipeline_layers_match_sequential_stack():
    assert len(jax.devices()) == 8
    d, h, L = 32, 4, 4
    stack = TransformerEncoderStack(num_heads=h, d_model=d, num_layers=L,
                                    d_ff=64, dropout_rate=0.0)
    rng = np.random.default_rng(0)
    b, t = 8, 12
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    lengths = np.array([12, 12, 10, 8, 12, 6, 12, 9])
    mask = jnp.asarray(np.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    params = stack.init(jax.random.PRNGKey(0), x, mask)["params"]

    ref = np.asarray(stack.apply({"params": params}, x, mask))

    mesh = make_pp_mesh(pipe=4, data=2)
    layer = TransformerEncoderLayer(num_heads=h, d_model=d, d_ff=64,
                                    dropout_rate=0.0)
    stacked = stack_layer_params(params, L)
    n_micro = 4
    xs = x.reshape(n_micro, b // n_micro, t, d)
    masks = mask.reshape(n_micro, b // n_micro, 1, 1, t)

    @jax.jit
    def run(stacked, xs, masks):
        return pipeline_layers(layer, stacked, xs, masks, mesh)

    got = np.asarray(run(stacked, xs, masks)).reshape(b, t, d)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_pp_ctc_train_step_matches_plain_step():
    """One fully-fused PP train step (conv replicated, stack pipelined,
    GPipe microbatches) produces the same loss and updated params as the
    plain single-program step — dropout off so streams are irrelevant,
    span masking ON (both paths fold the same 'mask' rng)."""
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_ctc_steps

    cfg = AcousticConfig(num_labels=12, d_model=64, num_heads=4, num_layers=4,
                         d_ff=128, dropout=0.0, timestep_masking=0.5,
                         channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    rng = np.random.default_rng(1)
    b, t, u = 8, 4000, 8
    batch = {
        "signal": rng.normal(size=(b, t)).astype(np.float32),
        "signal_lengths": np.full((b,), t, np.int32),
        "token_ids": rng.integers(4, 12, size=(b, u)).astype(np.int32),
        "token_lengths": np.full((b,), u, np.int32),
    }
    tx = create_optimizer(create_lrs(1e-4, 100, warmup_steps=10))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["signal"]),
                        jnp.asarray(batch["signal_lengths"]))["params"]
    # both steps donate their state: give each its own buffer copies
    params = jax.tree_util.tree_map(np.asarray, params)
    fresh = lambda: jax.tree_util.tree_map(jnp.asarray, params)

    # plain fused step, single program
    grad_fn, _, _ = make_ctc_steps(model, tx, clip=25.0)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    ref_state, ref_loss, _, _ = grad_fn.train_step(
        TrainState.create(fresh(), tx), jb, jax.random.PRNGKey(5),
        freeze=False)

    # pipelined step over a 4-stage pipe x 2-way data mesh
    mesh = make_pp_mesh(pipe=4, data=2)
    pp_train, pp_eval = make_pp_ctc_steps(model, tx, mesh, n_micro=4,
                                          clip=25.0)
    state = TrainState.create(fresh(), tx)
    pbatch = put_batch(batch, mesh)
    new_state, loss, bsz, _ = pp_train(state, pbatch, jax.random.PRNGKey(5))

    assert int(new_state.step) == 1
    assert float(bsz) == b
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)

    # eval path runs through the same pipeline
    loss, frames, frame_lengths = pp_eval(new_state.params, pbatch)
    assert np.isfinite(float(loss))
    assert frames.shape[0] == b
