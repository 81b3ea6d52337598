"""Gradient accumulation (cli/train.py's default --grad_accum 2 path):
two half-batch grad_fn calls + accumulate_grads + update_fn must match
the fused single-dispatch train_step on the full batch. This is the one
driver code path the e2e tests skip (they all pass --grad_accum 1)."""
import numpy as np
import jax
import jax.numpy as jnp

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.steps import accumulate_grads, make_ctc_steps
from audio8_tpu.utils import Offsets

SMALL = dict(d_model=64, num_heads=4, num_layers=2, d_ff=128)


def _batch(rng, b, t=4000, u=12):
    return {
        "signal": jnp.asarray(rng.normal(size=(b, t)).astype(np.float32)),
        "signal_lengths": jnp.full((b,), t, jnp.int32),
        "token_ids": jnp.asarray(rng.integers(4, 12, size=(b, u)), jnp.int32),
        "token_lengths": jnp.full((b,), u, jnp.int32),
    }


def test_grad_accum_matches_fused_step():
    Offsets.remap_fairseq_ctc()
    cfg = AcousticConfig(num_labels=12, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, **SMALL)
    model = Wav2Vec2AcousticModel(config=cfg)
    tx = create_optimizer(create_lrs(1e-3, 100, warmup_steps=1))
    rng = np.random.default_rng(0)
    full = _batch(rng, 4)
    halves = [{k: v[:2] for k, v in full.items()},
              {k: v[2:] for k, v in full.items()}]

    grad_fn, update_fn, _ = make_ctc_steps(model, tx)
    params = model.init(jax.random.PRNGKey(0), full["signal"][:1],
                        full["signal_lengths"][:1])["params"]
    key = jax.random.PRNGKey(7)

    # the fused step donates its state, so the accumulated path needs its
    # own copy of the initial params
    params_b = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                      params)

    # fused single-dispatch step on the full batch
    state_a = TrainState.create(params, tx)
    state_a, loss_a, bsz, _ = grad_fn.train_step(state_a, full, key,
                                                 freeze=True)
    assert float(bsz) == 4.0

    # accumulated: two half-batches (same masking key per micro-batch is
    # fine — the comparison only needs the two paths to see identical
    # randomness, which they do because grad_fn folds the key per call)
    state_b = TrainState.create(params_b, tx)
    acc, examples = None, 0.0
    losses = []
    for half in halves:
        loss, grads, b, _ = grad_fn(state_b.params, half, key, freeze=True)
        acc = accumulate_grads(acc, grads)
        examples += float(b)
        losses.append(float(loss))
    state_b, _ = update_fn(state_b, acc, jnp.asarray(examples, jnp.float32))

    # CTC sum-reduction: losses and grads add linearly over rows
    np.testing.assert_allclose(sum(losses), float(loss_a), rtol=1e-4)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b_ in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)
    assert int(state_a.step) == int(state_b.step) == 1
