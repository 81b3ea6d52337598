"""Measure the fused (analytic alpha/beta VJP) transducer loss vs the
autodiff-through-scan backward, on the bench.py RNN-T geometry.

Two measurements:
1. loss-only microbench: value_and_grad of the loss wrt the (B, T', U+1, V)
   log-probs (isolates the lattice recursion's backward cost);
2. full train step via make_transducer_steps(fused_loss=...) — the number
   that moves bench.py --workload transducer.

Run on the real TPU (no env overrides); prints one line per variant.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.config import TransducerConfig
from audio8_tpu.models.transducer import Transducer
from audio8_tpu.ops.transducer import transducer_loss
from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
from audio8_tpu.train.steps import make_transducer_steps
from audio8_tpu.utils import Offsets

B, T_SAMP, U, V = 16, 41_359, 64, 32
SAMPLE_RATE = 16_000


def time_fn(fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force through the relay
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - start) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    t_frames = 128  # lane-aligned T' for 41,359 samples

    # --- loss-only: value_and_grad wrt log-probs
    x = rng.normal(size=(B, t_frames, U + 1, V)).astype(np.float32)
    lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
    fl = jnp.full((B,), t_frames, jnp.int32)
    tg = jnp.asarray(rng.integers(4, V, size=(B, U)), jnp.int32)
    tl = jnp.full((B,), U, jnp.int32)

    for fused in (False, True):
        g = jax.jit(jax.value_and_grad(
            lambda p: transducer_loss(p, fl, tg, tl, blank=0,
                                      reduction="sum", fused=fused)))
        ms = time_fn(g, lp)
        print(f"loss-only fused={fused}: {ms:.2f} ms", flush=True)

    # --- full train step (bench geometry)
    Offsets.remap_fairseq_ctc()
    cfg = TransducerConfig(vocab_size=V, d_ff=3072, dropout=0.1,
                           timestep_masking=0.5, channel_masking=0.1)
    model = Transducer(config=cfg, dtype=jnp.bfloat16)
    batch = {
        "signal": jnp.asarray(
            rng.normal(size=(B, T_SAMP)).astype(np.float32)),
        "signal_lengths": jnp.full((B,), T_SAMP, jnp.int32),
        "token_ids": tg,
        "token_lengths": tl,
    }
    params = model.init(jax.random.PRNGKey(0), batch["signal"][:1],
                        batch["signal_lengths"][:1],
                        batch["token_ids"][:1])["params"]
    tx = create_optimizer(create_lrs(1e-4, 1000, warmup_steps=10))
    key = jax.random.PRNGKey(3)

    for fused in (False, True):
        state = TrainState.create(params, tx)
        grad_fn, _, _, _ = make_transducer_steps(model, tx, clip=25.0,
                                                 fused_loss=fused)
        step = grad_fn.train_step

        def run(state):
            state, loss, _, _ = step(state, batch, key, freeze=False)
            return state, loss

        state, loss = run(state)
        np.asarray(loss)
        n = 20
        start = time.perf_counter()
        for _ in range(n):
            state, loss = run(state)
        np.asarray(loss)
        ms = (time.perf_counter() - start) / n * 1e3
        # the step is built with mesh=None (no sharding), so this is
        # whole-host throughput; don't divide by device_count
        rtfx = (B * T_SAMP / SAMPLE_RATE) / (ms / 1e3)
        print(f"train-step fused={fused}: {ms:.2f} ms "
              f"({rtfx:.0f} audio-sec/sec)", flush=True)


if __name__ == "__main__":
    main()
