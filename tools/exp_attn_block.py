"""Measure the fused attention-BLOCK kernel end-to-end on the pretrain step.

The core-only fused kernel won in isolation but lost end-to-end to the
pallas_call boundary (docs/PERF.md). The block kernel
(ops/pallas/attention_block_kernel.py) moves the Q/K/V/O projections
inside; this experiment answers whether that recovers the loss:

  full wav2vec2-base pretrain train step (the bench headline shape,
  8 x 163,920 samples, bf16), fused_attention in {None, True, "block"}.

Run: timeout 3500 python -u tools/exp_attn_block.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000


def bench(fused, n_steps=20, b=8, t=163_920):
    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    cfg = PretrainConfig(d_model=768, num_heads=12, num_layers=12,
                         d_ff=3072, final_dim=256, dropout=0.1,
                         fused_attention=fused)
    model = Wav2Vec2Model(config=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    signal = jnp.asarray(rng.normal(size=(b, t)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, signal[:1, :16000], train=True)["params"]
    tx = create_optimizer(create_lrs(5e-4, 1000, warmup_steps=10),
                          weight_decay=0.01)
    state = TrainState.create(params, tx)
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0, n_negatives=100)
    keys = list(jax.random.split(jax.random.PRNGKey(7), n_steps + 1))
    state, metrics = train_step(state, signal, keys[-1])
    loss0 = float(np.asarray(metrics["loss"]))
    start = time.perf_counter()
    for i in range(n_steps):
        state, metrics = train_step(state, signal, keys[i])
    np.asarray(metrics["loss"])
    elapsed = time.perf_counter() - start
    aps = b * t / SAMPLE_RATE
    return aps * n_steps / elapsed, elapsed / n_steps * 1e3, loss0


def main():
    print("backend:", jax.default_backend(), flush=True)
    for fused in (None, "block", None, "block"):
        thr, ms, loss0 = bench(fused)
        print(f"fused_attention={fused!r:8}: {thr:8.1f} audio-sec/sec/chip"
              f"  ({ms:.1f} ms/step, first loss {loss0:.3f})", flush=True)


if __name__ == "__main__":
    main()
