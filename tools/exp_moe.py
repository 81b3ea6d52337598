"""Measure MoE routing overhead on the real chip.

wav2vec2-base pretrain step, dense vs MoE FFN (E=8 experts every 2nd
layer, top-1, capacity 1.25) at the bench shape. On ONE chip MoE pays
the routing/dispatch machinery without the conditional-compute payoff
(that comes from scaling E with chips under EP), so this isolates the
overhead: dispatch/combine one-hot einsums + router + capacity
bookkeeping.

Run: timeout 3500 python -u tools/exp_moe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def measure(moe_experts: int, n_steps: int = 12) -> float:
    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    cfg = PretrainConfig(d_ff=3072, dropout=0.1, moe_experts=moe_experts,
                         moe_every=2, moe_capacity_factor=1.25)
    model = Wav2Vec2Model(config=cfg, dtype=jnp.bfloat16)
    b, t = 8, 163_920
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
    np.asarray(metrics["loss"])
    print(f"  E={moe_experts}: compiled", flush=True)
    start = time.perf_counter()
    for i in range(n_steps):
        state, metrics = train_step(state, signal, keys[i])
    np.asarray(metrics["loss"])
    elapsed = time.perf_counter() - start
    return b * t / 16_000 * n_steps / elapsed


def main():
    dense = measure(0)
    print(f"dense:  {dense:8.1f} audio-sec/sec/chip", flush=True)
    moe = measure(8)
    print(f"moe E8: {moe:8.1f} audio-sec/sec/chip "
          f"({(dense / moe - 1) * 100:.1f}% overhead; 6 of 12 layers MoE, "
          f"params +{(8 - 1) * 6 * 2 * 768 * 3072 / 95e6 * 100:.0f}%)",
          flush=True)


if __name__ == "__main__":
    main()
