"""Round-4 experiment: pretrain batch geometry at a fixed sample budget.

The reference's pretrain budget is ~1.4M samples/batch assembled by
min-crop dense batching (/root/reference/audio8/data.py:409-426) — the
B x T split is data-dependent there, and OUR pipeline picks static grid
shapes (config.lane_aligned_grid), so the grid builder is free to prefer
whichever lane-aligned geometry the device runs fastest *at the same
audio-sec per step*. Attention work scales with B*T'^2 while conv/FFN
work scales with B*T', so more-rows x shorter-clips trades the
attention quadratic against per-row fixed costs.

Method: min-of-3 20-step windows per geometry (PERF.md round-3
methodology), one process, sequential compiles.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000


def measure(b: int, t: int, n_steps: int = 20, windows: int = 3) -> dict:
    from audio8_tpu.config import CONV_FEATURES, PretrainConfig, conv_output_length
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    tp = conv_output_length(t, CONV_FEATURES[16])
    cfg = PretrainConfig(dropout=0.1)
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

    print(f"[geom b={b} t={t} T'={tp}] compiling...", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    state, metrics = train_step(state, signal, keys[-1])
    np.asarray(metrics["loss"])
    print(f"[geom b={b} t={t}] compiled in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)

    best = float("inf")
    rates = []
    for w in range(windows):
        start = time.perf_counter()
        for i in range(n_steps):
            state, metrics = train_step(state, signal, keys[i])
        np.asarray(metrics["loss"])
        elapsed = time.perf_counter() - start
        ms = elapsed / n_steps * 1e3
        rate = (b * t / SAMPLE_RATE) * n_steps / elapsed
        rates.append(rate)
        best = min(best, ms)
        print(f"  window {w}: {ms:.2f} ms/step, {rate:.0f} audio-s/s",
              file=sys.stderr, flush=True)
    return {"b": b, "t": t, "tp": tp, "budget": b * t,
            "best_ms": round(best, 2),
            "best_rate": round(max(rates), 1)}


def main():
    results = []
    # same ~1.31M-sample budget, lane-aligned T' (= 320*T' + 80):
    # T' 512 / 256 / 128 / 64
    for b, t in [(8, 163_920), (16, 82_000), (32, 41_040), (64, 20_560)]:
        results.append(measure(b, t))
        print(results[-1], flush=True)
    print("\nSUMMARY")
    for r in results:
        print(f"  {r['b']:>3} x {r['t']:>7} (T'={r['tp']:>4}): "
              f"{r['best_ms']:7.2f} ms  {r['best_rate']:7.1f} audio-s/s")


if __name__ == "__main__":
    main()
