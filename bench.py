"""Benchmark: wav2vec2-base contrastive-pretraining train-step throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric is the north-star from BASELINE.md: audio-sec/sec/chip (RTFx) for
wav2vec2-base pretraining (full fwd+bwd+update, bf16 compute / fp32
params). ``vs_baseline`` is measured throughput divided by an estimated
fairseq-on-A100 reference of 650 audio-sec/sec/chip, derived from the
wav2vec 2.0 paper's published training budget (BASE: 64 V100s, 400k
updates, ~1.6h-audio batches, ~1.6 days -> ~260 audio-sec/sec/V100; A100
~2.5x V100 bf16 -> ~650). The BASELINE.json target of ">=2x A100" is
vs_baseline >= 2.0.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_AUDIO_SEC_PER_SEC = 650.0
SAMPLE_RATE = 16_000


def main():
    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    # wav2vec2-base; dense min-cropped pretraining batch like the reference
    # (~1.4M samples/batch budget -> here 8 x 175k samples = 87.5 audio-sec)
    cfg = PretrainConfig(d_ff=3072, dropout=0.1)
    model = Wav2Vec2Model(config=cfg, dtype=jnp.bfloat16)
    b, t = 8, 175_000

    rng = np.random.default_rng(0)
    signal = jnp.asarray(rng.normal(size=(b, t)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, signal[:1, :16000], train=True)["params"]

    tx = create_optimizer(create_lrs(5e-4, 1000, warmup_steps=10),
                          weight_decay=0.01)
    state = TrainState.create(params, tx)
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0, n_negatives=100)

    n_steps = 20
    # pre-split step keys so the timed loop is pure train-step dispatches
    keys = list(jax.random.split(jax.random.PRNGKey(7), n_steps + 1))

    # warmup/compile (np.asarray forces a real host sync on the async relay)
    state, metrics = train_step(state, signal, keys[-1])
    np.asarray(metrics["loss"])

    start = time.perf_counter()
    for i in range(n_steps):
        state, metrics = train_step(state, signal, keys[i])
    np.asarray(metrics["loss"])
    elapsed = time.perf_counter() - start

    audio_sec_per_step = b * t / SAMPLE_RATE
    n_chips = jax.device_count()
    throughput = audio_sec_per_step * n_steps / elapsed / n_chips
    print(json.dumps({
        "metric": "wav2vec2_base_pretrain_throughput",
        "value": round(throughput, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(throughput / A100_BASELINE_AUDIO_SEC_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
