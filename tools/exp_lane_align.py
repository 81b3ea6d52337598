"""Lane-aligned clip lengths: does snapping T' to the MXU tile help?

XLA pads matmul tiles to 128 in both free dims, so the attention
score/AV matmuls at T'=546 compute 640x640 tiles — ~37% padding FLOPs.
Cropping the clip so T' lands exactly on a 128 multiple (512) removes
that waste quadratically while shrinking the linear-cost audio only
~6%. This measures the full fused pretrain step (identical model math;
only the static clip length changes — a data-layer knob the reference
also controls freely via bucket cropping,
/root/reference/audio8/data.py:439-480).

Run on an IDLE host: python -u tools/exp_lane_align.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000


def time_pretrain(t: int, b: int = 8, n_steps: int = 20) -> tuple:
    from audio8_tpu.config import CONV_FEATURES, PretrainConfig, \
        conv_output_length
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, \
        create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    tp = conv_output_length(t, CONV_FEATURES[16])
    print(f"[t={t}] T'={tp} ({t / SAMPLE_RATE:.3f}s/clip): build+compile",
          file=sys.stderr, flush=True)
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
    state, metrics = train_step(state, signal, keys[-1])
    np.asarray(metrics["loss"])
    start = time.perf_counter()
    for i in range(n_steps):
        state, metrics = train_step(state, signal, keys[i])
    np.asarray(metrics["loss"])
    step_ms = (time.perf_counter() - start) / n_steps * 1e3
    tput = b * t / SAMPLE_RATE / (step_ms / 1e3)
    return tp, step_ms, tput


def main():
    rows = []
    for t in (175_000,    # current bench clip: T'=546 -> 640-tile matmuls
              163_920,    # T'=512 = 4*128: zero tile padding
              204_880):   # T'=640 = 5*128: fill the padding with real audio
        tp, step_ms, tput = time_pretrain(t)
        rows.append((t, tp, step_ms, tput))
        print(f"t={t:7d} T'={tp:4d}  step {step_ms:6.1f} ms  "
              f"{tput:7.1f} audio-sec/sec/chip", flush=True)
    base = rows[0][3]
    for t, tp, step_ms, tput in rows[1:]:
        print(f"T'={tp}: {tput / base:+.1%} vs T'={rows[0][1]}", flush=True)


if __name__ == "__main__":
    main()
