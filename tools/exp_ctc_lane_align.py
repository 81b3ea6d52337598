"""Does lane-aligning the supervised pad grid help the CTC step?

Supervised batches PAD to a length grid (no cropping — the audio is
transcribed), so the lever is different from pretraining: pad targets
must never push T' across a 128-lane MXU tile boundary that the data
itself didn't require. The default pad_to_multiple=16000 grid does this
all the time: max_audio=41,000 (T'=127, one tile) rounds up to 48,000
(T'=149 -> 256-wide score/AV tiles, ~2x the quadratic FLOPs).

This times the full CTC fine-tune step at tile-exact vs overshooting pad
targets, same batch row count. Run on an IDLE host:
python -u tools/exp_ctc_lane_align.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000


def time_ctc(t: int, b: int = 16, n_steps: int = 30, freeze: bool = False):
    from audio8_tpu.config import CONV_FEATURES, AcousticConfig, \
        conv_output_length
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_ctc_steps
    from audio8_tpu.utils import Offsets

    Offsets.remap_fairseq_ctc()
    tp = conv_output_length(t, CONV_FEATURES[16])
    print(f"[b={b} t={t}] T'={tp}: build+compile", file=sys.stderr, flush=True)
    cfg = AcousticConfig(num_labels=32, d_ff=3072, dropout=0.1,
                         timestep_masking=0.5, channel_masking=0.1)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=jnp.bfloat16)
    u = 64
    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(b, t)).astype(np.float32)),
        "signal_lengths": jnp.full((b,), t, jnp.int32),
        "token_ids": jnp.asarray(rng.integers(4, 32, size=(b, u)), jnp.int32),
        "token_lengths": jnp.full((b,), u, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["signal"][:1],
                        batch["signal_lengths"][:1])["params"]
    tx = create_optimizer(create_lrs(1e-4, 1000, warmup_steps=10))
    state = TrainState.create(params, tx)
    grad_fn, _, _ = make_ctc_steps(model, tx, clip=25.0)
    step = grad_fn.train_step
    keys = list(jax.random.split(jax.random.PRNGKey(3), n_steps + 1))
    state, loss, _, _ = step(state, batch, keys[-1], freeze=freeze)
    np.asarray(loss)
    start = time.perf_counter()
    for i in range(n_steps):
        state, loss, _, _ = step(state, batch, keys[i], freeze=freeze)
    np.asarray(loss)
    step_ms = (time.perf_counter() - start) / n_steps * 1e3
    tput = b * t / SAMPLE_RATE / (step_ms / 1e3)
    return tp, step_ms, tput


def main():
    rows = []
    for b, t in ((16, 48_000),    # current bench workload: T'=149 -> 256 tiles
                 (16, 41_359),    # T'=128 exactly: one tile, same row count
                 (16, 82_319),    # T'=256 exactly: two tiles, 2x audio/step
                 (8, 82_319)):    # ~same samples/batch budget as 16x41359
        tp, step_ms, tput = time_ctc(t, b=b)
        rows.append((b, t, tp, step_ms, tput))
        print(f"b={b:2d} t={t:6d} T'={tp:3d}  step {step_ms:6.1f} ms  "
              f"{tput:7.1f} audio-sec/sec/chip", flush=True)
    base = rows[0][4]
    for b, t, tp, step_ms, tput in rows[1:]:
        print(f"b={b} T'={tp}: {tput / base - 1:+.1%} vs b=16 T'=149",
              flush=True)


if __name__ == "__main__":
    main()
