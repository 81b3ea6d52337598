"""Op-level profile of the wav2vec2-base pretrain step (bench geometry).

Runs a few steps under ``jax.profiler.trace`` and aggregates device-plane
event durations from the captured xplane (``jax.profiler.ProfileData`` —
no tensorboard needed), printing the top ops by total time. This is the
measurement behind docs/PERF.md's attention-roofline section: where the
53 ms step actually goes, per XLA fusion.

  python -u tools/exp_profile_pretrain.py            # TPU, base config
  python -u tools/exp_profile_pretrain.py packed     # a config variant

Variants are exp_attn_round3.VARIANTS keys.
"""
from __future__ import annotations

import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/a8t_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/a8t_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from exp_attn_round3 import SAMPLE_RATE, VARIANTS
from exp_attn_round3 import B as _B_DEFAULT, T as _T_DEFAULT

# geometry override (round 4: profile the 16 x 82,000 T'=256 headline)
B = int(os.environ.get("A8T_PROF_B", _B_DEFAULT))
T = int(os.environ.get("A8T_PROF_T", _T_DEFAULT))


def build(name: str):
    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    cfg = PretrainConfig(dropout=0.1, **VARIANTS[name])
    model = Wav2Vec2Model(config=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    signal = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, signal[:1, :16000], train=True)["params"]
    tx = create_optimizer(create_lrs(5e-4, 1000, warmup_steps=10),
                          weight_decay=0.01)
    state = TrainState.create(params, tx)
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0, n_negatives=100)
    return train_step, state, signal


def profile(name: str, n_steps: int = 5, outdir: str = "/tmp/a8t_profile"):
    train_step, state, signal = build(name)
    keys = list(jax.random.split(jax.random.PRNGKey(7), n_steps + 2))
    t0 = time.perf_counter()
    state, metrics = train_step(state, signal, keys[-1])
    np.asarray(metrics["loss"])
    print(f"compile+1st step {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    state, metrics = train_step(state, signal, keys[-2])  # warm
    np.asarray(metrics["loss"])
    with jax.profiler.trace(outdir):
        for i in range(n_steps):
            state, metrics = train_step(state, signal, keys[i])
        np.asarray(metrics["loss"])
    return sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                            recursive=True))[-1]


def summarize(xplane_path: str, n_steps: int, top: int = 45):
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(xplane_path, "rb").read())
    device_planes = [p for p in pd.planes
                     if "TPU" in p.name or "/device" in p.name.lower()]
    if not device_planes:
        print("NO DEVICE PLANE — planes:", [p.name for p in pd.planes])
        device_planes = [p for p in pd.planes if "CPU" in p.name]
    total = collections.Counter()
    for plane in device_planes:
        for line in plane.lines:
            for ev in line.events:
                if ev.name.startswith("end:"):
                    continue
                total[ev.name] += ev.duration_ns
    grand = sum(total.values())
    print(f"planes: {[p.name for p in device_planes]}")
    print(f"total device time: {grand / 1e6:.2f} ms over {n_steps} steps "
          f"= {grand / 1e6 / n_steps:.2f} ms/step")
    print(f"{'op':<64} {'ms/step':>8} {'%':>6}")
    for name, ns in total.most_common(top):
        print(f"{name[:64]:<64} {ns / 1e6 / n_steps:8.3f} "
              f"{100.0 * ns / grand:6.2f}")


if __name__ == "__main__":
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    path = profile(variant)
    print("xplane:", path, file=sys.stderr)
    summarize(path, 5)
