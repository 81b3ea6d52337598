"""Per-op profile of the bench pretrain train step on the live backend.

Captures a jax.profiler trace around a few already-compiled steps and
aggregates device-lane op durations from the perfetto JSON the profiler
writes, printing the top ops by total time. This is how the conv/attention
perf claims in docs/PERF.md were attributed.

Usage: python tools/profile_step.py [--workload pretrain|ctc] [--steps 3]
"""
import argparse
import glob
import gzip
import json
import os
import re
import tempfile
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def build_pretrain_step():
    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    cfg = PretrainConfig(d_ff=3072, dropout=0.1)
    model = Wav2Vec2Model(config=cfg, dtype=jnp.bfloat16)
    b, t = 8, 175_000
    rng = np.random.default_rng(0)
    signal = jnp.asarray(rng.normal(size=(b, t)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(rngs, signal[:1, :16000], train=True)["params"]
    tx = create_optimizer(create_lrs(5e-4, 1000, warmup_steps=10), weight_decay=0.01)
    state = TrainState.create(params, tx)
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0, n_negatives=100)

    def run(state, key):
        return train_step(state, signal, key)

    return state, run


def build_ctc_step(freeze=False):
    from audio8_tpu.config import AcousticConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_ctc_steps
    from audio8_tpu.utils import Offsets

    Offsets.remap_fairseq_ctc()
    cfg = AcousticConfig(num_labels=32, d_ff=3072, dropout=0.1,
                         timestep_masking=0.5, channel_masking=0.1)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=jnp.bfloat16)
    b, t, u = 16, 48_000, 64
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

    def run(state, key):
        new_state, loss, _, _ = grad_fn.train_step(state, batch, key, freeze=freeze)
        return new_state, {"loss": loss}

    return state, run


def aggregate(trace_dir, min_us=50.0):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace written under {trace_dir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # Identify device lanes: process names containing TPU/device.
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    device_pids = {pid for pid, n in pid_name.items()
                   if re.search(r"TPU|/device|Device|XLA", n or "")}
    totals = defaultdict(float)
    counts = defaultdict(int)
    lane_total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))
        totals[name] += dur
        counts[name] += 1
        lane_total += dur

    print(f"trace: {paths[0]}")
    print(f"process lanes: {sorted(set(pid_name.values()))}")
    print(f"total device-lane time: {lane_total/1e3:.2f} ms "
          f"(all traced steps, all lanes)")
    print(f"{'total_us':>10} {'n':>5}  name")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:45]:
        if us < min_us:
            break
        print(f"{us:10.0f} {counts[name]:5d}  {name[:140]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=["pretrain", "ctc", "ctc_frozen"],
                    default="pretrain")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    if args.workload == "pretrain":
        state, run = build_pretrain_step()
    else:
        state, run = build_ctc_step(freeze=args.workload == "ctc_frozen")

    keys = list(jax.random.split(jax.random.PRNGKey(7), args.steps + 1))
    state, metrics = run(state, keys[-1])
    np.asarray(metrics["loss"])  # compile + sync

    outdir = args.outdir or tempfile.mkdtemp(prefix="a8t_profile_")
    with jax.profiler.trace(outdir):
        for i in range(args.steps):
            state, metrics = run(state, keys[i])
        np.asarray(metrics["loss"])
    aggregate(outdir)


if __name__ == "__main__":
    main()
