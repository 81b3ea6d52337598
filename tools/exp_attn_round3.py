"""Round-3 attention-roofline experiments (VERDICT r2 item 4).

Measures the full wav2vec2-base pretrain train step (bench geometry:
B=8 x 163,920 samples, T'=512, bf16) under attention-path variants:

  base          current defaults
  packed        packed_qkv=True (Q/K/V as one (768, 2304) GEMM)
  nodrop        attention_dropout=0 (isolation only — NOT shippable, the
                reference recipe specifies 0.1)
  packed_nodrop both

XLA *TPU* flags cannot go through XLA_FLAGS here — the axon relay's
client-side parser only knows the generic flag set and aborts on
xla_tpu_* names. They CAN be forwarded per-compile via JAX's
``compiler_options`` (CompileOptionsProto.env_option_overrides, which
the terminal-side compiler parses and validates — a bogus name fails
the remote compile loudly). Pass them as

  python tools/exp_attn_round3.py base --copts \
      xla_tpu_enable_latency_hiding_scheduler=true,xla_tpu_scoped_vmem_limit_kib=49152

Prints one JSON line per variant with ms/step and audio-sec/sec/chip.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# share the bench's persistent compile cache
os.makedirs("/tmp/a8t_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/a8t_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, T = 8, 163_920
SAMPLE_RATE = 16_000

VARIANTS = {
    "base": {},
    "packed": dict(packed_qkv=True),
    "nodrop": dict(attention_dropout=0.0),
    "packed_nodrop": dict(packed_qkv=True, attention_dropout=0.0),
}


def run(name: str, n_steps: int = 20, copts: dict | None = None) -> dict:
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
    keys = list(jax.random.split(jax.random.PRNGKey(7), n_steps + 1))
    if copts:
        # per-compile forwarding of terminal-side XLA flags (see docstring);
        # the persistent cache keys on CompileOptionsProto, so each option
        # set compiles fresh (visible in compile_s below)
        tl = time.perf_counter()
        train_step = train_step.lower(state, signal, keys[-1]).compile(
            compiler_options=copts)
        print(f"  lower+compile({copts}): "
              f"{time.perf_counter() - tl:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, metrics = train_step(state, signal, keys[-1])
    loss = float(np.asarray(metrics["loss"]))
    compile_s = time.perf_counter() - t0
    # The axon relay adds run-to-run noise well above the effects being
    # measured (base vs nodrop differed by 13% in single windows); take
    # the MIN over 3 windows — the least-perturbed steady state.
    windows = []
    for _ in range(3):
        start = time.perf_counter()
        for i in range(n_steps):
            state, metrics = train_step(state, signal, keys[i])
        np.asarray(metrics["loss"])
        windows.append(time.perf_counter() - start)
    elapsed = min(windows)
    ms = elapsed / n_steps * 1000
    rtfx = (B * T / SAMPLE_RATE) * n_steps / elapsed / jax.device_count()
    return {"variant": name, "ms_per_step": round(ms, 2),
            "audio_sec_per_sec_per_chip": round(rtfx, 2),
            "windows_ms": [round(w / n_steps * 1000, 2) for w in windows],
            "loss": round(loss, 4), "compile_s": round(compile_s, 1),
            "compiler_options": copts or {},
            "xla_flags": os.environ.get("XLA_FLAGS", "")}


def main():
    args = sys.argv[1:]
    copts = None
    if "--copts" in args:
        i = args.index("--copts")
        copts = dict(kv.split("=", 1) for kv in args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    names = args or list(VARIANTS)
    for name in names:
        try:
            print(json.dumps(run(name, copts=copts)), flush=True)
        except Exception as e:  # a rejected flag fails one variant, not all
            print(json.dumps({"variant": name, "error": str(e)[:300],
                              "compiler_options": copts or {}}), flush=True)


if __name__ == "__main__":
    main()
