"""Multi-chip scaling-readiness analysis (VERDICT r3 #6).

This environment has ONE physical TPU chip, so multi-chip *performance*
cannot be measured — but the multi-chip *program* can be validated ahead
of time: AOT-compile the flagship training step over a virtual v5e-8-like
8-device mesh (DP x Megatron-TP, FSDP/ZeRO-3 sharded state), then inspect
the post-SPMD optimized HLO for the collectives the sharding design
implies and the compiler's per-device memory analysis. Records everything
as SCALING_READINESS.json next to the MULTICHIP artifacts.

What the design predicts (audio8_tpu/parallel/sharding.py):
- FSDP: all-gather of each layer's weights at use, reduce-scatter of its
  gradients (instead of a plain all-reduce);
- Megatron-TP on attention/FFN: all-reduce (psum) of the row-parallel
  matmul partial sums in forward and backward;
- DP: gradient reduction folded into the FSDP reduce-scatter.

Evidence boundaries: the collective counts and the sharded per-device
STATE bytes (params + optimizer moments — exact shape arithmetic) are
backend-independent facts about the partitioned program. The memory
analysis's ``temp_size_in_bytes`` is NOT: it comes from this XLA:CPU
compile, whose fusion/layout/remat choices differ from XLA:TPU, so it
is recorded as context only and nothing asserts a v5e activation fit
from it. (Also: ReduceScatterCreator is a TPU/GPU pass, so FSDP
gradient reduction shows as all-reduce here.)

Asserted by tests/test_scaling_readiness.py; run standalone with
``python tools/scaling_readiness.py`` to regenerate the artifact at
full wav2vec2-base dims.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def analyze(n_devices: int = 8, tp: int = 2, *, d_model: int = 768,
            num_heads: int = 12, num_layers: int = 12, d_ff: int = 3072,
            final_dim: int = 256, num_vq_vars: int = 320, b: int = 8,
            t: int = 163_920, fsdp: bool = True) -> dict:
    """AOT-compile the pretrain train step on an n-device virtual mesh and
    return {collective counts, per-device memory analysis, meta}. Must run
    in a process whose JAX backend is the virtual CPU mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio8_tpu.config import PretrainConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Model
    from audio8_tpu.parallel.sharding import (
        TP_RULES, batch_sharding, make_mesh, shard_state,
    )
    from audio8_tpu.train.optim import TrainState, create_lrs, create_optimizer
    from audio8_tpu.train.steps import make_pretrain_steps

    assert jax.device_count() == n_devices, (jax.device_count(), n_devices)
    mesh = make_mesh(data=n_devices // tp, model=tp)

    cfg = PretrainConfig(d_model=d_model, num_heads=num_heads,
                         num_layers=num_layers, d_ff=d_ff,
                         final_dim=final_dim, num_vq_vars=num_vq_vars,
                         dropout=0.1, sequence_parallel=tp > 1)
    model = Wav2Vec2Model(config=cfg, dtype=jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    signal = jnp.zeros((b, t), jnp.float32)
    params = model.init(rngs, signal[:1, :16000], train=True)["params"]
    tx = create_optimizer(create_lrs(5e-4, 1000, warmup_steps=10),
                          weight_decay=0.01)
    state = shard_state(TrainState.create(params, tx), mesh, TP_RULES,
                        fsdp=fsdp)
    signal = jax.device_put(np.zeros((b, t), np.float32),
                            batch_sharding(mesh))
    train_step, _ = make_pretrain_steps(model, tx, clip=1.0,
                                        n_negatives=100, mesh=mesh)
    jitted = getattr(train_step, "__wrapped__", train_step)

    t0 = time.perf_counter()
    with mesh:
        lowered = jitted.lower(state, signal, jax.random.PRNGKey(7))
        compiled = lowered.compile()
    compile_s = time.perf_counter() - t0

    hlo = compiled.as_text()
    counts = {op: len(re.findall(rf"(?m)= \S+ {op}(?:-start)?\(", hlo))
              for op in COLLECTIVES}

    mem = {}
    try:
        ma = compiled.memory_analysis()
        for field in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes",
                      "alias_size_in_bytes"):
            v = getattr(ma, field, None)
            if v is not None:
                mem[field] = int(v)
    except Exception as e:  # backend without memory analysis
        mem["error"] = f"{type(e).__name__}: {e}"

    # analytic per-device parameter/optimizer-state residency (fp32
    # params + 2 AdamW moments), after FSDP/TP sharding
    def device_bytes(x):
        shard = x.sharding.shard_shape(x.shape)
        return int(np.prod(shard)) * x.dtype.itemsize

    param_bytes = sum(device_bytes(l) for l in jax.tree_util.tree_leaves(
        state.params))
    opt_bytes = sum(device_bytes(l) for l in jax.tree_util.tree_leaves(
        state.opt_state) if hasattr(l, "sharding"))
    full_param_bytes = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(state.params))
    full_opt_bytes = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(l, "sharding"))
    return {
        "topology": {"n_devices": n_devices, "mesh": {"data": n_devices // tp,
                                                      "model": tp},
                     "fsdp": fsdp, "sequence_parallel": tp > 1},
        "model": {"d_model": d_model, "num_layers": num_layers,
                  "d_ff": d_ff, "batch": b, "samples": t},
        "collectives": counts,
        "memory_analysis": mem,
        "per_device_state_bytes": {"params": param_bytes,
                                   "opt_state": opt_bytes},
        "unsharded_state_bytes": {"params": full_param_bytes,
                                  "opt_state": full_opt_bytes},
        "compile_seconds": round(compile_s, 1),
    }


def run_in_virtual_mesh(n_devices: int = 8, **kwargs) -> dict:
    """Re-exec under a forced n-device virtual CPU backend (the calling
    process may hold a single real TPU) and return the analysis dict."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    kw = ", ".join(f"{k}={v!r}" for k, v in kwargs.items())
    code = (
        "import jax, json, sys; jax.config.update('jax_platforms', 'cpu'); "
        "sys.path.insert(0, %r); from tools.scaling_readiness import analyze; "
        "print('A8T_JSON:' + json.dumps(analyze(%d%s)))"
        % (REPO, n_devices, (", " + kw) if kw else ""))
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, check=True)
    for line in proc.stdout.splitlines():
        if line.startswith("A8T_JSON:"):
            return json.loads(line[len("A8T_JSON:"):])
    raise RuntimeError(f"no analysis JSON in output: {proc.stdout[-500:]}")


def main():
    out = run_in_virtual_mesh(8)
    path = os.path.join(REPO, "SCALING_READINESS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps(out, indent=2, sort_keys=True))
    print("wrote", path, file=sys.stderr)


if __name__ == "__main__":
    main()
