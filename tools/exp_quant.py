"""Measure int8 quantized serving throughput vs bf16 on the real TPU.

Same batched greedy-CTC serving workload as bench.py's decode metric
(B=16 x 41,359 samples -> T'=128 lane-aligned), wav2vec2-base dims.
The int8 path quantizes every Dense kernel (attention QKV/O + FFN) via
ops/quant.quantize_model_params; conv extractor and norms stay bf16.

Run: timeout 1800 python -u tools/exp_quant.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.ops.quant import quantize_model_params
from audio8_tpu.utils import Offsets

Offsets.remap_fairseq_ctc()
SAMPLE_RATE = 16_000
B, T = 16, 41_359
N_STEPS = 60

cfg = AcousticConfig(num_labels=32, d_ff=3072, dropout=0.0,
                     timestep_masking=0.0, channel_masking=0.0)
model = Wav2Vec2AcousticModel(config=cfg, dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
signal = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
lengths = jnp.full((B,), T, jnp.int32)
params = model.init(jax.random.PRNGKey(0), signal[:1], lengths[:1])["params"]
qparams = quantize_model_params(params)


@jax.jit
def fwd(p, sig, lens):
    # params as an ARGUMENT, not a closure: closed-over arrays bake into
    # the HLO as constants and overflow the remote-compile relay
    lp, mask = model.apply({"params": p}, sig, lens)
    # greedy path + scalar reduce on device (transfer-clean timing)
    ids = jnp.argmax(lp, axis=-1)
    return jnp.sum(ids * mask)


def measure(name, p):
    p = jax.device_put(p)
    np.asarray(fwd(p, signal, lengths))  # compile + sync
    start = time.perf_counter()
    acc = None
    for _ in range(N_STEPS):
        acc = fwd(p, signal, lengths)
    np.asarray(acc)
    elapsed = time.perf_counter() - start
    rtfx = (B * T / SAMPLE_RATE) * N_STEPS / elapsed
    ms = elapsed / N_STEPS * 1e3
    print(f"{name}: {ms:.2f} ms/batch, RTFx {rtfx:.0f}", flush=True)
    return rtfx


print(f"devices: {jax.devices()}", flush=True)
bf16 = measure("bf16", params)
i8 = measure("int8", qparams)
# numeric drift check on device
lp_fn = jax.jit(lambda p, s, l: model.apply({"params": p}, s, l))
lp0, m0 = lp_fn(params, signal, lengths)
lp1, _ = lp_fn(qparams, signal, lengths)
a = np.asarray(lp0, np.float32)[np.asarray(m0, bool)]
b = np.asarray(lp1, np.float32)[np.asarray(m0, bool)]
agree = float((a.argmax(-1) == b.argmax(-1)).mean())
print(f"int8/bf16 = {i8 / bf16:.3f}x; greedy argmax agreement {agree:.4f}",
      flush=True)
