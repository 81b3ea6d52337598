"""Measure the two k=2/s=2 extractor layers as exact reshape+matmul vs XLA conv.

kernel_size == stride means windows never overlap, so the conv is EXACTLY
``x.reshape(B, T//2, 2*C) @ W.reshape(2*C, C_out)`` — both forward and
backward are pure matmul+reshape (the dgrad overlap-add that killed the
k3s2 phase decomposition, docs/PERF.md ablations, does not exist here).

Times the chained pair (T_in=2048 then 1024 at the lane-aligned bench
shape), fwd and fwd+bwd, one compile per variant.

Run: timeout 3500 python -u tools/exp_conv_k2s2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.nn.layers import _conv1d_nwc

B = 8
T_IN = 2048  # k2s2 block input at the 163,920-sample lane-aligned crop
C = 512


def timeit(fn, *args, n=50):
    out = fn(*args)
    assert np.asarray(out).size == 1, "timed fns must reduce to a scalar"
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / n * 1e3


def conv_chain(x, ws):
    for w in ws:
        x = jax.nn.gelu(_conv1d_nwc(x, w, 2, "VALID"))
    return x


def matmul_chain(x, ws):
    for w in ws:
        b, t, c = x.shape
        y = x.reshape(b, t // 2, 2 * c) @ w.reshape(2 * c, -1)
        x = jax.nn.gelu(y)
    return x


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T_IN, C)).astype(np.float32),
                    dtype=jnp.bfloat16)
    ws = [jnp.asarray(rng.normal(size=(2, C, C)).astype(np.float32) * 0.03,
                      dtype=jnp.bfloat16) for _ in range(2)]

    # parity check first (bf16 tolerance)
    a = np.asarray(conv_chain(x.astype(jnp.float32),
                              [w.astype(jnp.float32) for w in ws]))
    b = np.asarray(matmul_chain(x.astype(jnp.float32),
                                [w.astype(jnp.float32) for w in ws]))
    print("parity max|d| =", np.abs(a - b).max(), flush=True)

    fwd_conv = jax.jit(lambda x, ws: conv_chain(x, ws).sum())
    fwd_mm = jax.jit(lambda x, ws: matmul_chain(x, ws).sum())
    fb_conv = jax.jit(jax.grad(lambda ws, x: conv_chain(x, ws).sum().astype(jnp.float32),
                               argnums=0))
    fb_mm = jax.jit(jax.grad(lambda ws, x: matmul_chain(x, ws).sum().astype(jnp.float32),
                             argnums=0))

    def red(fn):
        return lambda *a: sum(jnp.sum(g.astype(jnp.float32)) for g in fn(*a))

    print(f"conv   fwd  {timeit(fwd_conv, x, ws):8.3f} ms", flush=True)
    print(f"matmul fwd  {timeit(fwd_mm, x, ws):8.3f} ms", flush=True)
    print(f"conv   f+b  {timeit(red(fb_conv), ws, x):8.3f} ms", flush=True)
    print(f"matmul f+b  {timeit(red(fb_mm), ws, x):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
