"""Does merging Q/K/V projections into one matmul pay on the TPU?

Three (B*T, d) @ (d, d) matmuls vs one (B*T, d) @ (d, 3d), fwd + bwd,
at the pretrain hot shape (B=8, T'=512, d=768). If XLA's scheduling of
the three separate GEMMs already saturates the MXU, the merge is not
worth restructuring the param tree (converter + TP rules churn).

Run: timeout 1200 python -u tools/exp_qkv.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

B, T, D = 8, 512, 768
N = 200
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B * T, D)).astype(np.float32), jnp.bfloat16)
w3 = jnp.asarray(rng.normal(size=(3, D, D)).astype(np.float32) * 0.02,
                 jnp.bfloat16)
wm = jnp.reshape(jnp.transpose(w3, (1, 0, 2)), (D, 3 * D))


@jax.jit
def sep_fb(x, w3):
    def f(x):
        q = x @ w3[0]
        k = x @ w3[1]
        v = x @ w3[2]
        return jnp.sum(q * k + v)

    l, g = jax.value_and_grad(f)(x)
    return l + jnp.sum(g)


@jax.jit
def merged_fb(x, wm):
    def f(x):
        qkv = x @ wm
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return jnp.sum(q * k + v)

    l, g = jax.value_and_grad(f)(x)
    return l + jnp.sum(g)


def measure(name, fn, *args):
    np.asarray(fn(*args))
    start = time.perf_counter()
    out = None
    for _ in range(N):
        out = fn(*args)
    np.asarray(out)
    ms = (time.perf_counter() - start) / N * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


print(f"devices: {jax.devices()}", flush=True)
a = measure("3 separate (d,d) GEMMs f+b", sep_fb, x, w3)
b = measure("1 merged (d,3d) GEMM  f+b", merged_fb, x, wm)
print(f"merged/separate = {b / a:.3f}x", flush=True)
