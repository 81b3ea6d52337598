"""Experiment: strided Conv1D as phase-decomposed MXU matmuls.

A VALID strided conv ``out[t] = sum_j x[s*t + j] @ W[j]`` can be computed
as one matmul over K strided slices concatenated on the channel axis:

    x_cat[t] = concat(x[s*t + 0], ..., x[s*t + K-1])     # (B, L, K*C_in)
    out      = x_cat @ W.reshape(K*C_in, C_out)

For k == s the slices tile the input exactly (pure reshape, zero extra
HBM); for k=3,s=2 the concat reads 1.5x the input. The payoff is the
BACKWARD pass: grads of a matmul are matmuls (MXU-friendly), while the
conv backward lowers to conv-transpose/dilated-conv programs.

Usage: python tools/exp_conv_phase.py [--check] [--full]
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def conv_ref(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))


def conv_phase(x, w, stride):
    """x: (B, T, C_in), w: (K, C_in, C_out)."""
    k, c_in, c_out = w.shape
    b, t, _ = x.shape
    l = (t - k) // stride + 1
    cols = [jax.lax.slice(x, (0, j, 0), (b, j + (l - 1) * stride + 1, c_in),
                          (1, stride, 1)) for j in range(k)]
    x_cat = jnp.concatenate(cols, axis=-1)  # (B, L, K*C_in)
    return x_cat @ w.reshape(k * c_in, c_out)


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])  # force sync via D2H
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / n * 1000


# wav2vec2 16 kHz stack (C, K, S); layer 0 has C_in=1
STACK = [(512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
         (512, 2, 2), (512, 2, 2)]


def stack_fwd(x, ws, impl):
    f = conv_ref if impl == "ref" else conv_phase
    for w, (_, _, s) in zip(ws, STACK):
        x = f(x, w, s)
        x = jax.nn.gelu(x, approximate=False)
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=175_000)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)
    if args.check:
        x = jnp.asarray(rng.normal(size=(2, 3205, 1)), jnp.float32)
        ws = [jnp.asarray(rng.normal(size=(k, 1 if i == 0 else 512, c)) * 0.05,
                          jnp.float32) for i, (c, k, s) in enumerate(STACK)]
        a = stack_fwd(x, ws, "ref")
        bv = stack_fwd(x, ws, "phase")
        err = float(jnp.max(jnp.abs(a - bv)))
        print("parity max abs err:", err, "shapes", a.shape, bv.shape)
        assert err < 1e-3
        return

    x = jnp.asarray(rng.normal(size=(args.b, args.t, 1)), dt)
    ws = [jnp.asarray(rng.normal(size=(k, 1 if i == 0 else 512, c)) * 0.05, dt)
          for i, (c, k, s) in enumerate(STACK)]

    for impl in ("ref", "phase"):
        fwd = jax.jit(functools.partial(stack_fwd, impl=impl))

        def loss(x, ws):
            return jnp.sum(stack_fwd(x, ws, impl).astype(jnp.float32) ** 2)

        fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        tf = timeit(fwd, x, ws)
        tb = timeit(fwdbwd, x, ws)
        print(f"{impl:6s} fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms")


if __name__ == "__main__":
    main()
