"""Bound the upside of a custom fused attention kernel.

Times 12 chained attention CORES (logits + softmax [+ dropout] + PV; no
projections/LN) f+b at the pretrain shape (B=8, H=12, T=546, dh=64, bf16),
vs the stock Pallas TPU flash kernel at the same shape. If the XLA core is
already near the flash kernel, a custom kernel has little to win.

Run: timeout 3500 python -u tools/exp_attn_core.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = fn(*args)
    assert np.asarray(out).size == 1
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / n * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, H, T, dh = 8, 12, 546, 64
    mk = lambda i: jnp.asarray(
        rng.normal(size=(B, H, T, dh)).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(0), mk(1), mk(2)
    scale = 1.0 / np.sqrt(dh)

    from audio8_tpu.nn.dropout import _hash_dropout

    def core(q, k, v, dropout):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                            preferred_element_type=jnp.bfloat16)
        probs = jax.nn.softmax(logits, axis=-1)
        if dropout:
            probs = _hash_dropout(probs, 0.1, jnp.uint32(123))
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    def chain(fn, q, k, v):
        x = q
        s = jnp.float32(0)
        for i in range(12):
            x = fn(x, k, v)
            s = s + jnp.sum(x.astype(jnp.float32)) * (i + 1)  # defeat CSE
        return s

    def gsum(fn):
        def loss(q, k, v):
            return chain(fn, q, k, v)
        def g(q, k, v):
            gr = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in gr)
        return g

    t = timeit(jax.jit(gsum(lambda q, k, v: core(q, k, v, True))), q, k, v)
    print(f"xla core f+b, dropout   {t:7.2f} ms (12 layers)", flush=True)
    t = timeit(jax.jit(gsum(lambda q, k, v: core(q, k, v, False))), q, k, v)
    print(f"xla core f+b, no drop   {t:7.2f} ms", flush=True)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    t_pad = 640
    sizes = BlockSizes(
        block_q=128, block_k_major=128, block_k=128, block_b=1,
        block_q_major_dkv=128, block_k_major_dkv=128,
        block_k_dkv=128, block_q_dkv=128,
        block_k_major_dq=128, block_k_dq=128, block_q_dq=128)

    def flash_core(q, k, v):
        pad = t_pad - T
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        o = flash_attention(qp, kp, vp, causal=False, sm_scale=scale,
                            block_sizes=sizes)
        return o[:, :, :T, :]

    t = timeit(jax.jit(gsum(flash_core)), q, k, v)
    print(f"flash core f+b, no drop {t:7.2f} ms", flush=True)


if __name__ == "__main__" and "--custom" not in sys.argv:
    main()


def bench_custom():
    """Compare the whole-row attention_core kernel vs the XLA core."""
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, H, T, dh = 8, 12, 546, 64
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, T, dh)).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    scale = 1.0 / np.sqrt(dh)
    seed = jnp.asarray([123], jnp.uint32)

    from audio8_tpu.ops.pallas.attention_kernel import attention_core

    def chain(fn, q, k, v):
        x = q
        s = jnp.float32(0)
        for i in range(12):
            x = fn(x, k, v)
            s = s + jnp.sum(x.astype(jnp.float32)) * (i + 1)
        return s

    def gsum(fn):
        def loss(q, k, v):
            return chain(fn, q, k, v)
        def g(q, k, v):
            gr = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in gr)
        return g

    for rate, label in [(0.1, "dropout"), (0.0, "no drop")]:
        fn = lambda q, k, v: attention_core(q, k, v, None, scale, rate,
                                            seed if rate else None)
        t = timeit(jax.jit(gsum(fn)), q, k, v)
        print(f"custom core f+b, {label:8s} {t:7.2f} ms (12 layers)", flush=True)


if __name__ == "__main__" and "--custom" in sys.argv:
    bench_custom()
    sys.exit(0)
