"""Cheap fusable random bits from an integer hash of element indices.

The same trick as the hash dropout (audio8_tpu/nn/dropout.py): ~8 VPU ops
per element instead of ~50 for threefry, and XLA fuses the generator into
the consuming elementwise chain. Statistical quality is validated in
tests (mean/variance/decorrelation); use jax.random for anything needing
crypto-grade streams.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hash_bits(shape, seed: jnp.ndarray) -> jnp.ndarray:
    """uint32 bits: murmur-style mix of flat index and seed."""
    n = 1
    for d in shape:
        n *= int(d)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0).reshape(shape)
    x = idx ^ seed.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def seed_from_key(key: jax.Array) -> jnp.ndarray:
    """Derive an int32 seed from a jax PRNG key (one tiny threefry call)."""
    return jax.random.randint(key, (), -(2 ** 31), 2 ** 31 - 1, jnp.int32)


def hash_uniform(shape, seed: jnp.ndarray) -> jnp.ndarray:
    """floats in the open interval (0, 1) — safe for log()."""
    bits = hash_bits(shape, seed)
    # use the top 24 bits; offset by 0.5 ulp to stay strictly inside (0,1)
    return (bits >> 8).astype(jnp.float32) * (1.0 / 16777216.0) + (0.5 / 16777216.0)


def hash_gumbel(shape, seed: jnp.ndarray) -> jnp.ndarray:
    return -jnp.log(-jnp.log(hash_uniform(shape, seed)))


def hash_randint(shape, seed: jnp.ndarray, maxval: jnp.ndarray) -> jnp.ndarray:
    """ints in [0, maxval) with (elementwise-broadcast) dynamic maxval."""
    bits = hash_bits(shape, seed)
    return (bits % maxval.astype(jnp.uint32)).astype(jnp.int32)
