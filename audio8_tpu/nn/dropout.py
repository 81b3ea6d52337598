"""Dropout module dispatching to the Pallas hardware-PRNG kernel on TPU.

Drop-in replacement for flax ``nn.Dropout``: same (rate, deterministic)
interface and 'dropout' rng collection. On TPU the mask comes from
``audio8_tpu.ops.pallas.dropout_kernel`` (~30% of the pretrain step was
threefry mask generation); elsewhere it falls back to the standard
bernoulli path so CPU tests keep exact flax semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class Dropout(nn.Module):
    """Measured on v5e (wav2vec2-base pretrain step): the Pallas path trades
    cheap RNG for extra HBM round-trips (the mask multiply no longer fuses
    into adjacent XLA ops) and comes out ~8ms/step SLOWER than threefry, so
    it stays opt-in for cases where fusion doesn't apply anyway."""

    rate: float
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        if self.use_pallas and jax.default_backend() == "tpu":
            from audio8_tpu.ops.pallas.dropout_kernel import fast_dropout

            return fast_dropout(x, self.rate, key)
        keep = jax.random.bernoulli(key, 1.0 - self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), 0)
