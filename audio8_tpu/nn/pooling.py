"""Utterance pooling / reduction layers.

Replacements for the eight_mile reduction menu the reference's pooled
encoders expose (``2ha[/_max/_mean]``, ``sha[/_max/_mean]``, ``max``,
``mean``, ``none``; /root/reference/audio8/wav2vec2.py:817-845,
text.py:137-162). These feed the paired audio<->text dual-encoder, which is
trained from scratch, so the contract is the reduction *menu* and shapes
(sequence (B, T, C) -> utterance (B, C)), not bit parity with eight_mile.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio8_tpu.nn.dropout import Dropout
from audio8_tpu.nn.layers import Dense
from audio8_tpu.nn.transformer import NEG_INF

Dtype = Any


class MaxPool1D(nn.Module):
    """Masked max over time: padded positions excluded."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        t = x.shape[1]
        valid = jnp.arange(t)[None, :, None] < lengths[:, None, None]
        return jnp.max(jnp.where(valid, x, NEG_INF), axis=1)


class MeanPool1D(nn.Module):
    """Masked mean over time."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        t = x.shape[1]
        valid = jnp.arange(t)[None, :, None] < lengths[:, None, None]
        s = jnp.sum(jnp.where(valid, x, 0.0), axis=1)
        return s / jnp.maximum(lengths[:, None].astype(s.dtype), 1.0)


class SingleHeadReduction(nn.Module):
    """Single-head attention reduction: queries and keys project to d_k, the
    value stream is the raw input; attention output is pooled over time.

    pooling: 'sqrt_length' (sum * length**-0.5), 'max', or 'mean'.
    """

    d_model: int
    d_k: int = 64
    scale: bool = False
    dropout_rate: float = 0.0
    pooling: str = "sqrt_length"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: (B, T, C); pad_mask: (B, T) boolean, True = valid."""
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = Dense(self.d_k, name="w_Q", **dd)(x)
        k = Dense(self.d_k, name="w_K", **dd)(x)
        if self.scale:
            q = q * (self.d_k ** -0.5)
        logits = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
        logits = jnp.where(pad_mask[:, None, :], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = Dropout(self.dropout_rate)(probs, deterministic=deterministic)
        out = jnp.einsum("bqk,bkc->bqc", probs, x)  # (B, T, C)
        lengths = jnp.sum(pad_mask, axis=-1)
        if self.pooling == "max":
            return jnp.max(jnp.where(pad_mask[..., None], out, NEG_INF), axis=1)
        if self.pooling == "mean":
            s = jnp.sum(jnp.where(pad_mask[..., None], out, 0.0), axis=1)
            return s / jnp.maximum(lengths[:, None].astype(s.dtype), 1.0)
        # default: sum scaled by 1/sqrt(length)
        s = jnp.sum(jnp.where(pad_mask[..., None], out, 0.0), axis=1)
        return s * jax.lax.rsqrt(jnp.maximum(lengths[:, None].astype(jnp.float32), 1.0)).astype(s.dtype)


class TwoHeadConcat(nn.Module):
    """Two independent single-head reductions, concatenated to (B, 2C)."""

    d_model: int
    d_k: int = 64
    scale: bool = False
    dropout_rate: float = 0.0
    pooling: str = "sqrt_length"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        dd = dict(
            d_model=self.d_model,
            d_k=self.d_k,
            scale=self.scale,
            dropout_rate=self.dropout_rate,
            pooling=self.pooling,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h1 = SingleHeadReduction(name="head_0", **dd)(x, pad_mask, deterministic)
        h2 = SingleHeadReduction(name="head_1", **dd)(x, pad_mask, deterministic)
        return jnp.concatenate([h1, h2], axis=-1)


class Reduction(nn.Module):
    """Dispatch layer implementing the reference's reduction-type menu.

    Output is (B, C) for all types except 'none', which returns the sequence
    and its pad mask unchanged (/root/reference/audio8/wav2vec2.py:858-860).
    """

    reduction_type: str
    d_model: int
    d_k: int = 64
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        rt = self.reduction_type.lower()
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        sha = dict(d_model=self.d_model, d_k=self.d_k, dropout_rate=self.dropout_rate, **dd)
        lengths = jnp.sum(pad_mask, axis=-1)
        if rt == "2ha":
            h = TwoHeadConcat(**sha)(x, pad_mask, deterministic)
            return Dense(self.d_model, name="squeeze", **dd)(h)
        if rt == "2ha_max":
            h = TwoHeadConcat(pooling="max", **sha)(x, pad_mask, deterministic)
            return Dense(self.d_model, name="squeeze", **dd)(h)
        if rt == "2ha_mean":
            h = TwoHeadConcat(pooling="mean", **sha)(x, pad_mask, deterministic)
            return Dense(self.d_model, name="squeeze", **dd)(h)
        if rt == "sha":
            return SingleHeadReduction(**sha)(x, pad_mask, deterministic)
        if rt == "sha_max":
            return SingleHeadReduction(pooling="max", **sha)(x, pad_mask, deterministic)
        if rt == "sha_mean":
            return SingleHeadReduction(pooling="mean", **sha)(x, pad_mask, deterministic)
        if rt == "max":
            return MaxPool1D()(x, lengths)
        if rt == "mean":
            return MeanPool1D()(x, lengths)
        if rt == "none":
            return x, pad_mask
        raise ValueError(f"Unknown reduction type {self.reduction_type!r}")


def make_reduction(reduction_type: str, d_model: int, d_k: int = 64,
                   dropout_rate: float = 0.0, **kwargs) -> Reduction:
    return Reduction(
        reduction_type=reduction_type, d_model=d_model, d_k=d_k,
        dropout_rate=dropout_rate, **kwargs,
    )
