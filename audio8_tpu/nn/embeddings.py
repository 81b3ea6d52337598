"""Embedding layers for the text side.

Replaces the `baseline.embeddings.load_embeddings` surface the reference
uses for seq2seq / paired pretraining ('default' and 'learned-positional'
embed types; /root/reference/audio8/train_seq2seq.py:75-81,
pretrain_paired.py:190-198) plus eight_mile's ``WeightTieDense``
(/root/reference/audio8/text.py:212).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class LookupTableEmbeddings(nn.Module):
    """Plain token-embedding lookup ('default' embed type)."""

    vocab_size: int
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.table = self.param(
            "embedding",
            nn.initializers.normal(stddev=self.features ** -0.5),
            (self.vocab_size, self.features),
            self.param_dtype,
        )

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.table, ids, axis=0).astype(self.dtype)

    def attend(self, x: jnp.ndarray) -> jnp.ndarray:
        """Project features back onto the vocabulary with the tied table."""
        return jnp.dot(x, self.table.T.astype(x.dtype))


class LearnedPositionalEmbeddings(nn.Module):
    """Token + learned absolute position embeddings ('learned-positional')."""

    vocab_size: int
    features: int
    max_len: int = 1024
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.word = LookupTableEmbeddings(
            vocab_size=self.vocab_size, features=self.features,
            dtype=self.dtype, param_dtype=self.param_dtype, name="word",
        )
        self.pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=self.features ** -0.5),
            (self.max_len, self.features),
            self.param_dtype,
        )

    def __call__(self, ids: jnp.ndarray, offset: int | jnp.ndarray = 0) -> jnp.ndarray:
        t = ids.shape[-1]
        emb = self.word(ids)
        pos = jnp.arange(t) + offset
        return emb + jnp.take(self.pos, pos, axis=0).astype(self.dtype)

    def attend(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.word.attend(x)


class WeightTieDense(nn.Module):
    """Output projection tied to an embedding table (logits = x @ E^T).

    The tied table is passed at call time (the owning model fetches it from
    its embedding module), keeping the parameter single-sourced.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(x, table.T.astype(x.dtype))
