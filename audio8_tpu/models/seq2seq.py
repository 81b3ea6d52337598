"""Seq2seq ASR model: wav2vec2 encoder + transformer decoder.

Replaces Seq2Seq (/root/reference/audio8/wav2vec2.py:979-1006). The
reference's batched greedy decode re-runs the full decoder over the whole
prefix every step (O(L^2), noted in SURVEY.md §3.5); here decode is a
KV-cached ``lax.while_loop`` with static shapes — O(L) and jit-compiled.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio8_tpu.config import DecoderConfig, EncoderConfig
from audio8_tpu.models.text import TextTransformerDecoder
from audio8_tpu.models.wav2vec2 import Wav2Vec2Encoder
from audio8_tpu.ops.masks import sequence_mask
from audio8_tpu.utils import Offsets

Dtype = Any


class Seq2Seq(nn.Module):
    encoder_config: EncoderConfig
    decoder_config: DecoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Wav2Vec2Encoder(config=self.encoder_config,
                                       dtype=self.dtype, param_dtype=self.param_dtype)
        self.decoder = TextTransformerDecoder(config=self.decoder_config,
                                              dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, x, input_lengths, dst, dst_lengths, train: bool = False,
                 freeze: bool = True):
        """Teacher-forced forward: returns (B, T_dst, V) log-probs."""
        dst_mask = sequence_mask(dst_lengths, dst.shape[1])
        memory, src_pad_mask = self.encoder(x, input_lengths, train)
        if freeze:
            memory = jax.lax.stop_gradient(memory)
        return self.decoder(memory, src_pad_mask, dst, dst_mask, train)

    def decode(self, x, input_lengths, max_output_len: int = 100):
        """Batched greedy decode with KV cache; starts from GO, stops when
        every row has emitted EOS (or at max_output_len). Returns
        (tokens (B, max_output_len), lengths (B,)); positions after EOS are
        PAD."""
        memory, src_pad_mask = self.encoder(x, input_lengths, train=False)
        b = x.shape[0]
        cross_kv = self.decoder.compute_cross_kv(memory)  # project memory once
        cache = self.decoder.init_cache(b, max_output_len + 1)
        tokens = jnp.full((b, max_output_len), Offsets.PAD, jnp.int32)
        tok = jnp.full((b, 1), Offsets.GO, jnp.int32)
        done = jnp.zeros((b,), jnp.bool_)

        def cond(state):
            i, _, _, done, _ = state
            return (i < max_output_len) & (~jnp.all(done))

        def body(state):
            i, tok, tokens, done, cache = state
            log_probs, cache = self.decoder.step(memory, src_pad_mask, tok,
                                                 cache, cross_kv=cross_kv)
            best = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            best = jnp.where(done, Offsets.PAD, best)
            tokens = jax.lax.dynamic_update_slice(tokens, best[:, None], (0, i))
            done = done | (best == Offsets.EOS)
            return i + 1, best[:, None], tokens, done, cache

        _, _, tokens, done, _ = jax.lax.while_loop(
            cond, body, (jnp.array(0, jnp.int32), tok, tokens, done, cache))
        lengths = jnp.sum((tokens != Offsets.PAD), axis=-1)
        return tokens, lengths


def create_seq2seq_model(
    vocab_size: int,
    encoder_config: Optional[EncoderConfig] = None,
    decoder_config: Optional[DecoderConfig] = None,
    dtype=jnp.float32,
    **kwargs,
) -> Seq2Seq:
    """Factory mirroring create_seq2seq_model
    (/root/reference/audio8/train_seq2seq.py:38-92): 12-layer encoder,
    2-layer/4-head decoder with learned-positional tied embeddings."""
    enc = encoder_config or EncoderConfig(
        **{k: v for k, v in kwargs.items() if k in EncoderConfig.__dataclass_fields__})
    dec = decoder_config or DecoderConfig(
        vocab_size=vocab_size,
        d_model=enc.d_model,
        num_heads=int(kwargs.get("decoder_heads", 4)),
        num_layers=int(kwargs.get("decoder_layers", 2)),
        dropout=float(kwargs.get("decoder_dropout", 0.1)),
        layer_drop=float(kwargs.get("decoder_layer_drop", 0.0)),
    )
    return Seq2Seq(encoder_config=enc, decoder_config=dec, dtype=dtype)
